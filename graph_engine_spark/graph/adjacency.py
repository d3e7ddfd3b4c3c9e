"""Adjacency construction for iterative algorithms.

North-rule requirement: "hash-partitioned CSR-style adjacency
partitions". In DataFrame terms: the edge list grouped once into
``(src, dsts array<string>, out_deg)``, explicitly hash-repartitioned on
``src`` with a fixed partition count, and persisted. Supersteps then
join the (small, changing) rank table against the (large, static,
already-partitioned) adjacency — the persisted partitioning satisfies
the join's required distribution, so only the rank side shuffles per
iteration.

Hub skew: degree() feeds both the salting decision in pagerank and the
degree-ordering in triangle counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, out_deg, in_deg, deg) for every vertex."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(F.count("*").alias("out_deg"))
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "id", "full")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("deg", F.col("out_deg") + F.col("in_deg"))
    )


def vertices(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct vertex ids (union of both endpoints)."""
    return (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def build_adjacency(
    edges: DataFrame,
    num_partitions: int,
    src: str = "src",
    dst: str = "dst",
    persist: bool = True,
) -> DataFrame:
    """CSR-style adjacency: (src, dsts array, out_deg), hash-partitioned
    on src and persisted (memory-and-disk: spill-safe at scale)."""
    adj = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .groupBy("src")
        .agg(F.collect_list("dst").alias("dsts"))
        .withColumn("out_deg", F.size("dsts"))
        .repartition(num_partitions, "src")
    )
    if persist:
        adj = adj.persist(StorageLevel.MEMORY_AND_DISK)
    return adj
