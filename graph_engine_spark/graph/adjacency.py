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


#: target edges per partition for iterative superstep loops, capped at
#: the session's shuffle-partition setting (so cluster jobs never exceed
#: their configured parallelism). Measured on local[32], 60k-edge graph:
#: 64 partitions → ~11 s/superstep (pure task-scheduling overhead);
#: 1 partition → serializes window/sort-heavy supersteps (LPA 45 s);
#: anywhere in 2–16 → ~0.45 s/superstep. 8k per partition keeps tasks
#: ≥~100 ms of real work while engaging all cores once the graph is
#: non-trivial.
EDGES_PER_PARTITION = 8_000


def partitions_for_count(
    n_edges: int,
    spark,
    edges_per_partition: int = EDGES_PER_PARTITION,
    max_partitions: int | None = None,
) -> int:
    """Partition count for an iterative loop, from a known edge count —
    use this when the algorithm already materializes (and counts) an
    edge table, so sizing costs zero extra actions."""
    if max_partitions is None:
        max_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(max_partitions, -(-n_edges // edges_per_partition)))


def auto_partitions(
    edges: DataFrame,
    edges_per_partition: int = EDGES_PER_PARTITION,
    max_partitions: int | None = None,
) -> int:
    """Partition count for an iterative loop, sized from the edge count.

    One count() action over the caller's lineage — callers that have (or
    are about to build) a persisted edge table should count THAT and use
    partitions_for_count instead, so the upstream pipeline is never
    recomputed just for sizing. The cap defaults to the session's
    shuffle partitions; a 1000-executor job passes an explicit
    num_partitions instead of relying on this.
    """
    return partitions_for_count(
        edges.count(), edges.sparkSession, edges_per_partition, max_partitions
    )


#: adjacency rows are split when a vertex's out-degree exceeds this —
#: bounded in the code-import domain (a file imports hundreds of
#: modules, not millions) but unbounded in general graphs; one 10^7-out-
#: degree hub as a single collect_list row is a multi-GB array and an
#: executor OOM. 64k string dsts ≈ 2-4 MB per row — safely inside any
#: executor's task memory.
MAX_OUT_DEGREE_PER_ROW = 65_536


def build_adjacency(
    edges: DataFrame,
    num_partitions: int,
    src: str = "src",
    dst: str = "dst",
    persist: bool = True,
    max_out_degree: int | None = MAX_OUT_DEGREE_PER_ROW,
) -> DataFrame:
    """CSR-style adjacency: (src, dsts array, out_deg), hash-partitioned
    on src and persisted (memory-and-disk: spill-safe at scale).

    Extreme-out-degree vertices are split across multiple rows of at
    most ~max_out_degree dsts (hash-assigned chunks), so no aggregation
    buffer or cached row ever holds a hub's whole neighborhood.
    ``out_deg`` remains the vertex's TOTAL out-degree on every chunk —
    consumers divide rank mass by it, and equi-joins on src simply fan
    out over the chunk rows (explode semantics are unchanged).

    ``max_out_degree=None`` opts out of the cap AND the degree probe
    job entirely — for callers that know their domain bounds out-degree
    (or pass unpersisted edges whose lineage a probe would replay).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if max_out_degree is None:
        max_deg = 0  # caller opted out: single-agg build, no probe job
    else:
        # cheap pre-check: a count-only aggregation (map-side combined,
        # no arrays) finds the max out-degree. Only when a hub actually
        # exceeds the cap do we pay the edge⋈degree join that assigns
        # chunk ids — the common no-hub case keeps the single-agg build.
        deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
        max_deg = deg.agg(F.max("out_deg")).first()[0] or 0
    if max_out_degree is None or max_deg <= max_out_degree:
        adj = (
            e.groupBy("src")
            .agg(F.collect_list("dst").alias("dsts"))
            .withColumn("out_deg", F.size("dsts"))
            .repartition(num_partitions, "src")
        )
    else:
        n_chunks = F.ceil(F.col("out_deg") / F.lit(max_out_degree)).cast("int")
        adj = (
            e.join(deg, "src")
            .withColumn(
                "_chunk",
                F.when(
                    F.col("out_deg") > max_out_degree,
                    F.pmod(F.xxhash64("dst"), n_chunks),
                ).otherwise(F.lit(0).cast("bigint")),
            )
            .groupBy("src", "_chunk")
            .agg(F.collect_list("dst").alias("dsts"), F.min("out_deg").alias("out_deg"))
            .drop("_chunk")
            .repartition(num_partitions, "src")
        )
    if persist:
        adj = adj.persist(StorageLevel.MEMORY_AND_DISK)
    return adj


def build_weighted_adjacency(
    edges: DataFrame,
    num_partitions: int,
    weight: str,
    src: str = "src",
    dst: str = "dst",
    persist: bool = True,
    max_out_degree: int | None = MAX_OUT_DEGREE_PER_ROW,
) -> DataFrame:
    """Weighted CSR adjacency: (src, nbrs array<struct<dst, frac>>,
    out_deg) where ``frac = w(src,dst) / Σ w(src, ·)`` is the
    PRE-NORMALIZED contribution fraction.

    Normalizing at build time (one extra map-side-combined sum + an
    equi-join that shares the groupBy's hash partitioning) keeps the
    superstep loop identical in shape to the unweighted path: the
    per-iteration cost of weighted PageRank is exactly that of
    unweighted — contribution = rank × frac instead of rank / out_deg,
    no extra per-superstep join or divide-by-total.

    Non-positive weights are dropped (a ≤0-weight edge carries no rank
    mass); a vertex whose every out-edge is dropped correctly becomes
    dangling. Parallel (src, dst) duplicates keep separate fracs — the
    superstep's sum aggregation merges their contributions exactly.
    Hub rows are chunked by the same hash-assignment cap as the
    unweighted build; fracs are normalized by the vertex's TOTAL
    weight, so chunking never changes the math.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("_w"),
    ).filter(F.col("_w") > 0)
    tot = e.groupBy("src").agg(
        F.sum("_w").alias("_wt"), F.count("*").alias("out_deg")
    )
    ew = e.join(tot, "src").select(
        "src",
        "dst",
        (F.col("_w") / F.col("_wt")).alias("frac"),
        "out_deg",
    )
    if max_out_degree is None:
        max_deg = 0
    else:
        max_deg = tot.agg(F.max("out_deg")).first()[0] or 0
    if max_out_degree is None or max_deg <= max_out_degree:
        adj = (
            ew.groupBy("src")
            .agg(
                F.collect_list(F.struct("dst", "frac")).alias("nbrs"),
                F.min("out_deg").alias("out_deg"),
            )
            .repartition(num_partitions, "src")
        )
    else:
        n_chunks = F.ceil(F.col("out_deg") / F.lit(max_out_degree)).cast("int")
        adj = (
            ew.withColumn(
                "_chunk",
                F.when(
                    F.col("out_deg") > max_out_degree,
                    F.pmod(F.xxhash64("dst"), n_chunks),
                ).otherwise(F.lit(0).cast("bigint")),
            )
            .groupBy("src", "_chunk")
            .agg(
                F.collect_list(F.struct("dst", "frac")).alias("nbrs"),
                F.min("out_deg").alias("out_deg"),
            )
            .drop("_chunk")
            .repartition(num_partitions, "src")
        )
    if persist:
        adj = adj.persist(StorageLevel.MEMORY_AND_DISK)
    return adj
