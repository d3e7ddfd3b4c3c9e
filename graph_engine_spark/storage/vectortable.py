"""Cell-partitioned vector-table storage — the IVF index made durable.

``pipelines/similarity.ivf_topk`` prunes by cell BEFORE any distance
math, but against an unpartitioned source the "pruning" is still a
filter over a full scan: every file is opened, every vector's cell
recomputed. Writing the assigned table ONCE, Hive-partitioned by
``cell``, turns the probe list into PARTITION PRUNING at the scan —
``cell IN (probes)`` lands in the scan's PartitionFilters, so a query
touching nprobe of n_cells cells reads nprobe/n_cells of the bytes
(plan-guarded in tests/test_vectortable.py). This closes the gap
ivf_topk's docstring promised (VERDICT r4 #6), mirroring
storage/edgetable.py: pay the clustering shuffle once at write.

The centroids ride along as a ``_ivf_centroids.json`` sidecar inside
the table directory (underscore-prefixed → invisible to the Parquet
reader), so reads are self-contained: queries against the stored table
are guaranteed to probe with the SAME centroids the writer assigned
with — a retrained centroid set silently mis-probing a stale table is
the classic IVF operational bug.

Real deployment: the same write against an Iceberg catalog with a
``cell`` identity partition transform (plus snapshot commits); the
reader-side plan property is identical. Partition-count choice at
scale: n_cells ≈ √n is the IVF norm (10^9 vectors → ~32k cells), well
inside healthy Hive/Iceberg partition cardinality.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CENTROIDS_SIDECAR = "_ivf_centroids.json"


def write_vector_table(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    centroids: list[list[float]] | None = None,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    mode: str = "overwrite",
) -> list[list[float]]:
    """Assign every vector to its IVF cell and write (key, v, cell)
    Parquet partitioned by ``cell``; persist the centroids as a sidecar.
    centroids: pass ivf_train output for the trained index; default is
    the deterministic hyperplane set (the oracle-checkable mode).
    Returns the centroids actually used."""
    from graph_engine_spark.pipelines.similarity import (
        _infer_dim,
        ivf_assign,
        ivf_centroids,
    )

    if centroids is None:
        dim = _infer_dim(embeddings, vec_col)
        centroids = ivf_centroids(dim, n_cells)
    assigned = ivf_assign(
        embeddings, vec_col=vec_col, key_col=key_col, centroids=centroids
    )
    assigned.write.mode(mode).partitionBy("cell").parquet(path)
    tmp = os.path.join(path, CENTROIDS_SIDECAR + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"centroids": centroids}, f)
    os.replace(tmp, os.path.join(path, CENTROIDS_SIDECAR))
    return centroids


def read_vector_table(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[list[float]]]:
    """(table, centroids). Partition discovery restores ``cell`` as a
    partition column, so cell predicates prune at the scan."""
    with open(os.path.join(path, CENTROIDS_SIDECAR)) as f:
        centroids = json.load(f)["centroids"]
    return spark.read.parquet(path), centroids


def ivf_topk_from_table(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    key_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k against the stored table: the nprobe closest cells
    (by the writer's own centroids) become a partition-pruning IN
    filter; distance math runs only over the surviving files."""
    from graph_engine_spark.pipelines.similarity import (
        cosine_similarity,
        probe_cells,
    )

    table, centroids = read_vector_table(spark, path)
    probe = probe_cells(query_vec, centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = table.filter(F.col("cell").isin(probe)).select(
        F.col("key").alias(key_col),
        cosine_similarity(F.col("v"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(key_col)).limit(k)
