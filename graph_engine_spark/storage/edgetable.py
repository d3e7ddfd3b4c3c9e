"""Bucketed edge-table storage — SCALE.md §2 made concrete.

The reference persists its whole graph as one JSON document and reloads
it into a dict (graph_core/storage/json_storage.py:55-101), so every
process re-pays full deserialization and no query can prune. At 100 TB
the deduplicated ``(src, dst, edge_type)`` edge table is instead the
hub every job joins or aggregates on ``src``: degree profiling, CSR
adjacency builds (`graph/adjacency.py`), point traversals, and each
re-run of PageRank / CC / LPA over the same snapshot.

Writing that table ONCE, bucketed (hash-clustered + sorted) by ``src``,
moves the clustering shuffle from every downstream job into the single
write: a bucketed scan reports ``HashPartitioning(src, N)``, so

  * ``groupBy("src")`` aggregations plan with NO Exchange at all, and
  * src-keyed joins shuffle only the other side (Spark reuses the
    bucketed side's partitioning, exactly like the persisted adjacency
    inside the superstep loops — but across JOBS, not just within one).

Sandbox realization: a Parquet-backed EXTERNAL table registered via
``saveAsTable`` (the in-session catalog carries the bucket spec; the
files live wherever ``path`` points). Real deployment: the same call
against an Iceberg catalog — ``bucket(N, src)`` partition transform —
which adds atomic snapshot commits and cross-session metadata. The
reader and every plan property are identical in both.

Bucket-count choice at scale: buckets ≈ total-cores × small constant,
and fixed FOREVER for the table (a bucketed join only lines up if the
scan's bucket count matches what the writer used — re-bucketing is a
full rewrite). 100 TB / 4096 buckets ≈ 25 GB per bucket, which the
scan further splits by row-group; too FEW buckets caps downstream
parallelism, hence the generous default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Edge identity (reference manager.py dedups on the same triple); the
#: full schema additionally carries provenance + dynamic-call
#: annotations (schemas.EDGES_SCHEMA) — all columns ride along.
EDGE_KEY = ("src", "dst", "edge_type")

#: Deterministic per-column merge rules for duplicate-key rows
#: (ADVICE r4: dropDuplicates kept an ARBITRARY row, so differing
#: annotations on duplicate keys survived nondeterministically and
#: could silently drop call counts). Mirrors the reference's merge
#: semantics (manager.py:180-215): runtime totals are additive,
#: observation flags/timestamps are sticky, provenance ties break to
#: the minimum. Columns not listed merge with min() — deterministic
#: for any orderable type.
_MERGE_RULES = {
    "dynamic": F.max,  # observed-at-runtime is sticky across duplicates
    "dynamic_call_count": F.sum,  # reference merges totals additively
    "first_call_time": F.min,
    "last_call_time": F.max,
}


def write_edge_table(
    edges: DataFrame,
    name: str,
    path: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Deduplicate on the (src, dst, edge_type) identity — merging the
    non-key columns DETERMINISTICALLY per _MERGE_RULES rather than
    keeping an arbitrary duplicate's row (extractor output is already
    unique on the key, so this is a belt-and-braces no-op there) — and
    write ``edges`` as a Parquet table bucketed by ``src``
    (hash-clustered, sorted within each bucket). Same plan cost as the
    old dropDuplicates: one hash aggregation on the key.

    ``path`` makes it an external table: the catalog entry carries the
    bucket spec, the data stays at ``path`` (sandbox hygiene — nothing
    lands in a default warehouse dir inside the repo).
    """
    extra = [c for c in edges.columns if c not in EDGE_KEY]
    if extra:
        deduped = edges.groupBy(*EDGE_KEY).agg(
            *[_MERGE_RULES.get(c, F.min)(c).alias(c) for c in extra]
        )
    else:
        deduped = edges.dropDuplicates(list(EDGE_KEY))
    (
        deduped.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(buckets, "src")
        .sortBy("src", "dst")
        .saveAsTable(name)
    )


def read_edge_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — the ONLY way the bucket spec reaches the planner.

    ``spark.read.parquet(path)`` on the same files would parse fine but
    report unknown partitioning (bucket metadata lives in the catalog,
    not the footers), silently re-introducing every downstream shuffle.
    """
    return spark.table(name)


def bucket_spec(spark: SparkSession, name: str) -> dict:
    """(num_buckets, bucket_columns, sort_columns) for assertions/ops."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    kv = {r["col_name"].strip(): (r["data_type"] or "").strip() for r in rows}
    return {
        "num_buckets": int(kv.get("Num Buckets", "0") or 0),
        "bucket_columns": kv.get("Bucket Columns", ""),
        "sort_columns": kv.get("Sort Columns", ""),
    }


def src_degrees_from_table(spark: SparkSession, name: str) -> DataFrame:
    """Out-degree profile straight off the bucketed table — the shape
    downstream salting decisions read. Plan-guarded exchange-free
    (tests/test_edgetable.py): the scan's HashPartitioning(src, N)
    satisfies the aggregation's required distribution."""
    return (
        read_edge_table(spark, name)
        .groupBy("src")
        .agg(F.count("*").alias("out_deg"))
    )
