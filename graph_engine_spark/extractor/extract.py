"""Distributed extraction: corpus DataFrame → nodes / edges DataFrames.

Spark shape (SURVEY.md §3.1): one Arrow-batched ``mapInPandas`` pass
emits a union IR of node and edge rows; nodes/edges are column-pruned
filters over it; dedup/merge are hash aggregations. The content hash is
``sha2(content, 256)`` computed JVM-side *before* the UDF — bit-equal to
the reference's ``hashlib.sha256(content).hexdigest()``
(reference graph_core/storage/json_storage.py:550-552), which the test
suite asserts per-row.

Scale notes:
  * The extraction stage is embarrassingly parallel — no shuffle; input
    partitioning (Iceberg/Parquet splits) is the only parallelism knob.
  * A cheap JVM-side language gate runs before the UDF (reference
    supported-extension gate, graph_core/manager.py:39,612-618) so
    unsupported rows never cross the Arrow boundary.
  * Node merge = one hash aggregation on id (map-side partial agg);
    edge dedup = one hash aggregation on (src, dst, edge_type) with a
    deterministic min(struct(repo, path)) provenance pick — the
    reference's first-write-wins dedup is insertion-order dependent
    (tree_sitter_parser.py:907-912); min() is its order-free equivalent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_engine_spark.extractor.pyext import SUPPORTED_LANGS, extract_file
from graph_engine_spark.schemas import IR_SCHEMA

_IR_COLS = [f.name for f in IR_SCHEMA.fields]


def _extract_batches_impl(
    batches: Iterator[pd.DataFrame], parser: str = "fallback"
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple] = []
        for repo, path, lang, content, chash in zip(
            pdf["repo"], pdf["path"], pdf["lang"], pdf["content"], pdf["content_hash"]
        ):
            nodes, edges = extract_file(path, lang, content, parser=parser)
            for nid, ntype, name, start, end, params in nodes:
                rows.append(
                    (
                        "node",
                        nid,
                        ntype,
                        name,
                        None,
                        None,
                        None,
                        repo,
                        path,
                        start,
                        end,
                        chash if ntype == "module" else None,
                        params,
                    )
                )
            for src, dst, etype in edges:
                rows.append(
                    ("edge", None, None, None, src, dst, etype, repo, path,
                     None, None, None, None)
                )
        yield pd.DataFrame(rows, columns=_IR_COLS)


def extract_ir(corpus: DataFrame, parser: str = "fallback") -> DataFrame:
    """corpus(repo, path, commit, lang, content) → IR rows (one pass).

    parser="treesitter" opts into real grammars where the executors
    have them (per-executor cached parsers, auto-fallback otherwise —
    see pyext.extract_file)."""
    gated = corpus.filter(F.col("lang").isin(*SUPPORTED_LANGS))
    hashed = gated.withColumn("content_hash", F.sha2(F.col("content").cast("binary"), 256))
    ir_input = hashed.select("repo", "path", "lang", "content", "content_hash")

    def impl(batches):
        return _extract_batches_impl(batches, parser=parser)

    return ir_input.mapInPandas(impl, schema=IR_SCHEMA)


def dedupe_nodes(ir: DataFrame) -> DataFrame:
    """Merge node rows by id: set-merged files, deterministic attribute
    pick (reference in_memory.py:57-82 merges per-id across files)."""
    raw = ir.filter(F.col("kind") == "node")
    return (
        raw.groupBy("id")
        .agg(
            F.min("type").alias("type"),
            F.min("name").alias("name"),
            F.min("repo").alias("repo"),
            F.min("path").alias("path"),
            F.min("start_line").alias("start_line"),
            F.max("end_line").alias("end_line"),
            F.array_sort(F.collect_set("path")).alias("files"),
            F.min("content_hash").alias("content_hash"),
            F.min("params").alias("params"),
        )
        .select(
            "id", "type", "name", "repo", "path",
            "start_line", "end_line", "files", "content_hash", "params",
        )
    )


def dedupe_edges(ir: DataFrame) -> DataFrame:
    """Deduplicated (src, dst, edge_type) edge table — the north rule's
    core output. Provenance = lexicographic min (deterministic)."""
    raw = ir.filter(F.col("kind") == "edge")
    return (
        raw.groupBy("src", "dst", "edge_type")
        .agg(F.min(F.struct("repo", "path")).alias("prov"))
        .select("src", "dst", "edge_type", "prov.repo", "prov.path")
    )


def merge_nodes(nodes: DataFrame) -> DataFrame:
    """Re-merge NODES_SCHEMA rows by id — set-union of files, same
    semantics as the reference's cross-file node merge
    (in_memory.py:57-82). Used by incremental maintenance when freshly
    extracted rows meet surviving rows of the same (non-file-qualified)
    node id.

    rename_history (when the input carries the column) survives the
    merge — the reference keeps node['rename_history'] across updates
    (manager.py:499-507), so an upsert to an unrelated file must not
    wipe the audit trail. The explode duplicates each row's history
    once per file; flatten + array_distinct collapses those exact
    copies back to the original sequence (entries are full structs, so
    only genuinely identical rename events dedup)."""
    has_hist = "rename_history" in nodes.columns
    exploded = nodes.select(
        "id", "type", "name", "repo", "path",
        "start_line", "end_line", "content_hash", "params",
        *(["rename_history"] if has_hist else []),
        F.explode("files").alias("file"),
    )
    aggs = [
        F.min("type").alias("type"),
        F.min("name").alias("name"),
        F.min("repo").alias("repo"),
        F.min("path").alias("path"),
        F.min("start_line").alias("start_line"),
        F.max("end_line").alias("end_line"),
        F.array_sort(F.collect_set("file")).alias("files"),
        F.min("content_hash").alias("content_hash"),
        F.min("params").alias("params"),
    ]
    out_cols = [
        "id", "type", "name", "repo", "path",
        "start_line", "end_line", "files", "content_hash", "params",
    ]
    if has_hist:
        # collect_list skips null histories; the empty-list result of an
        # all-null group is normalized back to null to match the schema's
        # "no renames yet" convention
        aggs.append(
            F.array_distinct(F.flatten(F.collect_list("rename_history"))).alias(
                "_hist"
            )
        )
        out_cols.append("rename_history")
    merged = exploded.groupBy("id").agg(*aggs)
    if has_hist:
        merged = merged.withColumn(
            "rename_history",
            F.when(F.size("_hist") > 0, F.col("_hist")),
        )
    return merged.select(*out_cols)


def extract_graph(corpus: DataFrame, persist_ir: bool = True, parser: str = "fallback"):
    """Full extraction: corpus → (nodes, edges). Persists the IR so the
    two output aggregations share one extraction pass, and the deduped
    edge table so downstream consumers (link-graph builds, traversals)
    don't each replay the full-width dropDuplicates shuffle — the dedup
    groups on every column, so no consumer's column pruning can shrink
    that replay. nodes is NOT persisted: its consumers prune the merge
    aggregation down to the columns they touch, which is cheaper than
    ever materializing the full files/history merge. Both caches are
    plan-registered only until an action touches them; a cost-sensitive
    caller opts out with persist_ir=False."""
    ir = extract_ir(corpus, parser=parser)
    if persist_ir:
        ir = ir.persist()
    edges = dedupe_edges(ir)
    if persist_ir:
        edges = edges.persist()
    return dedupe_nodes(ir), edges
