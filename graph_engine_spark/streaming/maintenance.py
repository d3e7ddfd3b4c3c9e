"""Incremental graph maintenance — the reference's watch loop as
Structured Streaming / batch-CDC (SURVEY.md §2.9, §3.2).

Reference behavior being reproduced:
  * created  → insert file's nodes/edges          (manager.py:604-664)
  * modified → hash-compare short-circuit, else file-scoped
               delete+insert                      (manager.py:666-740, 683-694)
  * deleted  → remove file's rows; nodes shared with other files
               survive with that file removed from ``files``
               (manager.py:742-774; in_memory.py:107-169)

Spark shape: each micro-batch of corpus deltas is joined against the
stored (path, content_hash) state — unchanged rows are dropped (the
reference's parse-skip, manager.py:683-694) — then the batch is
extracted and applied as a file-scoped replace: on Iceberg this is
``MERGE INTO`` / ``overwritePartitions`` keyed by path; the sandbox
implementation applies the same delete+insert algebra over DataFrames
(anti-join on path, union of fresh rows).

``apply_batch`` is engine-agnostic and is what ``foreachBatch`` calls in
the streaming wiring below.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GraphState:
    nodes: DataFrame
    edges: DataFrame
    file_hashes: DataFrame  # (path, content_hash)
    # batch-scoped cached frames backing this state (the changed-set
    # and extraction IR the nodes/edges/hashes plans read; the merged
    # edge table on the dynamic-call path). Dropping the Python
    # references does NOT unpersist — a long-lived stream must call
    # release() (persist_state_version does) once the state is re-rooted
    # on durable storage, or the session CacheManager grows per
    # micro-batch (round-3 VERDICT finding #2).
    persisted: tuple = field(default=(), repr=False)
    # table name → parquet dir the frame is an UNMODIFIED re-read of
    # (set by persist_state_version on the reloaded state; a transform
    # that passes a table through untouched propagates its entry).
    # persist_state_version commits such a table by linking the
    # existing files into the new version — the Iceberg metadata-only
    # commit for unchanged tables, instead of a Spark re-write job
    # (round-6: the dynamic-call merge never touches file_hashes, yet
    # every merge persist re-scanned and re-wrote it).
    sources: dict = field(default_factory=dict, repr=False)

    def release(self) -> None:
        """Unpersist the batch-scoped frames backing this state. Call
        only after the state is re-rooted on durable storage (or fully
        consumed) — the frames' lineage recomputes if re-read."""
        for df in self.persisted:
            df.unpersist()
        self.persisted = ()


def empty_state(spark) -> GraphState:
    from graph_engine_spark.schemas import EDGES_SCHEMA, NODES_SCHEMA
    from pyspark.sql.types import StringType, StructField, StructType

    return GraphState(
        nodes=spark.createDataFrame([], NODES_SCHEMA),
        edges=spark.createDataFrame([], EDGES_SCHEMA),
        file_hashes=spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("path", StringType(), False),
                    StructField("content_hash", StringType(), False),
                ]
            ),
        ),
    )


def _align(df: DataFrame, schema) -> DataFrame:
    """Add any schema columns the frame lacks as typed nulls and project
    to schema order — freshly extracted rows meet the state tables'
    wider shape (dynamic-call columns) here."""
    cols = set(df.columns)
    out = df
    for f in schema.fields:
        if f.name not in cols:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    return out.select(*[f.name for f in schema.fields])


def _changed_only(batch: DataFrame, file_hashes: DataFrame) -> DataFrame:
    """Parse-skip: drop rows whose stored hash equals the incoming hash
    (reference manager.py:683-694). The computed content_hash rides the
    result so consumers never re-hash the batch content (round-6: the
    unpersisted changed-set lineage — this join plus a sha2 over every
    batch row — was replayed by each of the nodes/edges/hashes builds)."""
    hashed = batch.withColumn(
        "content_hash", F.sha2(F.col("content").cast("binary"), 256)
    )
    return (
        hashed.alias("b")
        .join(file_hashes.alias("s"), "path", "left")
        .filter(
            F.col("s.content_hash").isNull()
            | (F.col("b.content_hash") != F.col("s.content_hash"))
        )
        .select("b.repo", "b.path", "b.commit", "b.lang", "b.content", "b.content_hash")
    )


def apply_upserts(state: GraphState, batch: DataFrame) -> GraphState:
    """created/modified events: file-scoped delete+insert.

    On Iceberg: MERGE INTO nodes/edges USING batch ON path
    (delete-then-insert per file partition). Here: anti-join + union.
    """
    # persist the changed-set once (round-6): it feeds the extraction
    # IR, the surviving-row anti-joins (via paths), and the hash-table
    # rebuild — unpersisted, the hash-compare join and the sha2 over the
    # batch content were recomputed by every consumer (3-4× per batch)
    changed = _changed_only(batch, state.file_hashes).persist()
    # extract via the IR directly (not extract_graph) so the persisted
    # IR handle can be released with the state (leak fix, VERDICT r3 #2)
    from graph_engine_spark.extractor.extract import (
        dedupe_edges,
        dedupe_nodes,
        extract_ir,
    )

    ir = extract_ir(changed.drop("content_hash")).persist()
    new_edges = dedupe_edges(ir)
    # Raw node IR rows, shaped for merge_nodes (files = [path]): every
    # merge aggregate is associative (min/max/set-union), so one merge
    # pass over (touched kept rows ∪ raw IR rows) equals the old
    # dedupe_nodes-then-merge_nodes double aggregation exactly — and
    # skips a whole ObjectHashAggregate over the batch (round-6).
    ir_nodes = ir.filter(F.col("kind") == "node").select(
        "id", "type", "name", "repo", "path", "start_line", "end_line",
        F.array("path").alias("files"), "content_hash", "params",
    )
    # The two batch-scoped dimension tables feed several broadcast
    # builds each (paths: nodes/edges/hashes anti-joins; fresh ids:
    # the untouched/touched split) — materialize them once as tiny
    # checkpointed leaves (round-6) instead of re-running the distinct
    # over the batch inside every broadcast query stage.
    paths = changed.select("path").distinct().localCheckpoint(eager=True)

    # Node rows are keyed by id and may be defined by several files
    # (non-file-qualified ids): recompute the merge over surviving rows.
    # Dynamic-call annotations are NOT carried through the merge — the
    # stateful call stream (callcounts.py) is their source of truth and
    # merge_dynamic_calls re-applies the running totals after upserts.
    from graph_engine_spark.schemas import EDGES_SCHEMA, NODES_SCHEMA

    kept_nodes = state.nodes.join(paths, "path", "left_anti")
    kept_edges = state.edges.join(paths, "path", "left_anti")
    from graph_engine_spark.extractor.extract import merge_nodes

    # Re-merge ONLY the node ids the batch actually touched (round-6):
    # merge_nodes is identity on rows it already produced (files sorted,
    # provenance/extents already the group min/max, history already
    # distinct), so untouched surviving rows can bypass the explode +
    # collect_set aggregation entirely. That turns the per-batch merge
    # shuffle from O(|state|) into O(|batch|): the id split is two
    # joins against the (small, broadcastable) fresh-id dimension.
    fresh_ids = ir_nodes.select("id").distinct().localCheckpoint(eager=True)
    untouched = kept_nodes.join(F.broadcast(fresh_ids), "id", "left_anti")
    touched_kept = kept_nodes.join(F.broadcast(fresh_ids), "id", "left_semi")
    merged = merge_nodes(
        touched_kept.unionByName(_align(ir_nodes, NODES_SCHEMA), allowMissingColumns=True)
    )
    # nodes/edges/hashes are NOT persisted (round-6): in the
    # maintenance loop each is consumed exactly once — by its own
    # parquet write in persist_state_version — and the inputs they
    # share (the changed-set, the extraction IR) are the frames worth
    # caching, and are. Block-manager stores of the full state per
    # micro-batch bought nothing on that path.
    nodes = _align(untouched, NODES_SCHEMA).unionByName(_align(merged, NODES_SCHEMA))
    edges = (
        kept_edges.unionByName(_align(new_edges, EDGES_SCHEMA))
        .dropDuplicates(["src", "dst", "edge_type"])
    )

    new_hashes = changed.select("path", "content_hash")
    hashes = (
        state.file_hashes.join(paths, "path", "left_anti")
        .unionByName(new_hashes)
        # one narrow table, one shuffle: the broadcast anti-join keeps
        # the upstream scan partitioning (65 near-empty partitions at
        # bench scale — 17 files per written version); repartitioning
        # lets AQE size the layout to the data (round-6, guide §6)
        .repartition("path")
    )
    return GraphState(nodes, edges, hashes, persisted=(changed, ir))


def apply_deletes(state: GraphState, deleted_paths: DataFrame) -> GraphState:
    """deleted events (reference in_memory.py:107-169): rows of the file
    vanish; multi-file node ids keep their other files — `files` is
    recomputed by removing the deleted path and rows with empty files
    drop out (shared-node refcount semantics).

    Fully distributed — no driver-side materialization of the delete
    set: the files-per-node subtraction is explode → anti-join →
    re-aggregate, so a repo-wipe event (millions of paths in one CDC
    batch) costs one bounded shuffle instead of a driver OOM. Rows
    never exceed the stored node row's own width (the re-aggregated
    array is a subset of the node's existing files array)."""
    p = deleted_paths.select("path").distinct()
    surviving = (
        state.nodes.select("id", F.explode("files").alias("path"))
        .join(p, "path", "left_anti")
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("path")).alias("_files"))
    )
    nodes = (
        # inner join: ids whose every file was deleted have no surviving
        # row and drop out (the size>0 refcount filter)
        state.nodes.join(surviving, "id", "inner")
        .withColumn("files", F.col("_files"))
        .drop("_files")
        # provenance follows a surviving file (reference keeps the node
        # alive off its remaining files, in_memory.py:130-150)
        .withColumn("path", F.element_at("files", 1))
    )
    edges = state.edges.join(p, "path", "left_anti")
    hashes = state.file_hashes.join(p, "path", "left_anti")
    return GraphState(nodes, edges, hashes, persisted=state.persisted)


def merge_dynamic_calls(state: GraphState, totals: DataFrame) -> GraphState:
    """Merge dynamic call-event RUNNING TOTALS into the graph —
    reference manager.py:180-272.

    totals: (src, dst, dynamic_call_count, first_call_time,
    last_call_time), the output of stateful_call_counts (running totals
    per edge, so the merge is idempotent replace, never add — replaying
    the latest micro-batch's totals can't double-count).

    Reference semantics mirrored:
      * an existing (src, dst, 'calls') edge is annotated in place:
        dynamic=true, counter and first/last call times set
        (manager.py:186-194);
      * an unseen (src, dst) pair becomes a NEW dynamic calls edge with
        no file provenance (manager.py:196-215 — the reference edge_data
        carries no filepath either);
      * per-node totals (update_function_call_count, manager.py:249-272):
        each CALLEE node's dynamic_call_count is the sum of its incoming
        dynamic edge totals.
    """
    from graph_engine_spark.schemas import EDGES_SCHEMA

    t = totals.select(
        "src",
        "dst",
        F.col("dynamic_call_count").cast("long").alias("_cnt"),
        F.col("first_call_time").cast("double").alias("_first"),
        F.col("last_call_time").cast("double").alias("_last"),
    )
    edges = _align(state.edges, EDGES_SCHEMA)
    annotated = (
        edges.join(t, ["src", "dst"], "left")
        .withColumn("_hit", F.col("_cnt").isNotNull() & (F.col("edge_type") == "calls"))
        .select(
            "src",
            "dst",
            "edge_type",
            "repo",
            "path",
            F.when(F.col("_hit"), F.lit(True)).otherwise(F.col("dynamic")).alias("dynamic"),
            F.when(F.col("_hit"), F.col("_cnt"))
            .otherwise(F.col("dynamic_call_count"))
            .alias("dynamic_call_count"),
            F.when(F.col("_hit"), F.col("_first"))
            .otherwise(F.col("first_call_time"))
            .alias("first_call_time"),
            F.when(F.col("_hit"), F.col("_last"))
            .otherwise(F.col("last_call_time"))
            .alias("last_call_time"),
        )
    )
    fresh = (
        t.join(
            edges.filter(F.col("edge_type") == "calls").select("src", "dst"),
            ["src", "dst"],
            "left_anti",
        )
        .select(
            "src",
            "dst",
            F.lit("calls").alias("edge_type"),
            F.lit(None).cast("string").alias("repo"),
            F.lit(None).cast("string").alias("path"),
            F.lit(True).alias("dynamic"),
            F.col("_cnt").alias("dynamic_call_count"),
            F.col("_first").alias("first_call_time"),
            F.col("_last").alias("last_call_time"),
        )
    )
    # persist the merged edge table (round-6): it is consumed twice —
    # the edges write and the per-node totals aggregation below — and
    # each consumption replays the annotate/fresh joins (including the
    # totals input, which in the maintenance loop is itself a query
    # over the stored state)
    new_edges = annotated.unionByName(fresh).persist()

    from graph_engine_spark.schemas import NODES_SCHEMA

    # Per-node totals are recomputed from the MERGED edge table, not the
    # incoming batch: stateful_call_counts emits only edges with NEW
    # events per micro-batch, so a batch-derived sum would overwrite a
    # callee's total with a partial view (X called by A=10,B=5 → 15;
    # next batch A=12 only → node must become 17, not 12). Summing the
    # merged edges — where quiet edges keep their carried totals — is
    # additive like the reference's update_function_call_count
    # (manager.py:249-272) and self-heals after apply_upserts re-aligns
    # node columns to null.
    node_totals = (
        new_edges.filter(
            (F.col("edge_type") == "calls") & F.col("dynamic_call_count").isNotNull()
        )
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum("dynamic_call_count").alias("_node_cnt"))
    )
    new_nodes = (
        _align(state.nodes, NODES_SCHEMA).join(node_totals, "id", "left")
        .withColumn(
            "dynamic_call_count",
            F.coalesce("_node_cnt", "dynamic_call_count"),
        )
        .drop("_node_cnt")
    )
    return GraphState(
        new_nodes,
        new_edges,
        state.file_hashes,
        persisted=tuple(state.persisted) + (new_edges,),
        # file_hashes passes through untouched — keep its durable-source
        # tag so the next persist links it instead of re-writing it
        sources={k: v for k, v in state.sources.items() if k == "hashes"},
    )


def persist_state_version(spark, new_state: GraphState, state_dir: str, batch_id: int) -> GraphState:
    """Write a state version to durable storage, publish the LATEST
    pointer atomically, and return the state re-rooted on the written
    Parquet (an Iceberg snapshot commit off-sandbox — the atomic
    tmp+publish role of the reference's snapshot write,
    json_storage.py:217-224).

    Releases the batch-scoped cached frames AFTER the write consumes
    them: without this, every micro-batch of a long-lived stream leaves
    ~4 new entries in the session CacheManager forever (round-3 VERDICT
    finding #2 — the same leak class as the round-2 minhash fix)."""
    vdir = f"{state_dir}/v{batch_id:06d}"
    # The three table writes are independent jobs — submit them from a
    # small thread pool (guide §2.6) so each write's task tail
    # back-fills the cores the others leave idle; at sandbox scale this
    # also overlaps three rounds of job-scheduling latency. Job
    # descriptions are thread-local, so the UI stays labeled per table.
    # A table tagged in new_state.sources is an UNMODIFIED re-read of a
    # previous version's files: commit it by hard-linking those files
    # into the new version (copy fallback) — the Iceberg metadata-only
    # commit for unchanged tables — instead of a Spark scan+write job.
    from concurrent.futures import ThreadPoolExecutor

    def _link_tree(src_dir: str, dst_dir: str) -> None:
        import os
        import shutil

        os.makedirs(dst_dir, exist_ok=True)
        for name in os.listdir(src_dir):
            s, d = os.path.join(src_dir, name), os.path.join(dst_dir, name)
            if os.path.isfile(s):
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    def _write(args):
        df, sub = args
        src = new_state.sources.get(sub)
        if src:
            _link_tree(src, f"{vdir}/{sub}")
        else:
            df.write.mode("overwrite").parquet(f"{vdir}/{sub}")

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(
            pool.map(
                _write,
                [
                    (new_state.nodes, "nodes"),
                    (new_state.edges, "edges"),
                    (new_state.file_hashes, "hashes"),
                ],
            )
        )
    reloaded = GraphState(
        nodes=spark.read.parquet(f"{vdir}/nodes"),
        edges=spark.read.parquet(f"{vdir}/edges"),
        file_hashes=spark.read.parquet(f"{vdir}/hashes"),
        sources={
            "nodes": f"{vdir}/nodes",
            "edges": f"{vdir}/edges",
            "hashes": f"{vdir}/hashes",
        },
    )
    new_state.release()
    import os

    tmp = f"{state_dir}/LATEST.tmp"
    with open(tmp, "w") as f:
        f.write(vdir)
    os.replace(tmp, f"{state_dir}/LATEST")
    return reloaded


def start_streaming_maintenance(
    spark,
    input_dir: str,
    state_dir: str,
    trigger_seconds: float = 0.5,
):
    """Wire a Structured Streaming file source of corpus deltas into
    apply_upserts via foreachBatch, persisting nodes/edges as Parquet
    per micro-batch (Iceberg MERGE INTO off-sandbox). Trigger mirrors
    the reference's 0.5 s poll (manager.py:85)."""
    from graph_engine_spark.schemas import CORPUS_SCHEMA

    state = {"s": empty_state(spark)}

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # A micro-batch DataFrame is only valid inside its batch, so the
        # carried state must be re-rooted on durable storage each batch.
        state["s"] = persist_state_version(
            spark, apply_upserts(state["s"], batch_df), state_dir, batch_id
        )

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(on_batch)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .start()
    )
    return stream, state
