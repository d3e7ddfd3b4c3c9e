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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_engine_spark.extractor import extract_graph


@dataclass
class GraphState:
    nodes: DataFrame
    edges: DataFrame
    file_hashes: DataFrame  # (path, content_hash)


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


def _changed_only(batch: DataFrame, file_hashes: DataFrame) -> DataFrame:
    """Parse-skip: drop rows whose stored hash equals the incoming hash
    (reference manager.py:683-694)."""
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
        .select("b.repo", "b.path", "b.commit", "b.lang", "b.content")
    )


def apply_upserts(state: GraphState, batch: DataFrame) -> GraphState:
    """created/modified events: file-scoped delete+insert.

    On Iceberg: MERGE INTO nodes/edges USING batch ON path
    (delete-then-insert per file partition). Here: anti-join + union.
    """
    changed = _changed_only(batch, state.file_hashes)
    new_nodes, new_edges = extract_graph(changed)
    paths = changed.select("path").distinct()

    # Node rows are keyed by id and may be defined by several files
    # (non-file-qualified ids): recompute the merge over surviving rows.
    kept_nodes = state.nodes.join(paths, "path", "left_anti")
    kept_edges = state.edges.join(paths, "path", "left_anti")
    from graph_engine_spark.extractor.extract import merge_nodes

    nodes = merge_nodes(kept_nodes.unionByName(new_nodes)).persist()
    edges = (
        kept_edges.unionByName(new_edges)
        .dropDuplicates(["src", "dst", "edge_type"])
        .persist()
    )

    new_hashes = changed.select(
        "path", F.sha2(F.col("content").cast("binary"), 256).alias("content_hash")
    )
    hashes = (
        state.file_hashes.join(paths, "path", "left_anti")
        .unionByName(new_hashes)
        .persist()
    )
    return GraphState(nodes, edges, hashes)


def apply_deletes(state: GraphState, deleted_paths: DataFrame) -> GraphState:
    """deleted events (reference in_memory.py:107-169): rows of the file
    vanish; multi-file node ids keep their other files — `files` is
    recomputed by removing the deleted path and rows with empty files
    drop out (shared-node refcount semantics)."""
    p = deleted_paths.select("path").distinct()
    # CDC delete batches are small — materialize as a literal array for
    # the files-set subtraction (scale path: explode files → anti-join →
    # re-aggregate, only needed if a single batch deletes millions).
    deleted = [r["path"] for r in p.collect()]
    deleted_arr = F.array(*[F.lit(x) for x in deleted]) if deleted else F.array()
    nodes = (
        state.nodes.withColumn("files", F.array_except("files", deleted_arr))
        .filter(F.size("files") > 0)
        # provenance follows a surviving file (reference keeps the node
        # alive off its remaining files, in_memory.py:130-150)
        .withColumn("path", F.element_at("files", 1))
    )
    edges = state.edges.join(p, "path", "left_anti")
    hashes = state.file_hashes.join(p, "path", "left_anti")
    return GraphState(nodes, edges, hashes)


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
        # carried state must be re-rooted on durable storage each batch:
        # write the new state to a versioned dir (an Iceberg snapshot
        # commit off-sandbox) and reload — the atomic tmp+publish role
        # of the reference's snapshot write (json_storage.py:217-224).
        new_state = apply_upserts(state["s"], batch_df)
        vdir = f"{state_dir}/v{batch_id:06d}"
        new_state.nodes.write.mode("overwrite").parquet(f"{vdir}/nodes")
        new_state.edges.write.mode("overwrite").parquet(f"{vdir}/edges")
        new_state.file_hashes.write.mode("overwrite").parquet(f"{vdir}/hashes")
        state["s"] = GraphState(
            nodes=spark.read.parquet(f"{vdir}/nodes"),
            edges=spark.read.parquet(f"{vdir}/edges"),
            file_hashes=spark.read.parquet(f"{vdir}/hashes"),
        )
        # publish the latest pointer atomically
        import os

        tmp = f"{state_dir}/LATEST.tmp"
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, f"{state_dir}/LATEST")

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(on_batch)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .start()
    )
    return stream, state
