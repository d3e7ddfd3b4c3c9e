"""Streaming rename window — the reference's 2-second delete/create
pairing as a watermarked stream-stream interval join (SURVEY.md §2.9).

Reference behavior being reproduced (manager.py:42, 274-325, 604-635):
the watcher buffers (timestamp, path) for deleted and created files and,
on every created event, pairs recently-deleted with recently-created
files whose timestamps lie within RENAME_DETECTION_WINDOW = 2.0 s, runs
content-similarity rename detection over the two sets, and — for a
match — updates node filepaths in place instead of delete+recreate
(manager.py:475-525: ids are PRESERVED, only the path/files tracking
moves, and the stale content hash is carried over).

Spark shape:
  * the event source is one stream of (event_type, ts, path, content)
    rows (FILE_EVENTS_SCHEMA); deletes and creates are two filtered
    views of it;
  * the 2 s window is a stream-stream INNER interval join: both sides
    watermarked on event time, join condition = extension equality (the
    reference's blocking gate, rename_detection.py:287-288) AND
    |create.ts − delete.ts| ≤ window. Watermarks bound the join state
    Spark keeps per executor, so the operator is safe on an unbounded
    stream — the distributed analog of the reference's 100-entry deques;
  * similarity (token-set Jaccard ≥ 0.7, as in pipelines/rename.py) is
    computed inside the join projection — candidate pairs leave the
    stream already thresholded;
  * greedy 1:1 resolution needs ranking windows, which Structured
    Streaming forbids mid-stream — it runs in foreachBatch via
    pipelines.rename.resolve_pairs, exactly the batch semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_engine_spark.pipelines.rename import (
    _ext,
    jaccard,
    resolve_pairs,
    token_set,
)
from graph_engine_spark.streaming.maintenance import GraphState


def rename_candidate_stream(
    events: DataFrame,
    window_seconds: float = 2.0,
    threshold: float = 0.7,
) -> DataFrame:
    """Streaming (old_path, new_path, similarity, del_ts, new_ts)
    candidate pairs from a FILE_EVENTS_SCHEMA stream.

    Works identically on a batch DataFrame (Spark plans a plain range
    join) — the streaming tests and the batch oracle share this code.
    """
    watermark = f"{max(window_seconds * 2.0, window_seconds + 1.0)} seconds"
    deletes = (
        events.filter(F.col("event_type") == "deleted")
        .select(
            F.col("ts").alias("del_ts"),
            F.col("path").alias("old_path"),
            _ext(F.col("path")).alias("del_ext"),
            token_set(F.col("content")).alias("tok_old"),
        )
    )
    creates = (
        events.filter(F.col("event_type") == "created")
        .select(
            F.col("ts").alias("new_ts"),
            F.col("path").alias("new_path"),
            _ext(F.col("path")).alias("new_ext"),
            token_set(F.col("content")).alias("tok_new"),
        )
    )
    if events.isStreaming:
        deletes = deletes.withWatermark("del_ts", watermark)
        creates = creates.withWatermark("new_ts", watermark)
    win = F.expr(f"INTERVAL {window_seconds} SECONDS")
    joined = deletes.join(
        creates,
        (F.col("del_ext") == F.col("new_ext"))
        & (F.col("new_ts") >= F.col("del_ts") - win)
        & (F.col("new_ts") <= F.col("del_ts") + win),
        "inner",
    )
    return joined.select(
        "old_path",
        "new_path",
        jaccard(F.col("tok_old"), F.col("tok_new")).alias("similarity"),
        "del_ts",
        "new_ts",
    ).filter(F.col("similarity") >= threshold)


def apply_renames(state: GraphState, resolved: DataFrame) -> GraphState:
    """Apply resolved (old_path, new_path) renames to graph state —
    reference update_node_filepath (manager.py:475-525): node ids are
    preserved; the path column, every occurrence in the files provenance
    arrays (including nodes SHARED with other files), and the stored
    content hash all follow the file to its new path.

    Scale shape: the rename set is materialized as a literal map and
    applied as a pure zero-shuffle projection over nodes/edges/hashes.
    The driver-side collect here is safe BY CONSTRUCTION — a rename
    batch is bounded by the 2 s pairing window and human action rate
    (the reference caps its buffers at 100 entries, manager.py:92-94) —
    unlike delete batches, which can be repo-wide and must stay
    distributed (see apply_deletes). The alternative (explode files →
    join → regroup) would shuffle the ENTIRE node table to rename a
    handful of files.
    """
    has_ts = "new_ts" in resolved.columns
    cols = ["old_path", "new_path"] + (["new_ts"] if has_ts else [])
    rows = resolved.select(*cols).collect()
    pairs = [(r["old_path"], r["new_path"]) for r in rows]
    if not pairs:
        return state
    triples = [
        (
            r["old_path"],
            r["new_path"],
            r["new_ts"].timestamp() if has_ts and r["new_ts"] is not None else None,
        )
        for r in rows
    ]
    mapping = F.create_map(*[F.lit(x) for pair in pairs for x in pair])

    def renamed(col):
        return F.coalesce(mapping[col], col)

    # rename_history entries (reference manager.py:499-507): every node
    # whose provenance contained old_path — evaluated against the
    # PRE-RENAME files array — appends an {old_path, new_path, ts}
    # struct. Same bounded-literal shape as the mapping itself.
    hist_entries = F.filter(
        F.array(
            *[
                F.when(
                    F.array_contains(F.col("files"), F.lit(old)),
                    F.struct(
                        F.lit(old).alias("old_path"),
                        F.lit(new).alias("new_path"),
                        F.lit(ts).cast("double").alias("ts"),
                    ),
                )
                for old, new, ts in triples
            ]
        ),
        lambda x: x.isNotNull(),
    )
    nodes = state.nodes.withColumn(
        "rename_history",
        F.when(
            F.size(hist_entries) > 0,
            F.concat(
                F.coalesce(
                    F.col("rename_history")
                    if "rename_history" in state.nodes.columns
                    else F.lit(None).cast(
                        "array<struct<old_path:string,new_path:string,ts:double>>"
                    ),
                    F.array().cast(
                        "array<struct<old_path:string,new_path:string,ts:double>>"
                    ),
                ),
                hist_entries,
            ),
        ).otherwise(
            F.col("rename_history")
            if "rename_history" in state.nodes.columns
            else F.lit(None).cast(
                "array<struct<old_path:string,new_path:string,ts:double>>"
            )
        ),
    ).withColumn("path", renamed(F.col("path"))).withColumn(
        "files",
        F.when(
            F.col("files").isNotNull(), F.transform("files", lambda f: renamed(f))
        ).otherwise(F.col("files")),
    )
    edges = state.edges.withColumn("path", renamed(F.col("path")))
    # hash travels with the rename (reference carries it, noting it may
    # be stale if content changed mid-rename, manager.py:630-632)
    hashes = state.file_hashes.withColumn("path", renamed(F.col("path")))
    return GraphState(nodes, edges, hashes)


def start_streaming_rename_detection(
    spark,
    events_dir: str,
    out_dir: str,
    window_seconds: float = 2.0,
    trigger_seconds: float = 0.5,
    threshold: float = 0.7,
    available_now: bool = False,
):
    """Wire the interval join over a file-event stream; per micro-batch,
    greedy-resolve the candidate pairs (resolve_pairs) and append them
    to a durable rename history (the reference's manager.rename_history
    dict, manager.py:95,310-311).

    Returns (query, sink_path). Rename application to graph state is
    apply_renames — callers integrate it with their upsert loop.
    """
    from graph_engine_spark.schemas import FILE_EVENTS_SCHEMA

    events = spark.readStream.schema(FILE_EVENTS_SCHEMA).parquet(events_dir)
    candidates = rename_candidate_stream(events, window_seconds, threshold)
    sink = f"{out_dir}/renames"

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        resolved = resolve_pairs(batch_df.select("old_path", "new_path", "similarity"))
        resolved.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            sink
        )

    writer = candidates.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", f"{out_dir}/_rename_checkpoint"
    )
    if available_now:
        # drain everything currently in events_dir, then stop — join
        # state survives in the checkpoint across runs (tests restart
        # the query per feeding round; the 0.5 s poll is production)
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    query = writer.start()
    return query, sink
