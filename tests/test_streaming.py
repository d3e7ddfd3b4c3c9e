"""Incremental maintenance semantics (SURVEY.md §2.9) — batch CDC
algebra + a real Structured Streaming run with foreachBatch."""

import time

import pytest
from pyspark.sql import functions as F

from graph_engine_spark.streaming.maintenance import (
    apply_deletes,
    apply_upserts,
    empty_state,
    start_streaming_maintenance,
)

FILE_A_V1 = "import os\n\ndef shared_func():\n    return 1\n"
FILE_A_V2 = "import sys\n\ndef shared_func():\n    return 2\n\ndef extra():\n    return 3\n"
FILE_B = "import os\n\ndef shared_func():\n    return 9\n"


def corpus_df(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], "c" * 40, "python", r[2]) for r in rows],
        ["repo", "path", "commit", "lang", "content"],
    )


def test_upsert_insert_then_modify(spark):
    state = empty_state(spark)
    state = apply_upserts(state, corpus_df(spark, [("r", "a.py", FILE_A_V1)]))
    ids = {r["id"] for r in state.nodes.collect()}
    assert "function:shared_func" in ids and "import:os" in ids

    # modify: import changes os->sys, extra() appears
    state = apply_upserts(state, corpus_df(spark, [("r", "a.py", FILE_A_V2)]))
    ids = {r["id"] for r in state.nodes.collect()}
    assert "import:sys" in ids and "function:extra" in ids
    assert "import:os" not in ids  # old file-scoped rows replaced
    edges = {(r["src"], r["dst"], r["edge_type"]) for r in state.edges.collect()}
    assert ("file:a.py", "import:sys", "imports") in edges
    assert ("file:a.py", "import:os", "imports") not in edges


def test_hash_skip_unchanged(spark):
    state = empty_state(spark)
    state = apply_upserts(state, corpus_df(spark, [("r", "a.py", FILE_A_V1)]))
    h1 = {r["path"]: r["content_hash"] for r in state.file_hashes.collect()}
    # re-sending identical content is a no-op (parse skip)
    state2 = apply_upserts(state, corpus_df(spark, [("r", "a.py", FILE_A_V1)]))
    h2 = {r["path"]: r["content_hash"] for r in state2.file_hashes.collect()}
    assert h1 == h2
    assert state2.nodes.count() == state.nodes.count()


def test_shared_node_refcount_on_delete(spark):
    """reference tests/test_in_memory_graph.py:75-123: removing file A
    keeps shared_func alive via file B."""
    state = empty_state(spark)
    state = apply_upserts(
        state, corpus_df(spark, [("r", "a.py", FILE_A_V1), ("r", "b.py", FILE_B)])
    )
    shared = state.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert len(shared) == 1 and sorted(shared[0]["files"]) == ["a.py", "b.py"]

    deleted = spark.createDataFrame([("a.py",)], ["path"])
    state = apply_deletes(state, deleted)
    shared = state.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert len(shared) == 1 and shared[0]["files"] == ["b.py"]
    # a.py-only nodes are gone
    assert state.nodes.filter(F.col("id") == "module:a.py").count() == 0
    assert state.edges.filter(F.col("path") == "a.py").count() == 0


def test_structured_streaming_foreachbatch(spark, tmp_path):
    indir = str(tmp_path / "in")
    statedir = str(tmp_path / "state")
    corpus_df(spark, [("r", "a.py", FILE_A_V1)]).write.mode("append").parquet(indir)
    stream, state = start_streaming_maintenance(spark, indir, statedir, trigger_seconds=0.5)

    def latest_nodes():
        try:
            with open(f"{statedir}/LATEST") as f:
                vdir = f.read().strip()
            return spark.read.parquet(f"{vdir}/nodes")
        except Exception:
            return None

    try:
        deadline = time.time() + 60
        ok = False
        while time.time() < deadline:
            nodes = latest_nodes()
            if nodes is not None and nodes.filter(
                F.col("id") == "function:shared_func"
            ).count() > 0:
                ok = True
                break
            time.sleep(1)
        assert ok, "streaming maintenance never materialized nodes"
        # second micro-batch: new file arrives
        corpus_df(spark, [("r", "b.py", FILE_B)]).write.mode("append").parquet(indir)
        deadline = time.time() + 60
        ok = False
        while time.time() < deadline:
            nodes = latest_nodes()
            if nodes is not None:
                row = nodes.filter(F.col("id") == "function:shared_func").collect()
                if row and len(row[0]["files"]) == 2:
                    ok = True
                    break
            time.sleep(1)
        assert ok, "second micro-batch not applied"
    finally:
        stream.stop()


def test_stateful_call_counts_across_restarts(spark, tmp_path):
    """applyInPandasWithState call counters (reference manager.py:180-215):
    counts and first/last timestamps accumulate across micro-batches AND
    across query restarts (state survives in the checkpoint)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from graph_engine_spark.streaming.callcounts import stateful_call_counts

    schema = StructType(
        [
            StructField("src", StringType(), False),
            StructField("dst", StringType(), False),
            StructField("ts", DoubleType(), False),
        ]
    )
    in_dir = str(tmp_path / "events")
    ck_dir = str(tmp_path / "ck")
    import os

    os.makedirs(in_dir, exist_ok=True)

    def feed(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(in_dir)

    def run_round(qname):
        latest = {}

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                latest[(r["src"], r["dst"])] = (
                    r["dynamic_call_count"], r["first_call_time"], r["last_call_time"]
                )

        events = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            stateful_call_counts(events)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return latest

    feed([("f:a", "f:b", 10.0), ("f:a", "f:b", 12.0), ("f:x", "f:y", 11.0)], "b1")
    got1 = run_round("cc_round1")
    assert got1[("f:a", "f:b")] == (2, 10.0, 12.0)
    assert got1[("f:x", "f:y")] == (1, 11.0, 11.0)

    # restart the query on new data: state must carry over
    feed([("f:a", "f:b", 9.0), ("f:a", "f:b", 20.0)], "b2")
    got2 = run_round("cc_round2")
    assert got2[("f:a", "f:b")] == (4, 9.0, 20.0)


# --- streaming rename window (reference manager.py:42, 274-325) -------

BASE_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _event_rows(spark, rows):
    """rows: (event_type, ts_epoch_seconds, path, content)."""
    import datetime

    from graph_engine_spark.schemas import FILE_EVENTS_SCHEMA

    data = [
        (
            et,
            datetime.datetime.fromtimestamp(ts, datetime.timezone.utc).replace(
                tzinfo=None
            ),
            "r",
            path,
            "c" * 40,
            "python",
            content,
        )
        for et, ts, path, content in rows
    ]
    return spark.createDataFrame(data, FILE_EVENTS_SCHEMA)


def test_rename_candidate_window_batch_semantics(spark):
    """Interval-join semantics on a batch frame: pairs within 2 s match,
    pairs outside the window or across extensions never do."""
    from graph_engine_spark.pipelines.rename import resolve_pairs
    from graph_engine_spark.streaming.renames import rename_candidate_stream

    events = _event_rows(
        spark,
        [
            ("deleted", 10.0, "old/a.py", BASE_TEXT),
            ("created", 11.2, "new/a2.py", BASE_TEXT),        # +1.2 s → pair
            ("deleted", 100.0, "old/far.py", BASE_TEXT),
            ("created", 104.0, "new/late.py", BASE_TEXT),     # +4 s → no pair
            ("deleted", 200.0, "old/ext.py", BASE_TEXT),
            ("created", 200.5, "new/ext.txt", BASE_TEXT),     # ext gate → no pair
            ("created", 9.0, "new/before.py", BASE_TEXT),     # create BEFORE delete, 1 s → pair
        ],
    )
    pairs = rename_candidate_stream(events, window_seconds=2.0)
    got = {(r["old_path"], r["new_path"]) for r in pairs.collect()}
    assert got == {
        ("old/a.py", "new/a2.py"),
        ("old/a.py", "new/before.py"),
    }
    resolved = {
        (r["old_path"], r["new_path"])
        for r in resolve_pairs(
            pairs.select("old_path", "new_path", "similarity")
        ).collect()
    }
    # greedy 1:1: the tie on similarity 1.0 resolves to the ascending path
    assert resolved == {("old/a.py", "new/a2.py")}


def test_apply_renames_preserves_ids_and_moves_provenance(spark):
    """reference update_node_filepath (manager.py:475-525): ids stay,
    path/files/hash move — including files entries of SHARED nodes."""
    from graph_engine_spark.streaming.renames import apply_renames

    state = empty_state(spark)
    state = apply_upserts(
        state, corpus_df(spark, [("r", "a.py", FILE_A_V1), ("r", "b.py", FILE_B)])
    )
    old_hash = {r["path"]: r["content_hash"] for r in state.file_hashes.collect()}
    resolved = spark.createDataFrame(
        [("a.py", "renamed.py", 1.0)], ["old_path", "new_path", "similarity"]
    )
    state2 = apply_renames(state, resolved)
    # node ids unchanged
    assert {r["id"] for r in state2.nodes.collect()} == {
        r["id"] for r in state.nodes.collect()
    }
    # a.py-scoped nodes moved
    assert state2.nodes.filter(F.col("path") == "a.py").count() == 0
    assert state2.nodes.filter(F.col("path") == "renamed.py").count() > 0
    # shared node's files array rewrote the a.py entry and kept b.py
    shared = state2.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert sorted(shared[0]["files"]) == ["b.py", "renamed.py"]
    # edges and hash provenance follow
    assert state2.edges.filter(F.col("path") == "a.py").count() == 0
    new_hash = {r["path"]: r["content_hash"] for r in state2.file_hashes.collect()}
    assert new_hash["renamed.py"] == old_hash["a.py"]
    assert "a.py" not in new_hash


def test_apply_renames_accumulates_rename_history(spark):
    """reference manager.py:499-507: every node that carried the file
    appends an {old_path, new_path, ts} struct per rename — two renames
    of the same file accumulate TWO entries, untouched nodes none."""
    import datetime

    from graph_engine_spark.streaming.renames import apply_renames

    state = empty_state(spark)
    state = apply_upserts(
        state, corpus_df(spark, [("r", "a.py", FILE_A_V1), ("r", "b.py", FILE_B)])
    )
    t1 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    t2 = datetime.datetime(2026, 8, 17, 12, 0, 5)
    r1 = spark.createDataFrame(
        [("a.py", "mid.py", 1.0, t1)], ["old_path", "new_path", "similarity", "new_ts"]
    )
    r2 = spark.createDataFrame(
        [("mid.py", "final.py", 1.0, t2)],
        ["old_path", "new_path", "similarity", "new_ts"],
    )
    state2 = apply_renames(apply_renames(state, r1), r2)
    moved = state2.nodes.filter(F.col("path") == "final.py").collect()
    assert moved
    for row in moved:
        hist = row["rename_history"]
        assert [(h["old_path"], h["new_path"]) for h in hist] == [
            ("a.py", "mid.py"),
            ("mid.py", "final.py"),
        ]
        assert hist[0]["ts"] == t1.timestamp()
        assert hist[1]["ts"] == t2.timestamp()
    # a node never scoped to the renamed file carries no history
    untouched = state2.nodes.filter(F.col("id") == "module:b.py").collect()
    assert untouched and untouched[0]["rename_history"] is None


def test_streaming_rename_window_out_of_order_batches(spark, tmp_path):
    """The delete arrives in micro-batch 1, its create in micro-batch 2
    (restarted query, state carried by the checkpoint): the interval
    join still pairs them; an out-of-window create never pairs."""
    import os

    from graph_engine_spark.streaming.renames import start_streaming_rename_detection

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    os.makedirs(events_dir, exist_ok=True)

    def feed(rows):
        _event_rows(spark, rows).coalesce(1).write.mode("append").parquet(events_dir)

    def drain():
        q, sink = start_streaming_rename_detection(
            spark, events_dir, out_dir, window_seconds=2.0, available_now=True
        )
        q.awaitTermination(120)
        return sink

    # micro-batch 1: only the delete (and a far-away delete)
    feed(
        [
            ("deleted", 10.0, "old/a.py", BASE_TEXT),
            ("deleted", 100.0, "old/far.py", BASE_TEXT),
        ]
    )
    sink = drain()
    # micro-batch 2 (separate query run, same checkpoint): the matching
    # create inside the window + one outside it
    feed(
        [
            ("created", 11.0, "new/a_renamed.py", BASE_TEXT),
            ("created", 104.5, "new/too_late.py", BASE_TEXT),
        ]
    )
    sink = drain()
    got = {
        (r["old_path"], r["new_path"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {("old/a.py", "new/a_renamed.py")}


# --- dynamic call totals merged into graph state (manager.py:180-272) --


def test_merge_dynamic_calls_upsert_and_new_edge(spark):
    """An existing static calls edge is annotated in place (never
    duplicated); an unseen pair becomes a new dynamic edge; replaying a
    later running total replaces, not adds; callee nodes carry summed
    totals (reference test_dependency_graph_manager semantics)."""
    from graph_engine_spark.streaming.maintenance import merge_dynamic_calls

    src_code = (
        "def shared_func():\n    return 1\n\n"
        "def caller():\n    return shared_func()\n"
    )
    state = empty_state(spark)
    state = apply_upserts(state, corpus_df(spark, [("r", "a.py", src_code)]))
    static_edge_count = state.edges.count()
    has_call_edge = state.edges.filter(
        (F.col("src") == "function:caller")
        & (F.col("dst") == "function:shared_func")
        & (F.col("edge_type") == "calls")
    )
    assert has_call_edge.count() == 1

    totals = spark.createDataFrame(
        [
            ("function:caller", "function:shared_func", 2, 10.0, 12.0),
            ("function:ghost", "function:shared_func", 5, 11.0, 15.0),  # unseen pair
        ],
        "src string, dst string, dynamic_call_count long, "
        "first_call_time double, last_call_time double",
    )
    merged = merge_dynamic_calls(state, totals)
    # existing edge annotated in place — total edge rows grew by exactly
    # the one brand-new dynamic edge
    assert merged.edges.count() == static_edge_count + 1
    updated = merged.edges.filter(
        (F.col("src") == "function:caller") & (F.col("edge_type") == "calls")
    ).collect()
    assert len(updated) == 1
    assert updated[0]["dynamic"] is True
    assert updated[0]["dynamic_call_count"] == 2
    assert updated[0]["first_call_time"] == 10.0 and updated[0]["last_call_time"] == 12.0
    # static provenance preserved on the annotated edge
    assert updated[0]["path"] == "a.py"
    fresh = merged.edges.filter(F.col("src") == "function:ghost").collect()
    assert len(fresh) == 1
    assert fresh[0]["dynamic"] is True and fresh[0]["dynamic_call_count"] == 5
    assert fresh[0]["path"] is None  # dynamic edges carry no provenance
    # callee node totals: 2 + 5 incoming dynamic calls
    callee = merged.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert callee[0]["dynamic_call_count"] == 7

    # replay with a LATER running total: replace, never add
    totals2 = spark.createDataFrame(
        [("function:caller", "function:shared_func", 4, 9.0, 20.0)],
        "src string, dst string, dynamic_call_count long, "
        "first_call_time double, last_call_time double",
    )
    merged2 = merge_dynamic_calls(merged, totals2)
    again = merged2.edges.filter(
        (F.col("src") == "function:caller") & (F.col("edge_type") == "calls")
    ).collect()
    assert len(again) == 1
    assert again[0]["dynamic_call_count"] == 4
    assert again[0]["first_call_time"] == 9.0 and again[0]["last_call_time"] == 20.0
    # the ghost edge from the earlier merge persists untouched
    assert merged2.edges.filter(F.col("src") == "function:ghost").count() == 1
    # callee node total after a PARTIAL batch: recomputed from the merged
    # edges (4 from caller + 5 carried on the quiet ghost edge), not
    # overwritten by the batch-only sum (which would lose ghost's 5)
    callee2 = merged2.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert callee2[0]["dynamic_call_count"] == 9

    # self-healing across an upsert: apply_upserts re-aligns node columns
    # (dropping dynamic totals), and the next merge — even an EMPTY
    # totals batch — restores them from the carried edge totals
    state3 = apply_upserts(
        merged2, corpus_df(spark, [("r", "b.py", "def other():\n    return 2\n")])
    )
    empty_totals = totals2.limit(0)
    merged3 = merge_dynamic_calls(state3, empty_totals)
    callee3 = merged3.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert callee3[0]["dynamic_call_count"] == 9


def test_unchanged_hashes_table_is_linked_not_rewritten(spark, tmp_path):
    """The dynamic-call merge leaves file_hashes untouched, so its
    persist must commit the table by linking the previous version's
    parquet files (metadata-only commit) — verified by inode equality —
    while an upsert (which rebuilds the hash table) must write fresh
    files. Content must be identical either way."""
    import os

    from graph_engine_spark.streaming.maintenance import (
        merge_dynamic_calls,
        persist_state_version,
    )

    sdir = str(tmp_path / "state")
    state = persist_state_version(
        spark,
        apply_upserts(empty_state(spark), corpus_df(spark, [("r", "a.py", FILE_A_V1)])),
        sdir,
        0,
    )
    assert state.sources["hashes"].endswith("v000000/hashes")

    totals = spark.createDataFrame(
        [("function:x", "function:y", 1, 1.0, 2.0)],
        "src string, dst string, dynamic_call_count long, "
        "first_call_time double, last_call_time double",
    )
    merged = merge_dynamic_calls(state, totals)
    assert set(merged.sources) == {"hashes"}
    state = persist_state_version(spark, merged, sdir, 1)

    def inodes(sub, v):
        d = f"{sdir}/v{v:06d}/{sub}"
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    assert inodes("hashes", 1) == inodes("hashes", 0)  # linked, not rewritten
    assert state.file_hashes.count() == 1

    # an upsert rebuilds the hash table: the next persist writes fresh files
    state = persist_state_version(
        spark,
        apply_upserts(state, corpus_df(spark, [("r", "a.py", FILE_A_V2)])),
        sdir,
        2,
    )
    assert not set(inodes("hashes", 2).values()) & set(inodes("hashes", 1).values())
    assert [r["path"] for r in state.file_hashes.collect()] == ["a.py"]


def test_apply_deletes_large_batch_stays_distributed(spark):
    """A wide delete batch (hundreds of paths at once) resolves
    correctly through the explode→anti-join→re-aggregate path, and the
    delete plan contains no driver-side collected literal array."""
    files = [(f"f{i:03d}.py", FILE_A_V1) for i in range(60)]
    shared = [("keep.py", FILE_B)]
    state = empty_state(spark)
    state = apply_upserts(state, corpus_df(spark, [("r", p, c) for p, c in files + shared]))
    # delete every f*.py in one batch; keep.py survives
    batch = spark.createDataFrame([(p,) for p, _ in files], ["path"])
    state2 = apply_deletes(state, batch)
    assert state2.nodes.filter(F.col("path").startswith("f")).count() == 0
    shared_node = state2.nodes.filter(F.col("id") == "function:shared_func").collect()
    assert len(shared_node) == 1 and shared_node[0]["files"] == ["keep.py"]
    assert state2.file_hashes.count() == 1
    # no LocalRelation of literal paths / no array_except literal in plan
    plan = state2.nodes._sc._jvm.PythonSQLUtils.explainString(
        state2.nodes._jdf.queryExecution(), "simple"
    )
    assert "array_except" not in plan


def test_upsert_preserves_rename_history(spark):
    """An upsert — even to an unrelated file — must not wipe the rename
    audit trail on surviving nodes: the reference keeps
    node['rename_history'] across updates (manager.py:499-507), and
    merge_nodes now carries the column through the per-id re-merge."""
    import datetime

    from graph_engine_spark.streaming.renames import apply_renames

    state = empty_state(spark)
    state = apply_upserts(state, corpus_df(spark, [("r", "a.py", FILE_A_V1)]))
    t1 = datetime.datetime(2026, 8, 17, 12, 0, 0)
    r1 = spark.createDataFrame(
        [("a.py", "renamed.py", 1.0, t1)],
        ["old_path", "new_path", "similarity", "new_ts"],
    )
    state = apply_renames(state, r1)
    # an unrelated file arrives in the next micro-batch
    state = apply_upserts(state, corpus_df(spark, [("r", "b.py", FILE_B)]))

    # every surviving a.py-lineage node still carries its history —
    # including function:shared_func, which the upsert re-merged with a
    # freshly extracted (history-less) b.py row
    kept = state.nodes.filter(F.array_contains("files", "renamed.py")).collect()
    assert kept
    for row in kept:
        hist = row["rename_history"]
        assert hist is not None, f"history wiped on {row['id']}"
        assert [(h["old_path"], h["new_path"]) for h in hist] == [
            ("a.py", "renamed.py")
        ]
    shared = state.nodes.filter(F.col("id") == "function:shared_func").collect()[0]
    assert sorted(shared["files"]) == ["b.py", "renamed.py"]
    assert shared["rename_history"] is not None
    # freshly inserted b.py-only nodes carry none
    b = state.nodes.filter(F.col("id") == "module:b.py").collect()
    assert b and b[0]["rename_history"] is None


def test_microbatch_cache_is_released(spark, tmp_path):
    """Round-3 VERDICT finding #2: the session CacheManager must stay
    FLAT across micro-batches — apply_upserts persists the IR and the
    three state frames, and persist_state_version must unpersist all of
    them once the state is re-rooted on Parquet."""
    from graph_engine_spark.streaming.maintenance import persist_state_version

    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    baseline = cache_mgr.cachedData().size()
    state = empty_state(spark)
    batches = [("a.py", FILE_A_V1), ("b.py", FILE_B), ("a.py", FILE_A_V2)]
    for i, (p, c) in enumerate(batches):
        new_state = apply_upserts(state, corpus_df(spark, [("r", p, c)]))
        assert cache_mgr.cachedData().size() > baseline  # frames live in-batch
        state = persist_state_version(spark, new_state, str(tmp_path), i)
        assert cache_mgr.cachedData().size() == baseline, f"leak after batch {i}"
    # the re-rooted state is still correct
    ids = {r["id"] for r in state.nodes.collect()}
    assert "function:extra" in ids and "import:sys" in ids
