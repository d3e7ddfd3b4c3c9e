"""Benchmark harness — prints ONE JSON line for the driver.

Headline: the north-rule pipeline — synthesize corpus → extract edges
(vectorized UDF) → dedupe → PageRank to 1e-6 on the module link graph —
plus CC / LPA / triangle supersteps and representative operator queries
over $SPARK_GRAFT_SF_DIR. Reported figures include supersteps/sec and
edges-processed/sec (BASELINE.md §2). Scaling-efficiency evidence
across two parallelism levels is produced by scripts/scaling_bench.py
(separate sessions needed for different local[N] masters).

HOST-VALIDITY GATING (round-2 lesson: BENCH_r02.json was taken in a
throttled host window and recorded 5-60× phantom regressions; the
round-3 whole-run bracket then showed the host's deliverable CPU is
only stationary for ~minutes, far shorter than a full bench): every
measurement is bracketed at the FINEST useful granularity — each
pipeline stage gets its own pair of single-threaded CPU probes
(re-run up to MAX_ATTEMPTS times if the probes disagree beyond
PROBE_TOLERANCE), and each operator query is bracketed PER REP,
reporting the median of the accepted reps (round-3 fix: whole-rep-set
brackets of long queries were the most likely to straddle a wobble).

OUTPUT CONTRACT (round-3 fix): stdout carries exactly ONE compact
JSON line — metric/value/unit/queries/sf/detail/window_summary, kept
under ~1900 chars so the driver's tail capture can always parse it.
The full per-bracket probe record is written to BENCH_WINDOWS.json
next to this file. A bracket with accepted=false is an upper bound on
the engine, not a measurement of it — labeled as such in the record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "20000"))
PROBE_TOLERANCE = float(os.environ.get("SPARK_GRAFT_PROBE_TOL", "0.25"))
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
QUERY_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

OPERATOR_QUERIES = (
    "degree",
    "interval_join",
    "call_count_agg",
    "dedup_exact",
    "token_count",
    "embedding_topk",
    "two_hop",
    "minhash_lsh",
    "simhash",
    "simhash_near_dup",
    "ann_lsh_topk",
    "secret_scan",
    "lang_id",
    "window_rank_greedy",
    "edges_for_nodes",
)

# Queries whose full result set is corpus-scale (millions of rows at
# sf0.1): benched with count() — full execution, no driver collect.
LARGE_RESULT_QUERIES = {"simhash_near_dup"}


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def cpu_probe(seconds: float = 1.5) -> float:
    """Single-threaded CPU throughput probe (same loop as
    scripts/scaling_bench.py) — iterations/sec of fixed arithmetic."""
    n = 0
    x = 1.0
    t0 = time.time()
    deadline = t0 + seconds
    while time.time() < deadline:
        for _ in range(10_000):
            x = x * 1.000000119 + 1e-9
            if x > 2.0:
                x -= 1.0
        n += 10_000
    return n / (time.time() - t0)


# Parallel-speedup gate (round 4). Single-thread probes cannot see the
# host's AGGREGATE-capacity throttle: during a throttled window a
# 1-thread probe runs at full speed while 32 busy vCPUs share ~a few
# cores — both bracket probes agree and a 10×-inflated measurement gets
# "accepted" (observed: a 692 s winnowing rep with clean probes either
# side). The 8-process aggregate probe exposes it directly: clean host
# ≈ 7.7-8.3× the single-thread rate (measured linear region), throttled
# windows collapse far below. A bracket half whose parallel speedup is
# under MIN_PARALLEL_SPEEDUP rejects the window regardless of shift.
# Gate value: a full-bench sweep with the resident (idle) Spark JVM
# alongside the probes measured clean-looking halves at 5.0-10.3×
# (JVM background threads shave the aggregate), while genuinely
# throttled windows collapse to <4×; 6.0 rejected clean windows at
# 5.4-6.0 (7 of 31 brackets, all with plausible times), so 5.0.
AGG_PROCS = int(os.environ.get("SPARK_GRAFT_AGG_PROCS", "8"))
MIN_PARALLEL_SPEEDUP = float(os.environ.get("SPARK_GRAFT_MIN_SPEEDUP", "5.0"))


def parallel_speedup(seconds: float = 1.2) -> tuple[float, float]:
    """(single_iters/sec, aggregate-speedup at AGG_PROCS procs)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from scaling_bench import aggregate_capacity

    single = cpu_probe(seconds)
    agg = aggregate_capacity(AGG_PROCS, seconds)
    return single, agg / max(single, 1.0)


def bracketed(fn, max_attempts: int = MAX_ATTEMPTS, tol: float = PROBE_TOLERANCE):
    """Run fn() inside its own CPU-probe bracket; re-run (fresh
    bracket) while the probes disagree beyond tol OR either half's
    parallel speedup is below the gate, while attempts remain.
    Returns (result_of_last_attempt, window_record)."""
    out = None
    shifts = []
    speedups = []
    for attempt in range(1, max_attempts + 1):
        p0, s0 = parallel_speedup()
        out = fn()
        p1, s1 = parallel_speedup()
        shift = abs(p0 - p1) / max(min(p0, p1), 1.0)
        shifts.append(round(shift, 4))
        speedups.append([round(s0, 2), round(s1, 2)])
        record = {
            "attempts": attempt,
            "probe_shifts": shifts,
            "probe_Miters": [round(p0 / 1e6, 1), round(p1 / 1e6, 1)],
            "parallel_speedups": speedups,
        }
        if shift <= tol and min(s0, s1) >= MIN_PARALLEL_SPEEDUP:
            return out, {"accepted": True, **record}
    return out, {"accepted": False, **record}


def interleaved_overhead(name, ck_fn, plain_fn, windows, reps: int = 2) -> dict:
    """Median checkpointed-vs-plain delta from INTERLEAVED arms
    (ck, plain, ck, plain, ...), each rep probe-bracketed. Records the
    per-rep brackets under ``windows[name]``; the window counts as
    accepted only if every rep's bracket accepted. Returns per-arm
    medians plus the raw and 0-clamped overhead and a validity flag
    (VERDICT r4 #1: a negative 'overhead' is host noise, not a property
    of checkpointing — it must not be published as a measurement)."""
    arm_times: dict[str, list[float]] = {"ck": [], "plain": []}
    rep_brackets: list[dict] = []
    for _ in range(reps):
        for arm, fn in (("ck", ck_fn), ("plain", plain_fn)):
            (t, _), w = bracketed(lambda fn=fn: timed(fn), max_attempts=1)
            arm_times[arm].append(t)
            rep_brackets.append({"arm": arm, **w})
    all_accepted = all(b["accepted"] for b in rep_brackets)
    ck_med = statistics.median(arm_times["ck"])
    plain_med = statistics.median(arm_times["plain"])
    raw = ck_med - plain_med
    windows[name] = {
        "accepted": all_accepted,
        "interleaved_reps_per_arm": reps,
        "arm_times": {k: [round(t, 3) for t in v] for k, v in arm_times.items()},
        "rep_brackets": rep_brackets,
    }
    return {
        "ck_sec": ck_med,
        "plain_sec": plain_med,
        "overhead_raw_sec": round(raw, 3),
        "overhead_sec": round(max(0.0, raw), 3),
        "valid": bool(all_accepted and raw >= 0),
    }


def run_pipeline(spark) -> tuple[dict, dict, dict]:
    """North-rule pipeline over the synthetic corpus. Each stage runs
    inside its own probe bracket (windows returned per stage); a stage
    whose bracket rejects re-runs once before being published as
    rejected."""
    from pyspark.sql import functions as F

    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.graph.linkgraph import function_call_graph, module_link_graph
    from graph_engine_spark.graph.pagerank import pagerank
    from graph_engine_spark.graph.components import connected_components
    from graph_engine_spark.graph.lpa import label_propagation
    from graph_engine_spark.graph.triangles import triangle_count
    from graph_engine_spark.graph.checkpoint import CheckpointManager

    queries: dict[str, float] = {}
    windows: dict[str, dict] = {}
    corpus = synthesize_corpus(spark, n_files=N_FILES, n_components=5, hubs_per_component=4)

    def stage(name, fn, attempts=2):
        (t, out), w = bracketed(lambda: timed(fn), max_attempts=attempts)
        windows[name] = w
        return t, out

    def _extract():
        nodes, edges = extract_graph(corpus)
        return nodes.count(), edges.count(), nodes, edges

    t_extract, (n_nodes, n_edges, nodes_df, edges) = stage("extract_graph", _extract)
    queries["extract_graph"] = round(t_extract, 3)

    # attempts=1 on stages that persist and hand back live frames — a
    # bracket retry would re-persist a fresh frame and leak the first
    t_mg, mg = stage(
        "module_link_graph",
        lambda: (lambda d: (d, d.count()))(module_link_graph(edges).persist()),
        attempts=1,
    )
    mg = mg[0]
    n_link_edges = mg.count()
    queries["module_link_graph"] = round(t_mg, 3)

    t_cg, cg_pair = stage(
        "function_call_graph",
        lambda: (lambda d: (d, d.count()))(function_call_graph(edges, nodes_df).persist()),
        attempts=1,
    )
    cg, n_call_edges = cg_pair
    queries["function_call_graph"] = round(t_cg, 3)
    cg.unpersist()

    def _released(r):
        # harvest happens via plain dataclass attrs — release the result
        # frames inside the stage fn so rejected-bracket retries are
        # leak-free (same pattern as the CC/LPA stages below)
        r.release()
        return r

    t_pr, pr = stage(
        "pagerank_to_1e6", lambda: _released(pagerank(mg, tol=1e-6, max_iter=200))
    )
    queries["pagerank_to_1e6"] = round(t_pr, 3)

    # salting evidence: same 6 supersteps with and without degree-
    # TARGETED hub salting on the skewed corpus (hub modules take ~half
    # of all imports; threshold 200 puts exactly the hub modules on the
    # two-stage path and every other key on the single-stage agg)
    t_salt6, _ = stage(
        "salted_6steps",
        lambda: _released(
            pagerank(mg, tol=-1.0, max_iter=6, salt_buckets=8, salt_degree_threshold=200)
        ),
    )
    t_plain6, _ = stage(
        "unsalted_6steps", lambda: _released(pagerank(mg, tol=-1.0, max_iter=6))
    )

    # weighted-variant evidence adjacent to the unweighted baseline:
    # deterministic per-edge weight, same 6 supersteps — the delta vs
    # t_plain6 is the cost of the pre-normalized weighted adjacency
    # (build-time sum+join) since the loop shape is identical
    mg_w = mg.withColumn(
        "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(7)) + F.lit(1)).cast("double")
    )
    t_weighted6, _ = stage(
        "weighted_6steps",
        lambda: _released(pagerank(mg_w, tol=-1.0, max_iter=6, weight_col="w")),
    )

    # durable-checkpoint evidence at bench scale (north rule: resumable
    # with per-partition lineage): the same 6 supersteps writing a
    # Parquet checkpoint + manifest every 5 — the delta vs t_plain6 is
    # the per-superstep durability overhead on THIS graph, not the 6k-
    # edge pytest graph
    import tempfile

    def _ck6():
        with tempfile.TemporaryDirectory(prefix="bench_ck_") as ckdir:
            ck = CheckpointManager(ckdir, every_k=5, keep_last=1)
            return _released(pagerank(mg, tol=-1.0, max_iter=6, checkpoint=ck))

    t_ck6, _ = stage("checkpointed_6steps", _ck6)

    # CC/LPA stage fns COUNT, harvest scalars, then unpersist the result
    # frame before returning (ADVICE r4: LPA's final labels frame — and
    # any algorithm's returned state — comes back persisted; a rejected-
    # bracket retry abandoned the first attempt's result and leaked one
    # |V|-sized cache entry per retry). With the frames released inside
    # the fn, retries on a rejected bracket are leak-free.
    def _cc_run():
        r = connected_components(mg)
        n = r.components.count()
        r.release()
        return r.iterations, list(r.round_seconds), n

    t_cc, (cc_iters, cc_rounds, _) = stage("connected_components", _cc_run, attempts=2)
    queries["connected_components"] = round(t_cc, 3)

    def _lpa_run():
        r = label_propagation(mg, max_iter=5)
        n = r.labels.count()
        r.release()
        return n

    t_lpa, _ = stage("label_propagation_5it", _lpa_run, attempts=2)
    queries["label_propagation_5it"] = round(t_lpa, 3)

    # order-preserving integer coding (VERDICT r4 #4): same labels,
    # long keys in every per-superstep shuffle — the delta line shows
    # what the one-time dictionary buys back at this graph size
    def _lpa_enc_run():
        r = label_propagation(mg, max_iter=5, encode_ids=True)
        n = r.labels.count()
        r.release()
        return n

    t_lpa_enc, _ = stage("label_propagation_encoded_5it", _lpa_enc_run, attempts=2)
    queries["label_propagation_encoded_5it"] = round(t_lpa_enc, 3)

    # durable-checkpoint overhead for CC and LPA at bench scale (north
    # rule: all three loop algorithms resume from Parquet checkpoints).
    # VERDICT r4 #1: back-to-back single paired runs published NEGATIVE
    # overheads as measurements (host wobble exceeding the arms' true
    # delta). Arms are now INTERLEAVED (ck, plain, ck, plain), each rep
    # in its own probe bracket; the published overhead is the median-of-
    # arm difference, clamped at 0 with the raw value preserved, and
    # *_overhead_valid=false whenever any rep's bracket rejected or the
    # raw difference is negative (i.e. below this host's noise floor).
    def _cc_ck():
        with tempfile.TemporaryDirectory(prefix="bench_ckcc_") as ckdir:
            ck = CheckpointManager(ckdir, every_k=2, keep_last=1)
            r = connected_components(mg, checkpoint=ck)
            n = r.components.count()
            r.release()
            return n

    def _cc_plain():
        r = connected_components(mg)
        n = r.components.count()
        r.release()
        return n

    cc_oh = interleaved_overhead("cc_ck_overhead", _cc_ck, _cc_plain, windows)
    t_cc_ck, t_cc_plain2 = cc_oh["ck_sec"], cc_oh["plain_sec"]

    def _lpa_ck():
        with tempfile.TemporaryDirectory(prefix="bench_cklpa_") as ckdir:
            ck = CheckpointManager(ckdir, every_k=2, keep_last=1)
            r = label_propagation(mg, max_iter=5, checkpoint=ck)
            n = r.labels.count()
            r.release()
            return n

    def _lpa_plain():
        r = label_propagation(mg, max_iter=5)
        n = r.labels.count()
        r.release()
        return n

    lpa_oh = interleaved_overhead("lpa_ck_overhead", _lpa_ck, _lpa_plain, windows)
    t_lpa_ck = lpa_oh["ck_sec"]

    t_tri, tri = stage("triangle_count", lambda: _released(triangle_count(mg)))
    queries["triangle_count"] = round(t_tri, 3)

    # round-5 additions on the same link graph: bounded traversals
    # (graph/traversal.py) from the two highest-out-degree modules —
    # deterministic seeds — and personalized PageRank at the same fixed
    # 6 supersteps as the weighted arm (delta vs unsalted_6steps is the
    # cost of the per-vertex teleport column riding the rank table)
    from graph_engine_spark.graph.traversal import bfs_k_hops, k_core, sssp

    seeds = [
        r["id"]
        for r in mg.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), "id")
        .limit(2)
        .collect()
    ]

    def _bfs_run():
        r = bfs_k_hops(mg, seeds, max_hops=3)
        n = r.distances.count()
        r.release()
        return n

    t_bfs, n_bfs_reached = stage("bfs_3hops", _bfs_run, attempts=2)
    queries["bfs_3hops"] = round(t_bfs, 3)

    def _kcore_run():
        r = k_core(mg, k=3)
        n = r.vertices.count()
        iters = r.iterations
        r.release()
        return n, iters

    t_kc, (n_core_verts, kc_rounds) = stage("k_core3", _kcore_run, attempts=2)
    queries["k_core3"] = round(t_kc, 3)

    def _sssp_run():
        # deterministic integer weights 1..7 hashed from the edge key:
        # the "cheapest import chain" weighted generalization of the
        # bfs_3hops stage, run to a fixed round budget for a stable unit
        wmg = mg.withColumn(
            "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(7)) + 1).cast("double")
        )
        r = sssp(wmg, seeds, weight_col="w", max_rounds=6)
        n = r.distances.count()
        rounds = r.rounds
        r.release()
        return n, rounds

    t_sssp, (n_sssp_reached, sssp_rounds) = stage(
        "sssp_6rounds", _sssp_run, attempts=2
    )
    queries["sssp_6rounds"] = round(t_sssp, 3)

    t_ppr6, _ = stage(
        "personalized_6steps",
        lambda: _released(
            pagerank(mg, tol=-1.0, max_iter=6, personalization=seeds)
        ),
    )
    mg.unpersist()  # last consumer of the link graph (leak fix, ADVICE r2)

    # streaming maintenance throughput (VERDICT r4 #5): drive the exact
    # foreachBatch core (changed-only upserts + hash-skip + dynamic-call
    # merge + durable state version per batch) over synthetic file
    # events derived from the same corpus; report events/sec and that
    # the CacheManager stays flat across micro-batches (the round-4
    # leak-fix contract, now continuously measured at bench scale)
    def _stream_maint():
        import tempfile

        from pyspark.storagelevel import StorageLevel

        from graph_engine_spark.streaming.maintenance import (
            apply_upserts,
            empty_state,
            merge_dynamic_calls,
            persist_state_version,
        )

        cache_mgr = spark._jsparkSession.sharedState().cacheManager()
        cache0 = cache_mgr.cachedData().size()
        c = corpus.persist(StorageLevel.MEMORY_AND_DISK)
        bucket = F.pmod(F.xxhash64("path"), F.lit(8))
        n_events = 0
        try:
            with tempfile.TemporaryDirectory(prefix="bench_stream_") as sdir:
                base = c.filter(bucket < 4)
                n_events += base.count()
                state = persist_state_version(
                    spark, apply_upserts(empty_state(spark), base), sdir, 0
                )
                for i in (1, 2, 3):
                    # batch = first-touch modification of bucket i-1 +
                    # a resend of untouched bucket 3 (hash-skip path)
                    batch = (
                        c.filter(bucket == i - 1)
                        .withColumn(
                            "content",
                            F.concat("content", F.lit(f"\n# touched {i}\n")),
                        )
                        .unionByName(c.filter(bucket == 3))
                    )
                    n_events += batch.count()
                    state = persist_state_version(
                        spark, apply_upserts(state, batch), sdir, i
                    )
                    totals = state.edges.filter(
                        F.col("edge_type") == "calls"
                    ).limit(500).select(
                        "src",
                        "dst",
                        F.lit(i * 3).alias("dynamic_call_count"),
                        F.lit(1.0).alias("first_call_time"),
                        F.lit(float(i)).alias("last_call_time"),
                    )
                    n_events += 500
                    state = persist_state_version(
                        spark, merge_dynamic_calls(state, totals), sdir, 100 + i
                    )
        finally:
            c.unpersist()
        # measured AFTER the stage's own working persist is released:
        # any remaining entry here is a genuine per-micro-batch leak
        leak = cache_mgr.cachedData().size() - cache0
        return n_events, leak

    t_stream, (n_stream_events, stream_cache_leak) = stage(
        "streaming_maintenance", _stream_maint, attempts=2
    )
    queries["streaming_maintenance"] = round(t_stream, 3)

    detail = {
        "cpus": CPUS,
        "corpus_files": N_FILES,
        "extracted_nodes": n_nodes,
        "extracted_edges": n_edges,
        "link_graph_edges": n_link_edges,
        "call_graph_edges": n_call_edges,
        "pagerank_supersteps": pr.iterations,
        "pagerank_converged": pr.converged,
        "pagerank_supersteps_per_sec": round(pr.iterations / t_pr, 3) if t_pr else None,
        "pagerank_edges_per_sec": round(n_link_edges * pr.iterations / t_pr, 1)
        if t_pr
        else None,
        "cc_iterations": cc_iters,
        "cc_round_seconds": [round(t, 3) for t in cc_rounds],
        "cc_rounds_per_sec": round(cc_iters / sum(cc_rounds), 3)
        if cc_rounds and sum(cc_rounds) > 0
        else None,
        "triangles": tri.total,
        "bfs_reached": n_bfs_reached,
        "kcore_vertices": n_core_verts,
        "kcore_rounds": kc_rounds,
        "sssp_reached": n_sssp_reached,
        "sssp_rounds": sssp_rounds,
        "personalized_6steps_sec": round(t_ppr6, 3),
        "salted_6steps_sec": round(t_salt6, 3),
        "unsalted_6steps_sec": round(t_plain6, 3),
        "weighted_6steps_sec": round(t_weighted6, 3),
        "checkpointed_6steps_sec": round(t_ck6, 3),
        "checkpoint_overhead_per_superstep_sec": round(
            max(0.0, t_ck6 - t_plain6) / 6, 3
        ),
        "checkpoint_overhead_raw_per_superstep_sec": round((t_ck6 - t_plain6) / 6, 3),
        "cc_checkpointed_sec": round(t_cc_ck, 3),
        "cc_plain_rerun_sec": round(t_cc_plain2, 3),
        "cc_checkpoint_overhead_sec": cc_oh["overhead_sec"],
        "cc_checkpoint_overhead_raw_sec": cc_oh["overhead_raw_sec"],
        "cc_overhead_valid": cc_oh["valid"],
        "lpa_encoded_5it_sec": round(t_lpa_enc, 3),
        "lpa_encoded_delta_sec": round(t_lpa_enc - t_lpa, 3),
        "streaming_events": n_stream_events,
        "streaming_events_per_sec": round(n_stream_events / t_stream, 1)
        if t_stream
        else None,
        "streaming_cache_leak_entries": stream_cache_leak,
        "lpa_checkpointed_5it_sec": round(t_lpa_ck, 3),
        "lpa_plain_rerun_sec": round(lpa_oh["plain_sec"], 3),
        "lpa_checkpoint_overhead_sec": lpa_oh["overhead_sec"],
        "lpa_checkpoint_overhead_raw_sec": lpa_oh["overhead_raw_sec"],
        "lpa_overhead_valid": lpa_oh["valid"],
    }
    return queries, detail, windows


def run_operator_queries(spark, reps: int = QUERY_REPS) -> tuple[dict, dict]:
    """Operator queries over the driver tables: `reps` end-to-end
    (plan + execute + collect) runs per query, EACH REP inside its own
    probe bracket; the reported time is the median of the accepted
    reps. Round-3 lesson (VERDICT #3): bracketing the whole rep-set of
    a long query makes its window the most likely to straddle a host
    wobble — three rejected attempts of a 3-rep set is 9 expensive runs
    with nothing to show. Per-rep brackets are short, and one wobbled
    rep no longer rejects the query's whole measurement."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from graph_engine_spark.pipelines.dedup import (
        minhash_lsh_candidates,
        winnowing_fingerprints,
    )

    q = entrymod.queries()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prod_corpus = docs.select(F.col("doc_id").alias("key"), "text").unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("key"),
            F.concat(F.col("text"), F.lit(" graft near dup tail")).alias("text"),
        )
    )

    def one_rep(name):
        if name == "minhash_lsh_xxhash64":
            # production-mode minhash: identical plan to the oracle-
            # checked minhash_lsh entry but xxhash64 hashing +
            # degenerate-bucket cap — the corpus-scale configuration
            t, _ = timed(
                lambda: minhash_lsh_candidates(
                    prod_corpus, text_col="text", key_col="key", num_hashes=8,
                    bands=4, k=5, hash_mode="xxhash64", max_bucket_size=1000,
                ).count()
            )
            return t
        if name == "winnowing":
            t, _ = timed(lambda: winnowing_fingerprints(docs, k=8, window=4).count())
            return t
        if name == "winnowing_1mb_doc":
            # giant-document path: 8 planted ~1 MB docs — exercises the
            # position-chunked running-min (one doc spreads over ~16
            # chunk tasks instead of serializing 1M one-window rows
            # into a single task)
            big = spark.range(8).select(
                F.col("id").alias("key"),
                F.concat(
                    F.repeat(F.lit("the quick brown fox jumps over the lazy dog "), 23000),
                    F.col("id").cast("string"),
                ).alias("text"),
            )
            t, _ = timed(
                lambda: winnowing_fingerprints(
                    big, text_col="text", key_col="key", k=8, window=4
                ).count()
            )
            return t
        t, df = timed(lambda: q[name](spark, SF_DIR))
        if name in LARGE_RESULT_QUERIES:
            # count() executes the full plan (join + verify) but skips
            # driver deserialization: simhash_near_dup yields ~1.8M
            # pair rows at sf0.1 and collect() spent 287 s of a 295 s
            # "measurement" turning them into Python objects on the
            # driver — a harness artifact, not engine time (the pair
            # computation itself measures 8.6 s). A real corpus job
            # writes pairs to Parquet; it never collects them.
            t2, _ = timed(df.count)
        else:
            t2, _ = timed(df.collect)
        return t + t2

    out: dict[str, float] = {}
    windows: dict[str, dict] = {}
    for name in (*OPERATOR_QUERIES, "minhash_lsh_xxhash64", "winnowing", "winnowing_1mb_doc"):
        times: list[float] = []
        rep_brackets: list[dict] = []
        for _ in range(reps):
            t, w = bracketed(lambda name=name: one_rep(name), max_attempts=1)
            times.append(t)
            rep_brackets.append(w)
        accepted = [t for t, w in zip(times, rep_brackets) if w["accepted"]]
        out[name] = round(statistics.median(accepted if accepted else times), 3)
        windows[name] = {
            "accepted": bool(accepted),
            "reps": reps,
            "accepted_reps": len(accepted),
            "rep_times": [round(t, 3) for t in times],
            "rep_brackets": rep_brackets,
        }
    return out, windows


def main() -> None:
    from graph_engine_spark.session import get_spark

    spark = get_spark(app_name="graph-engine-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    pipeline_q, detail, pipe_windows = run_pipeline(spark)
    # SPARK_GRAFT_PIPELINE_ONLY=1: the 10×-scale (sf1) record runs the
    # north-rule pipeline alone — the operator queries read
    # $SPARK_GRAFT_SF_DIR, whose largest driver-generated instance is
    # sf0.1; scaling THEM is the corpus pipeline's job via N_FILES
    if os.environ.get("SPARK_GRAFT_PIPELINE_ONLY"):
        op_q, op_windows = {}, {}
    else:
        op_q, op_windows = run_operator_queries(spark)

    all_windows = {**pipe_windows, **op_windows}
    accepted_names = [k for k, w in all_windows.items() if w["accepted"]]
    queries = {**pipeline_q, **op_q}
    total = round(sum(queries.values()), 3)

    # Full per-bracket probe record → side file. Round-3 lesson
    # (VERDICT #1): embedding every probe bracket in the printed line
    # pushed it past the driver's ~2000-char tail capture, so BENCH_r03
    # recorded parsed:null. The printed line stays compact; the side
    # file carries the evidence.
    windows_record = {
        "probe_tolerance": PROBE_TOLERANCE,
        "operator_query_reps": QUERY_REPS,
        "accepted": len(accepted_names) == len(all_windows),
        "rejected": sorted(k for k in all_windows if k not in accepted_names),
        "pipeline": pipe_windows,
        "queries": op_windows,
        "note": (
            "each pipeline stage is probe-bracketed as a whole; each "
            "operator query is bracketed PER REP and reports the median "
            "of accepted reps (the host's deliverable CPU is only "
            "stationary for ~minutes — short per-rep windows survive "
            "wobbles that rejected whole rep-sets in rounds 2-3). An "
            "entry with accepted=false has no accepted window: its time "
            "is an upper bound on the engine, not a measurement of it."
        ),
    }
    windows_record["detail"] = detail  # full detail ALWAYS in the side file
    side_path = os.environ.get(
        "SPARK_GRAFT_WINDOWS_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_WINDOWS.json"),
    )
    with open(side_path, "w") as f:
        json.dump(windows_record, f, indent=1)

    result = {
        "metric": "e2e_link_graph_pipeline_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "detail": detail,
        "window_summary": {
            "accepted": len(accepted_names) == len(all_windows),
            "accepted_count": len(accepted_names),
            "bracket_count": len(all_windows),
            "full_record": os.path.basename(side_path),
        },
    }
    # guard on the driver's ~2000-char tail capture: shed the least
    # headline detail fields first (all survive verbatim in the side
    # file's "detail" block), dropping the whole dict only as a last
    # resort
    trim_order = (
        "bfs_reached",
        "kcore_vertices",
        "kcore_rounds",
        "sssp_reached",
        "sssp_rounds",
        "personalized_6steps_sec",
        "cc_round_seconds",
        "checkpoint_overhead_raw_per_superstep_sec",
        "cc_plain_rerun_sec",
        "lpa_plain_rerun_sec",
        "cc_checkpoint_overhead_raw_sec",
        "lpa_checkpoint_overhead_raw_sec",
        "unsalted_6steps_sec",
        "salted_6steps_sec",
        "weighted_6steps_sec",
        "checkpointed_6steps_sec",
    )
    line = json.dumps(result)
    pruned = dict(detail)
    for k in trim_order:
        if len(line) <= 1900:
            break
        pruned.pop(k, None)
        result["detail"] = pruned
        result["detail_ref"] = "BENCH_WINDOWS.json"
        line = json.dumps(result)
    if len(line) > 1900:
        result.pop("detail")
        line = json.dumps(result)
    print(line)


if __name__ == "__main__":
    main()
