"""Benchmark harness — prints ONE JSON line for the driver.

Headline: the north-rule pipeline — synthesize corpus → extract edges
(vectorized UDF) → dedupe → PageRank to 1e-6 on the module link graph —
plus CC / LPA / triangle supersteps and representative operator queries
over $SPARK_GRAFT_SF_DIR. Reported figures include supersteps/sec and
edges-processed/sec (BASELINE.md §2). Scaling-efficiency evidence
across two parallelism levels is produced by scripts/scaling_bench.py
(separate sessions needed for different local[N] masters).

HOST-VALIDITY GATING (round-2 lesson: BENCH_r02.json was taken in a
throttled host window and recorded 5-60× phantom regressions): the
whole bench is bracketed by single-threaded CPU probes (start / after
the pipeline / end). If the probes disagree beyond PROBE_TOLERANCE the
host's deliverable CPU changed mid-run — the numbers measure the host,
not the engine — and the entire bench is re-run (up to MAX_ATTEMPTS).
Operator queries additionally report the MEDIAN of 3 repetitions. The
emitted JSON carries the probe evidence and `window.accepted`; a
rejected final attempt is published only with accepted=false so the
record can never silently masquerade as a valid measurement.
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


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def cpu_probe(seconds: float = 3.0) -> float:
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


def run_pipeline(spark) -> tuple[dict, dict]:
    """North-rule pipeline over the synthetic corpus: one pass per
    attempt (the expensive section; validity comes from the probe
    bracket, repetition comes from re-attempts on rejection)."""
    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.graph.linkgraph import function_call_graph, module_link_graph
    from graph_engine_spark.graph.pagerank import pagerank
    from graph_engine_spark.graph.components import connected_components
    from graph_engine_spark.graph.lpa import label_propagation
    from graph_engine_spark.graph.triangles import triangle_count
    from graph_engine_spark.graph.checkpoint import CheckpointManager

    queries: dict[str, float] = {}
    corpus = synthesize_corpus(spark, n_files=N_FILES, n_components=5, hubs_per_component=4)

    def _extract():
        nodes, edges = extract_graph(corpus)
        return nodes.count(), edges.count(), nodes, edges

    t_extract, (n_nodes, n_edges, nodes_df, edges) = timed(_extract)
    queries["extract_graph"] = round(t_extract, 3)

    t_mg, mg = timed(lambda: module_link_graph(edges).persist())
    n_link_edges = mg.count()
    queries["module_link_graph"] = round(t_mg, 3)

    t_cg, cg = timed(lambda: function_call_graph(edges, nodes_df).persist())
    n_call_edges = cg.count()
    queries["function_call_graph"] = round(t_cg, 3)
    cg.unpersist()

    t_pr, pr = timed(lambda: pagerank(mg, tol=1e-6, max_iter=200))
    queries["pagerank_to_1e6"] = round(t_pr, 3)

    # salting evidence: same 6 supersteps with and without degree-
    # TARGETED hub salting on the skewed corpus (hub modules take ~half
    # of all imports; threshold 200 puts exactly the hub modules on the
    # two-stage path and every other key on the single-stage agg)
    t_salt6, _ = timed(
        lambda: pagerank(mg, tol=-1.0, max_iter=6, salt_buckets=8, salt_degree_threshold=200)
    )
    t_plain6, _ = timed(lambda: pagerank(mg, tol=-1.0, max_iter=6))

    # durable-checkpoint evidence at bench scale (north rule: resumable
    # with per-partition lineage): the same 6 supersteps writing a
    # Parquet checkpoint + manifest every 5 — the delta vs t_plain6 is
    # the per-superstep durability overhead on THIS graph, not the 6k-
    # edge pytest graph
    import tempfile

    with tempfile.TemporaryDirectory(prefix="bench_ck_") as ckdir:
        ck = CheckpointManager(ckdir, every_k=5, keep_last=1)
        t_ck6, _ = timed(lambda: pagerank(mg, tol=-1.0, max_iter=6, checkpoint=ck))

    t_cc, cc = timed(lambda: connected_components(mg))
    cc.components.count()
    queries["connected_components"] = round(t_cc, 3)

    t_lpa, lpa = timed(lambda: label_propagation(mg, max_iter=5))
    lpa.labels.count()
    queries["label_propagation_5it"] = round(t_lpa, 3)

    t_tri, tri = timed(lambda: triangle_count(mg))
    queries["triangle_count"] = round(t_tri, 3)
    mg.unpersist()  # last consumer of the link graph (leak fix, ADVICE r2)

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
        "cc_iterations": cc.iterations,
        "triangles": tri.total,
        "salted_6steps_sec": round(t_salt6, 3),
        "unsalted_6steps_sec": round(t_plain6, 3),
        "checkpointed_6steps_sec": round(t_ck6, 3),
        "checkpoint_overhead_per_superstep_sec": round((t_ck6 - t_plain6) / 6, 3),
    }
    return queries, detail


def run_operator_queries(spark, reps: int = QUERY_REPS) -> dict[str, float]:
    """Operator queries over the driver tables: median of `reps`
    end-to-end (plan + execute + collect) runs per query."""
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
        t2, _ = timed(df.collect)
        return t + t2

    out: dict[str, float] = {}
    for name in (*OPERATOR_QUERIES, "minhash_lsh_xxhash64", "winnowing", "winnowing_1mb_doc"):
        out[name] = round(statistics.median(one_rep(name) for _ in range(reps)), 3)
    return out


def main() -> None:
    from graph_engine_spark.session import get_spark

    spark = get_spark(app_name="graph-engine-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    attempts_log = []
    chosen = None
    for attempt in range(1, MAX_ATTEMPTS + 1):
        p0 = cpu_probe()
        pipeline_q, detail = run_pipeline(spark)
        p1 = cpu_probe()
        op_q = run_operator_queries(spark)
        p2 = cpu_probe()
        probes = [p0, p1, p2]
        shift = (max(probes) - min(probes)) / max(min(probes), 1.0)
        accepted = shift <= PROBE_TOLERANCE
        attempts_log.append(
            {
                "attempt": attempt,
                "cpu_probes": [round(p, 0) for p in probes],
                "probe_shift": round(shift, 4),
                "accepted": accepted,
            }
        )
        chosen = (pipeline_q, op_q, detail, accepted)
        if accepted:
            break

    pipeline_q, op_q, detail, accepted = chosen
    queries = {**pipeline_q, **op_q}
    total = round(sum(queries.values()), 3)
    result = {
        "metric": "e2e_link_graph_pipeline_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "detail": detail,
        "window": {
            "accepted": accepted,
            "probe_tolerance": PROBE_TOLERANCE,
            "operator_query_reps": QUERY_REPS,
            "attempts": attempts_log,
            "note": (
                "accepted=false means every attempt's CPU probes "
                "disagreed beyond tolerance — the host was reallocating "
                "CPU mid-run and these times are an upper bound, not a "
                "measurement"
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
