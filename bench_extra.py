"""Round-6 optimization profiling harness (guide §1) — NOT the driver
bench. bench.py stays frozen; this file exists to isolate stages with
the noop sink, break composite stages into sub-phases, and capture
formatted plans, so that OPTIMIZATION_r06.md's claims are reproducible.

Usage: python bench_extra.py <target> [...]
Targets: pipeline_setup streaming sssp bfs cc lpa lpa_enc pagerank
         triangles minhash lang_id ops
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "20000"))


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s", flush=True)
    return dt, out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def job_count(spark):
    tracker = spark.sparkContext.statusTracker()
    return len(tracker.getJobIdsForGroup(None) or [])


class JobCounter:
    """Count Spark jobs submitted between enter and exit."""

    def __init__(self, spark):
        self.sc = spark.sparkContext

    def __enter__(self):
        self._ids0 = set(self.sc.statusTracker().getJobIdsForGroup(None) or [])
        self._t0 = time.time()
        return self

    def __exit__(self, *a):
        ids1 = set(self.sc.statusTracker().getJobIdsForGroup(None) or [])
        self.jobs = len(ids1 - self._ids0)
        self.secs = time.time() - self._t0


def build_link_graph(spark):
    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.graph.linkgraph import module_link_graph

    corpus = synthesize_corpus(spark, n_files=N_FILES, n_components=5, hubs_per_component=4)
    nodes, edges = extract_graph(corpus)
    mg = module_link_graph(edges).persist()
    mg.count()
    return corpus, nodes, edges, mg


def profile_streaming(spark):
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.streaming.maintenance import (
        apply_upserts,
        empty_state,
        merge_dynamic_calls,
        persist_state_version,
    )
    import tempfile

    corpus = synthesize_corpus(spark, n_files=N_FILES, n_components=5, hubs_per_component=4)
    c = corpus.persist(StorageLevel.MEMORY_AND_DISK)
    bucket = F.pmod(F.xxhash64("path"), F.lit(8))
    total = time.time()
    with tempfile.TemporaryDirectory(prefix="prof_stream_") as sdir:
        base = c.filter(bucket < 4)
        timed("base.count", base.count)
        with JobCounter(spark) as jc:
            state = persist_state_version(
                spark, apply_upserts(empty_state(spark), base), sdir, 0
            )
        print(f"  batch0 upsert+persist: {jc.secs:.3f}s jobs={jc.jobs}")
        for i in (1, 2, 3):
            batch = (
                c.filter(bucket == i - 1)
                .withColumn("content", F.concat("content", F.lit(f"\n# touched {i}\n")))
                .unionByName(c.filter(bucket == 3))
            )
            timed(f"batch{i}.count", batch.count)
            with JobCounter(spark) as jc:
                st2 = apply_upserts(state, batch)
            with JobCounter(spark) as jc2:
                state = persist_state_version(spark, st2, sdir, i)
            print(
                f"  batch{i} upsert: {jc.secs:.3f}s jobs={jc.jobs}; "
                f"persist: {jc2.secs:.3f}s jobs={jc2.jobs}"
            )
            totals = state.edges.filter(F.col("edge_type") == "calls").limit(500).select(
                "src", "dst",
                F.lit(i * 3).alias("dynamic_call_count"),
                F.lit(1.0).alias("first_call_time"),
                F.lit(float(i)).alias("last_call_time"),
            )
            with JobCounter(spark) as jc:
                st3 = merge_dynamic_calls(state, totals)
            with JobCounter(spark) as jc2:
                state = persist_state_version(spark, st3, sdir, 100 + i)
            print(
                f"  batch{i} merge: {jc.secs:.3f}s jobs={jc.jobs}; "
                f"persist: {jc2.secs:.3f}s jobs={jc2.jobs}"
            )
        # file counts of last version
        import glob

        for sub in ("nodes", "edges", "hashes"):
            files = glob.glob(f"{sdir}/v000103/{sub}/*.parquet")
            print(f"  v103/{sub}: {len(files)} parquet files")
    print(f"  TOTAL: {time.time() - total:.3f}s")
    c.unpersist()


def profile_graph(spark, which):
    from pyspark.sql import functions as F

    _, nodes, edges, mg = build_link_graph(spark)
    seeds = [
        r["id"]
        for r in mg.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), "id")
        .limit(2)
        .collect()
    ]
    if which in ("sssp", "all"):
        from graph_engine_spark.graph.traversal import sssp

        wmg = mg.withColumn(
            "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(7)) + 1).cast("double")
        )
        with JobCounter(spark) as jc:
            r = sssp(wmg, seeds, weight_col="w", max_rounds=6)
            n = r.distances.count()
        print(f"  sssp_6rounds: {jc.secs:.3f}s jobs={jc.jobs} reached={n} "
              f"rounds={r.rounds} round_secs={[round(t,2) for t in r.round_seconds]}")
        r.release()
    if which in ("bfs", "all"):
        from graph_engine_spark.graph.traversal import bfs_k_hops

        with JobCounter(spark) as jc:
            r = bfs_k_hops(mg, seeds, max_hops=3)
            n = r.distances.count()
        print(f"  bfs_3hops: {jc.secs:.3f}s jobs={jc.jobs} reached={n} "
              f"round_secs={[round(t,2) for t in r.round_seconds]}")
        r.release()
    if which in ("cc", "all"):
        from graph_engine_spark.graph.components import connected_components

        with JobCounter(spark) as jc:
            r = connected_components(mg)
            n = r.components.count()
        print(f"  cc: {jc.secs:.3f}s jobs={jc.jobs} iters={r.iterations} "
              f"rows={n} round_secs={[round(t,2) for t in r.round_seconds]}")
        r.release()
    if which in ("lpa", "all"):
        from graph_engine_spark.graph.lpa import label_propagation

        with JobCounter(spark) as jc:
            r = label_propagation(mg, max_iter=5)
            n = r.labels.count()
        print(f"  lpa_5it: {jc.secs:.3f}s jobs={jc.jobs} "
              f"round_secs={[round(t,2) for t in r.round_seconds]}")
        r.release()
    if which in ("lpa_enc", "all"):
        from graph_engine_spark.graph.lpa import label_propagation

        with JobCounter(spark) as jc:
            r = label_propagation(mg, max_iter=5, encode_ids=True)
            n = r.labels.count()
        print(f"  lpa_encoded_5it: {jc.secs:.3f}s jobs={jc.jobs} "
              f"round_secs={[round(t,2) for t in r.round_seconds]}")
        r.release()
    if which in ("pagerank", "all"):
        from graph_engine_spark.graph.pagerank import pagerank

        with JobCounter(spark) as jc:
            r = pagerank(mg, tol=1e-6, max_iter=200)
            r.release()
        print(f"  pagerank_to_1e6: {jc.secs:.3f}s jobs={jc.jobs} iters={r.iterations} "
              f"step_secs={[round(t,2) for t in r.superstep_seconds]}")
    if which in ("triangles", "all"):
        from graph_engine_spark.graph.triangles import triangle_count

        with JobCounter(spark) as jc:
            r = triangle_count(mg)
            r.release()
        print(f"  triangle_count: {jc.secs:.3f}s jobs={jc.jobs} total={r.total}")
    if which in ("kcore", "all"):
        from graph_engine_spark.graph.traversal import k_core

        with JobCounter(spark) as jc:
            r = k_core(mg, k=3)
            n = r.vertices.count()
            r.release()
        print(f"  k_core3: {jc.secs:.3f}s jobs={jc.jobs} verts={n}")
    if which in ("linkgraph", "all"):
        from graph_engine_spark.graph.linkgraph import function_call_graph, module_link_graph

        with JobCounter(spark) as jc:
            mg2 = module_link_graph(edges)
            n = mg2.count()
        print(f"  module_link_graph(recount): {jc.secs:.3f}s jobs={jc.jobs} rows={n}")
        with JobCounter(spark) as jc:
            cg = function_call_graph(edges, nodes)
            n = cg.count()
        print(f"  function_call_graph: {jc.secs:.3f}s jobs={jc.jobs} rows={n}")
    mg.unpersist()


def profile_ops(spark, names):
    from pyspark.sql import functions as F
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    for name in names:
        with JobCounter(spark) as jc:
            df = q[name](spark, SF_DIR)
            n = len(df.collect())
        print(f"  {name}: {jc.secs:.3f}s jobs={jc.jobs} rows={n}")


def main():
    targets = sys.argv[1:] or ["all"]
    from graph_engine_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    for t in targets:
        print(f"== {t} ==", flush=True)
        spark.sparkContext.setJobDescription(f"profile:{t}")
        if t == "streaming":
            profile_streaming(spark)
        elif t in ("sssp", "bfs", "cc", "lpa", "lpa_enc", "pagerank", "triangles",
                   "kcore", "linkgraph", "all"):
            profile_graph(spark, t)
        elif t.startswith("op:"):
            profile_ops(spark, t[3:].split(","))
        else:
            print(f"  unknown target {t}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
