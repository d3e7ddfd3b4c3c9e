"""Benchmark harness — prints ONE JSON line for the driver.

Headline: the north-rule pipeline — synthesize corpus → extract edges
(vectorized UDF) → dedupe → PageRank to 1e-6 on the module link graph —
plus CC / LPA / triangle supersteps and representative operator queries
over $SPARK_GRAFT_SF_DIR. Reported figures include supersteps/sec and
edges-processed/sec (BASELINE.md §2). Scaling-efficiency evidence
across two parallelism levels is produced by scripts/scaling_bench.py
(separate sessions needed for different local[N] masters).
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


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    from pyspark.sql import functions as F

    from graph_engine_spark.session import get_spark
    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.graph.linkgraph import module_link_graph
    from graph_engine_spark.graph.pagerank import pagerank
    from graph_engine_spark.graph.components import connected_components
    from graph_engine_spark.graph.lpa import label_propagation
    from graph_engine_spark.graph.triangles import triangle_count

    spark = get_spark(app_name="graph-engine-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    # --- north-rule pipeline over the synthetic corpus ---
    corpus = synthesize_corpus(spark, n_files=N_FILES, n_components=5, hubs_per_component=4)

    def _extract():
        nodes, edges = extract_graph(corpus)
        return nodes.count(), edges.count(), nodes, edges

    t_extract, (n_nodes, n_edges, nodes_df, edges) = timed(_extract)
    queries["extract_graph"] = round(t_extract, 3)

    t_mg, mg = timed(lambda: module_link_graph(edges).persist())
    n_link_edges = mg.count()
    queries["module_link_graph"] = round(t_mg, 3)

    from graph_engine_spark.graph.linkgraph import function_call_graph

    t_cg, cg = timed(lambda: function_call_graph(edges, nodes_df).persist())
    n_call_edges = cg.count()
    queries["function_call_graph"] = round(t_cg, 3)
    cg.unpersist()

    t_pr, pr = timed(lambda: pagerank(mg, tol=1e-6, max_iter=200))
    queries["pagerank_to_1e6"] = round(t_pr, 3)

    # salting evidence: same 6 supersteps with and without degree-TARGETED
    # hub salting on the skewed corpus (hub modules take ~half of all
    # imports; threshold 200 puts exactly the hub modules on the two-stage
    # path and every other key on the single-stage agg)
    t_salt6, _ = timed(
        lambda: pagerank(
            mg, tol=-1.0, max_iter=6, salt_buckets=8, salt_degree_threshold=200
        )
    )
    t_plain6, _ = timed(lambda: pagerank(mg, tol=-1.0, max_iter=6))

    t_cc, cc = timed(lambda: connected_components(mg))
    cc.components.count()
    queries["connected_components"] = round(t_cc, 3)

    t_lpa, lpa = timed(lambda: label_propagation(mg, max_iter=5))
    lpa.labels.count()
    queries["label_propagation_5it"] = round(t_lpa, 3)

    t_tri, tri = timed(lambda: triangle_count(mg))
    queries["triangle_count"] = round(t_tri, 3)

    # --- operator queries over the driver tables ---
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    for name in (
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
    ):
        t, df = timed(lambda name=name: q[name](spark, SF_DIR))
        t2, _ = timed(df.collect)
        queries[name] = round(t + t2, 3)

    # production-mode minhash: identical plan to the oracle-checked
    # minhash_lsh entry but xxhash64 hashing + degenerate-bucket cap —
    # the configuration a corpus-scale dedup run would use
    from graph_engine_spark.pipelines.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prod_corpus = docs.select(F.col("doc_id").alias("key"), "text").unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("key"),
            F.concat(F.col("text"), F.lit(" graft near dup tail")).alias("text"),
        )
    )
    t_mh_prod, _ = timed(
        lambda: minhash_lsh_candidates(
            prod_corpus, text_col="text", key_col="key", num_hashes=8, bands=4,
            k=5, hash_mode="xxhash64", max_bucket_size=1000,
        ).count()
    )
    queries["minhash_lsh_xxhash64"] = round(t_mh_prod, 3)

    # winnowing fingerprints: count() not collect() — the fingerprint
    # table is ~hundreds of rows per document
    from graph_engine_spark.pipelines.dedup import winnowing_fingerprints

    t_win, _ = timed(lambda: winnowing_fingerprints(docs, k=8, window=4).count())
    queries["winnowing"] = round(t_win, 3)

    total = round(sum(queries.values()), 3)
    pr_steps = pr.iterations
    result = {
        "metric": "e2e_link_graph_pipeline_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "detail": {
            "cpus": CPUS,
            "corpus_files": N_FILES,
            "extracted_nodes": n_nodes,
            "extracted_edges": n_edges,
            "link_graph_edges": n_link_edges,
            "call_graph_edges": n_call_edges,
            "pagerank_supersteps": pr_steps,
            "pagerank_converged": pr.converged,
            "pagerank_supersteps_per_sec": round(pr_steps / t_pr, 3) if t_pr else None,
            "pagerank_edges_per_sec": round(n_link_edges * pr_steps / t_pr, 1)
            if t_pr
            else None,
            "cc_iterations": cc.iterations,
            "triangles": tri.total,
            "salted_6steps_sec": round(t_salt6, 3),
            "unsalted_6steps_sec": round(t_plain6, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
