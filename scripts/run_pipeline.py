"""Cluster entry point — the north rule's `spark-submit --py-files` job.

    spark-submit --py-files graph_engine_spark.zip scripts/run_pipeline.py \
        --corpus /path/to/iceberg_or_parquet_corpus \
        --output /path/to/out --algo pagerank \
        --checkpoint-dir /path/to/ckpt --checkpoint-every 5 [--resume] \
        --num-partitions 2048 --salt-buckets 8

Reads the corpus table (repo, path, commit, lang, content), extracts the
deduplicated (src, dst, edge_type) edge table with the vectorized
extractor, builds the module link graph, runs the requested iterative
algorithm, and writes results + a metrics JSON. With no --corpus it
synthesizes the deterministic benchmark corpus (--n-files), so the same
script is the scaling-bench payload on a real cluster.

On a cluster, omit --master (inherit from spark-submit); locally the
session helper builds local[N]. num_partitions should be ~2-3x total
executor cores; checkpointing writes per-partition lineage manifests so
a killed run resumes mid-iteration (--resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="corpus table path (parquet/iceberg); else synthesize")
    ap.add_argument("--n-files", type=int, default=20000, help="synthetic corpus size")
    ap.add_argument("--imports-per-file", type=int, default=3)
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "cc", "lpa", "triangles", "all"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--salt-buckets", type=int, default=0)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    ap.add_argument(
        "--edge-buckets",
        type=int,
        default=64,
        help="bucket count for the materialized edge table (frozen per "
        "table; ~2-3x total cores at cluster scale). 0 = plain parquet.",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from graph_engine_spark.extractor import extract_graph
    from graph_engine_spark.graph.checkpoint import CheckpointManager
    from graph_engine_spark.graph.linkgraph import module_link_graph

    active = SparkSession.getActiveSession()
    if active is not None:  # launched via spark-submit with its own conf
        spark = active
    else:
        from graph_engine_spark.session import get_spark

        spark = get_spark(app_name="graph-engine-pipeline", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        from graph_engine_spark.corpus import synthesize_corpus

        corpus = synthesize_corpus(
            spark, n_files=args.n_files, imports_per_file=args.imports_per_file
        )
    # single-pass flow: edges is consumed once (the durable write below)
    # and nodes not at all, so skip extract_graph's IR+edges caches
    nodes, edges = extract_graph(corpus, persist_ir=False)
    # The north rule's materialization step: the deduplicated
    # (src, dst, edge_type) edge table, written ONCE clustered by src
    # (storage/edgetable.py; Iceberg bucket(N, src) in deployment) so
    # every later job over this snapshot reads it pre-partitioned.
    if args.edge_buckets > 0:
        from graph_engine_spark.storage.edgetable import (
            read_edge_table,
            write_edge_table,
        )

        write_edge_table(
            edges, "edge_table", f"{args.output}/edges", buckets=args.edge_buckets
        )
        edges = read_edge_table(spark, "edge_table")
    else:
        edges.write.mode("overwrite").parquet(f"{args.output}/edges")
        edges = spark.read.parquet(f"{args.output}/edges")
    mg = module_link_graph(edges).persist()
    n_edges = mg.count()
    metrics: dict = {
        "setup_sec": round(time.time() - t0, 2),
        "link_edges": n_edges,
        "algo": args.algo,
    }

    ckpt = (
        CheckpointManager(args.checkpoint_dir, every_k=args.checkpoint_every)
        if args.checkpoint_dir
        else None
    )

    def run_pagerank():
        from graph_engine_spark.graph.pagerank import pagerank

        t = time.time()
        res = pagerank(
            mg,
            tol=args.tol,
            max_iter=args.max_iter,
            num_partitions=args.num_partitions,
            salt_buckets=args.salt_buckets,
            checkpoint=ckpt,
            resume=args.resume,
        )
        sec = time.time() - t
        res.ranks.write.mode("overwrite").parquet(f"{args.output}/ranks")
        metrics.update(
            pagerank_sec=round(sec, 2),
            supersteps=res.iterations,
            converged=res.converged,
            delta=res.delta,
            supersteps_per_sec=round(res.iterations / sec, 4) if sec else None,
            edges_per_sec=round(n_edges * res.iterations / sec, 1) if sec else None,
        )

    def run_cc():
        from graph_engine_spark.graph.components import connected_components

        t = time.time()
        res = connected_components(mg, num_partitions=args.num_partitions)
        res.components.write.mode("overwrite").parquet(f"{args.output}/components")
        metrics.update(cc_sec=round(time.time() - t, 2), cc_iterations=res.iterations)

    def run_lpa():
        from graph_engine_spark.graph.lpa import label_propagation

        t = time.time()
        res = label_propagation(
            mg, max_iter=args.max_iter, num_partitions=args.num_partitions
        )
        res.labels.write.mode("overwrite").parquet(f"{args.output}/labels")
        metrics.update(lpa_sec=round(time.time() - t, 2), lpa_iterations=res.iterations)

    def run_triangles():
        from graph_engine_spark.graph.triangles import triangle_count

        t = time.time()
        res = triangle_count(mg)
        res.per_vertex.write.mode("overwrite").parquet(f"{args.output}/triangles")
        metrics.update(triangles_sec=round(time.time() - t, 2), triangles=res.total)

    dispatch = {
        "pagerank": [run_pagerank],
        "cc": [run_cc],
        "lpa": [run_lpa],
        "triangles": [run_triangles],
        "all": [run_pagerank, run_cc, run_lpa, run_triangles],
    }
    for fn in dispatch[args.algo]:
        fn()

    with open(f"{args.output}/metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
