"""Two-parallelism scaling evidence (BASELINE.md §3).

The north rule requires ≥0.8 throughput scaling efficiency between N
and 4N executors. No multi-executor cluster exists in the sandbox, so
per the task substitution we run the IDENTICAL job (same deterministic
corpus bytes) in two fresh Spark sessions at local[N] and local[4N] and
report PageRank supersteps/sec + edges-processed/sec at each, and
efficiency = (throughput_4N / throughput_N) / 4.

Each measurement runs in a subprocess (a JVM can't change master); the
child prints one JSON line, this parent aggregates into
BENCH_SCALING.json and a markdown section for BASELINE.md.

Usage: python scripts/scaling_bench.py [--n 8] [--files 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_DIR"])
cores = int(sys.argv[1]); n_files = int(sys.argv[2])
imports = int(sys.argv[3]); partitions = int(sys.argv[4])
from graph_engine_spark.session import get_spark
from graph_engine_spark.corpus import synthesize_corpus
from graph_engine_spark.extractor import extract_graph
from graph_engine_spark.graph.linkgraph import module_link_graph
from graph_engine_spark.graph.pagerank import pagerank

spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
# identical input bytes and identical partition count at both
# parallelism levels: only the number of concurrently executing tasks
# changes, the sandbox analogue of N vs 4N executors over one dataset.
corpus = synthesize_corpus(
    spark, n_files=n_files, n_components=5, hubs_per_component=4,
    partitions=64, imports_per_file=imports,
)
t0 = time.time()
_, edges = extract_graph(corpus)
mg = module_link_graph(edges).persist()
n_edges = mg.count()
t_setup = time.time() - t0
t0 = time.time()
res = pagerank(mg, tol=1e-6, max_iter=200, num_partitions=partitions)
t_pr = time.time() - t0
print(json.dumps({
    "cores": cores, "files": n_files, "link_edges": n_edges,
    "setup_sec": round(t_setup, 2), "pagerank_sec": round(t_pr, 2),
    "supersteps": res.iterations, "converged": res.converged,
    "supersteps_per_sec": round(res.iterations / t_pr, 4),
    "edges_per_sec": round(n_edges * res.iterations / t_pr, 1),
}))
"""


def run(cores: int, files: int, args_imports: int, args_partitions: int) -> dict:
    env = dict(os.environ, REPO_DIR=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(files), str(args_imports), str(args_partitions)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism (large = 4n)")
    ap.add_argument("--files", type=int, default=150000)
    ap.add_argument("--imports", type=int, default=40,
                    help="imports per file (graph density; compute-bound supersteps)")
    ap.add_argument("--partitions", type=int, default=32,
                    help="fixed loop partition count at BOTH levels")
    ap.add_argument("--repeats", type=int, default=2,
                    help="alternating repeats per level; best-of taken "
                    "(the sandbox host's CPU allocation fluctuates >3x "
                    "between minutes — observed on identical runs — so a "
                    "single-shot ratio measures the host, not the engine)")
    args = ap.parse_args()

    smalls, larges = [], []
    for _ in range(args.repeats):
        smalls.append(run(args.n, args.files, args.imports, args.partitions))
        larges.append(run(args.n * 4, args.files, args.imports, args.partitions))
    small = max(smalls, key=lambda r: r["edges_per_sec"])
    large = max(larges, key=lambda r: r["edges_per_sec"])
    eff = (large["edges_per_sec"] / small["edges_per_sec"]) / 4
    report = {
        "files": args.files,
        "imports_per_file": args.imports,
        "loop_partitions": args.partitions,
        "repeats": args.repeats,
        "n_cores": small,
        "four_n_cores": large,
        "all_runs": {"n": smalls, "four_n": larges},
        "scaling_efficiency": round(eff, 4),
        "target": 0.8,
        "note": "best-of per level over alternating repeats; local[N] vs "
        "local[4N] on identical deterministic input, per sandbox "
        "substitution for the two-cluster criterion",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
