"""Two-parallelism scaling evidence (BASELINE.md §3).

The north rule requires ≥0.8 throughput scaling efficiency between N
and 4N executors. No multi-executor cluster exists in the sandbox, so
per the task substitution we run the IDENTICAL job (same deterministic
corpus bytes) in two fresh Spark sessions at local[N] and local[4N] and
report PageRank supersteps/sec + edges-processed/sec at each, and
efficiency = (throughput_4N / throughput_N) / 4.

Each measurement runs in a subprocess (a JVM can't change master); the
child prints one JSON line. The parent forms PAIRED HOST WINDOWS — the
two levels run back-to-back, alternating order, one efficiency ratio
per window, mean of ratios as the headline — and regenerates
BENCH_SCALING.json in exactly that structure (the committed JSON is
always reproducible by this script).

Usage: python scripts/scaling_bench.py [--n 8] [--files 120000] [--windows 3]
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


def cpu_probe(seconds: float = 3.0) -> float:
    """Single-threaded CPU throughput probe (iterations/sec of a fixed
    arithmetic loop). Run immediately before each child: if the host's
    deliverable CPU shifts between the two halves of a window, the
    probes disagree and the window is rejected — the programmatic form
    of the round-1 host-variance screening."""
    import time as _t

    n = 0
    x = 1.0
    t0 = _t.time()
    deadline = t0 + seconds
    while _t.time() < deadline:
        for _ in range(10_000):
            x = x * 1.000000119 + 1e-9
            if x > 2.0:
                x -= 1.0
        n += 10_000
    return n / (_t.time() - t0)


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
    ap.add_argument("--windows", type=int, default=3,
                    help="paired host windows: each window runs the small "
                    "and large level back-to-back and yields ONE "
                    "efficiency ratio. The sandbox host's CPU allocation "
                    "fluctuates >3x between minutes, so only ADJACENT "
                    "same-window pairs are comparable; cross-window "
                    "ratios measure the host, not the engine, and are "
                    "never formed. Run order alternates per window to "
                    "cancel order bias.")
    ap.add_argument("--probe-tolerance", type=float, default=0.25,
                    help="max relative disagreement between the CPU "
                    "probes taken before each half of a window; a larger "
                    "shift means the host's deliverable CPU changed "
                    "mid-window and the window is recorded but REJECTED "
                    "from the headline mean")
    args = ap.parse_args()

    import time as _time

    windows = []
    for w in range(args.windows):
        small_first = w % 2 == 0
        t_start = _time.time()
        if small_first:
            probe1 = cpu_probe()
            small = run(args.n, args.files, args.imports, args.partitions)
            probe2 = cpu_probe()
            large = run(args.n * 4, args.files, args.imports, args.partitions)
        else:
            probe1 = cpu_probe()
            large = run(args.n * 4, args.files, args.imports, args.partitions)
            probe2 = cpu_probe()
            small = run(args.n, args.files, args.imports, args.partitions)
        probe_shift = abs(probe1 - probe2) / max(min(probe1, probe2), 1.0)
        eff = (large["edges_per_sec"] / small["edges_per_sec"]) / 4
        windows.append(
            {
                "window": w + 1,
                "order": "small_first" if small_first else "large_first",
                "window_wall_sec": round(_time.time() - t_start, 1),
                "cpu_probe_before_first": round(probe1, 0),
                "cpu_probe_before_second": round(probe2, 0),
                "probe_shift": round(probe_shift, 4),
                "accepted": probe_shift <= args.probe_tolerance,
                "small": small,
                "large": large,
                "efficiency": round(eff, 4),
            }
        )
        print(
            json.dumps(
                {
                    "window": w + 1,
                    "efficiency": round(eff, 4),
                    "probe_shift": round(probe_shift, 4),
                    "accepted": probe_shift <= args.probe_tolerance,
                }
            ),
            flush=True,
        )

    accepted = [w for w in windows if w["accepted"]]
    rejected = [w for w in windows if not w["accepted"]]
    effs = [w["efficiency"] for w in (accepted or windows)]
    mean_eff = sum(effs) / len(effs)
    report = {
        "files": args.files,
        "imports_per_file": args.imports,
        "loop_partitions": args.partitions,
        "methodology": (
            "local[N] vs local[4N] on identical deterministic corpus bytes "
            "and identical loop partition count — the sandbox substitution "
            "for the N vs 4N executor criterion. Each paired window runs "
            "both levels back-to-back (alternating order) and contributes "
            "exactly one efficiency ratio; the headline is the MEAN of "
            "ACCEPTED paired-window ratios. Acceptance is programmatic: a "
            "single-threaded CPU probe runs immediately before each half, "
            "and a window whose probes disagree beyond --probe-tolerance "
            "is recorded but rejected — the host's deliverable CPU changed "
            "mid-window, so its ratio measures the host, not the engine. "
            "Cross-window ratios are structurally impossible in this "
            "report (the host swings >3x between minutes). If every "
            "window is rejected, the mean falls back to all windows and "
            "meets_target reflects that degraded evidence."
        ),
        "paired_window_runs": windows,
        "accepted_windows": [w["window"] for w in accepted],
        "rejected_windows": [w["window"] for w in rejected],
        "per_window_efficiencies_accepted": effs,
        "mean_paired_efficiency": round(mean_eff, 4),
        "target": 0.8,
        "meets_target": bool(accepted) and mean_eff >= 0.8,
        "host_variance_evidence": {
            "small_edges_per_sec_across_windows": [
                w["small"]["edges_per_sec"] for w in windows
            ],
            "large_edges_per_sec_across_windows": [
                w["large"]["edges_per_sec"] for w in windows
            ],
            "note": "spread across windows at a FIXED level is pure host "
            "variance (identical code + input); compare it to the "
            "within-window small→large ratio the efficiency uses",
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
