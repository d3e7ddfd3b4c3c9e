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

# One-time extraction child: synthesize the deterministic corpus,
# extract the code-dependency edge table, write it as Parquet. MEASURE
# children then read identical bytes, so a window pays only the job
# under test (PageRank over the extracted edge table) — windows are
# tight enough that the host-comparability probes actually bracket the
# work they guard, and the graph can be dense enough for supersteps to
# stay compute-bound on a fast host.
SETUP = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_DIR"])
n_files = int(sys.argv[1]); imports = int(sys.argv[2]); out_dir = sys.argv[3]
from graph_engine_spark.session import get_spark
from graph_engine_spark.corpus import synthesize_corpus
from graph_engine_spark.extractor import extract_graph
from graph_engine_spark.graph.linkgraph import module_link_graph
spark = get_spark(app_name="scaling-setup", cores=32)
spark.sparkContext.setLogLevel("ERROR")
corpus = synthesize_corpus(
    spark, n_files=n_files, n_components=5, hubs_per_component=4,
    partitions=64, imports_per_file=imports,
)
# single-consumer setup: the one write below is the only reader of
# edges/IR, so skip extract_graph's IR+edges caches (materializing a
# 47.8M-row cache during fixture write buys nothing here)
_, edges = extract_graph(corpus, persist_ir=False)
module_link_graph(edges).repartition(64).write.mode("overwrite").parquet(out_dir)
print(json.dumps({"edges_written": spark.read.parquet(out_dir).count()}))
"""

MEASURE = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_DIR"])
cores = int(sys.argv[1]); partitions = int(sys.argv[2]); edges_dir = sys.argv[3]
salt_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 0
salt_threshold = int(sys.argv[5]) if len(sys.argv) > 5 else 0
from graph_engine_spark.session import get_spark
from graph_engine_spark.graph.pagerank import pagerank
spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")

def _gc_millis():
    # local mode: driver JVM == the executor, so the driver's collector
    # MXBeans cover every task's GC. Used as a before/after delta.
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

# identical input bytes and identical partition count at both
# parallelism levels: only the number of concurrently executing tasks
# changes, the sandbox analogue of N vs 4N executors over one dataset.
mg = spark.read.parquet(edges_dir).persist()
n_edges = mg.count()
gc0 = _gc_millis()
t0 = time.time()
kw = {}
if salt_buckets > 0:
    kw = dict(salt_buckets=salt_buckets, salt_degree_threshold=salt_threshold)
res = pagerank(mg, tol=1e-6, max_iter=200, num_partitions=partitions, **kw)
t_wall = time.time() - t0
gc_sec = (_gc_millis() - gc0) / 1000.0
# the north metric is SUPERSTEPS/sec and edges-processed/sec: the
# per-superstep timer inside pagerank measures exactly the iterative
# work; one-time graph setup (adjacency build + dictionaries) is
# reported separately as setup_sec
t_steps = sum(res.superstep_seconds)
print(json.dumps({
    "cores": cores, "link_edges": n_edges,
    "partitions": partitions, "salt_buckets": salt_buckets,
    "heap": spark.conf.get("spark.driver.memory"),
    "pagerank_wall_sec": round(t_wall, 2),
    "superstep_sec_total": round(t_steps, 2),
    "setup_sec": round(t_wall - t_steps, 2),
    "gc_sec": round(gc_sec, 2),
    "supersteps": res.iterations, "converged": res.converged,
    "supersteps_per_sec": round(res.iterations / t_steps, 4),
    "edges_per_sec": round(n_edges * res.iterations / t_steps, 1),
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


def _agg_worker(seconds: float, q) -> None:
    q.put(cpu_probe(seconds))


def aggregate_capacity(nproc: int, seconds: float = 4.0) -> float:
    """AGGREGATE CPU capacity at nproc busy processes (sum of per-proc
    iterations/sec). Single-thread probes cannot see hypervisor-level
    parallel throttling: round-3 measurement on this KVM guest showed a
    healthy single-thread probe while 32 busy vCPUs received only
    ~23.5 cores' worth of cycles (79% of guest time misattributed to
    'system' + 19% steal). The ratio
    (capacity(4N)/capacity(N))/4 is the HARDWARE ceiling on any
    N→4N scaling efficiency measured on this box — recorded per window
    so engine efficiency is interpretable against it."""
    import multiprocessing as mp

    q = mp.Queue()
    ps = [mp.Process(target=_agg_worker, args=(seconds, q)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def _child(code: str, argv: list[str]) -> dict:
    env = dict(os.environ, REPO_DIR=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", code, *argv],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed ({argv}):\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def run(cores: int, partitions: int, edges_dir: str) -> dict:
    return _child(MEASURE, [str(cores), str(partitions), edges_dir])


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
    ap.add_argument("--min-hw-ceiling", type=float, default=0.8,
                    help="minimum hardware parallel ceiling — the "
                    "(aggregate capacity at 4N procs / capacity at N) / 4 "
                    "pure-arithmetic ratio, bracketed at window open AND "
                    "close — for a window to be accepted. Single-thread "
                    "probes run at full speed while the hypervisor "
                    "throttles AGGREGATE capacity (bench.py round-4 "
                    "lesson), so a probe-clean window can still be one "
                    "where the hardware could not deliver the target: if "
                    "the host itself cannot scale 2→8 at >= this ratio, "
                    "the window measures the hypervisor, not the engine. "
                    "Default = the 0.8 target itself (a window whose "
                    "ceiling is below the target cannot evidence it).")
    ap.add_argument("--edges-dir", default="/tmp/scaling_edges.parquet",
                    help="where the one-time extracted edge table lands")
    ap.add_argument("--skip-setup", action="store_true",
                    help="reuse an existing --edges-dir")
    ap.add_argument("--min-accepted", type=int, default=0,
                    help="keep running windows (up to --max-windows) until "
                    "this many pass the probe gate — lets the run outlast "
                    "noisy-host periods and catch quiet ones")
    ap.add_argument("--max-windows", type=int, default=0,
                    help="hard cap when --min-accepted is set")
    ap.add_argument("--cooldown", type=float, default=0.0,
                    help="seconds to sleep between windows in "
                    "--min-accepted mode")
    ap.add_argument("--mem", default="",
                    help="fix SPARK_GRAFT_DRIVER_MEM for ALL measure "
                    "children so both parallelism levels run the "
                    "IDENTICAL heap — removes the 24g-vs-80g GC "
                    "confound from the efficiency ratio (a real "
                    "cluster's spark.executor.memory doesn't change "
                    "with cluster size either)")
    ap.add_argument("--midpoint", action="store_true",
                    help="also measure local[2n] inside each window "
                    "(probe-bracketed) — localizes where scaling "
                    "breaks: 8→16 vs 16→32")
    args = ap.parse_args()

    if args.mem:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.mem

    import time as _time

    if not args.skip_setup:
        t0 = _time.time()
        setup = _child(SETUP, [str(args.files), str(args.imports), args.edges_dir])
        print(json.dumps({"setup": setup, "setup_sec": round(_time.time() - t0, 1)}),
              flush=True)

    # one-time host parallel-capacity curve (pure arithmetic, no Spark):
    # where aggregate capacity stops scaling linearly is where local[K]
    # comparisons stop measuring the engine and start measuring the
    # hypervisor's CPU allocation
    curve = {}
    base_cap = aggregate_capacity(1)
    curve["1"] = {"Miters": round(base_cap / 1e6, 1), "speedup": 1.0}
    for nn in (2, 4, 8, 16, 32):
        c = aggregate_capacity(nn)
        curve[str(nn)] = {
            "Miters": round(c / 1e6, 1),
            "speedup": round(c / base_cap, 2),
        }
    print(json.dumps({"host_capacity_curve": curve}), flush=True)

    windows = []
    w = -1
    while True:
        w += 1
        if args.min_accepted > 0:
            n_acc = sum(1 for x in windows if x["accepted"])
            if n_acc >= args.min_accepted or w >= max(args.max_windows, 1):
                break
            if w > 0 and args.cooldown:
                _time.sleep(args.cooldown)
        elif w >= args.windows:
            break
        small_first = w % 2 == 0
        t_start = _time.time()
        # hardware parallel-capacity bracket: aggregate CPU at N and 4N
        # busy processes, measured at the window open — the ceiling any
        # engine efficiency in this window could reach on this host
        cap_small = aggregate_capacity(args.n)
        cap_large = aggregate_capacity(args.n * 4)
        hw_open = (cap_large / cap_small) / 4 if cap_small > 0 else None
        levels = [("small", args.n), ("large", args.n * 4)]
        if args.midpoint:
            levels.insert(1, ("mid", args.n * 2))
        if not small_first:
            levels = levels[::-1]
        probes = []
        results: dict[str, dict] = {}
        for label, cores in levels:
            probes.append(cpu_probe())
            results[label] = run(cores, args.partitions, args.edges_dir)
        probes.append(cpu_probe())  # brackets the last half too
        # hardware bracket at window CLOSE too: aggregate throttling is
        # invisible to the single-thread probes (they run at full speed
        # while 8+ busy procs share a few cores), so the ceiling must be
        # measured on both sides of the work it certifies
        cap_small2 = aggregate_capacity(args.n)
        cap_large2 = aggregate_capacity(args.n * 4)
        hw_close = (cap_large2 / cap_small2) / 4 if cap_small2 > 0 else None
        # explicit None checks (ADVICE r4): a legitimately measured
        # ceiling of 0.0 (fully throttled host) must be REPORTED as 0.0
        # — truthiness coerced it to null while still rejecting the
        # window, hiding the evidence for the rejection
        hw_ceiling = (
            min(hw_open, hw_close)
            if hw_open is not None and hw_close is not None
            else None
        )
        probe_shift = (max(probes) - min(probes)) / max(min(probes), 1.0)
        small, large = results["small"], results["large"]
        eff = (large["edges_per_sec"] / small["edges_per_sec"]) / 4
        hw_ok = hw_ceiling is not None and hw_ceiling >= args.min_hw_ceiling
        accepted = probe_shift <= args.probe_tolerance and hw_ok
        rec = {
            "window": w + 1,
            "order": "small_first" if small_first else "large_first",
            "window_wall_sec": round(_time.time() - t_start, 1),
            "cpu_probes": [round(p, 0) for p in probes],
            "probe_shift": round(probe_shift, 4),
            "accepted": accepted,
            "small": small,
            "large": large,
            "efficiency": round(eff, 4),
            "agg_capacity_Miters": {
                str(args.n): round(cap_small / 1e6, 1),
                str(args.n * 4): round(cap_large / 1e6, 1),
                f"{args.n}_close": round(cap_small2 / 1e6, 1),
                f"{args.n * 4}_close": round(cap_large2 / 1e6, 1),
            },
            "hw_parallel_ceiling": round(hw_ceiling, 4)
            if hw_ceiling is not None
            else None,
            "hw_ceiling_ok": hw_ok,
            "efficiency_vs_hw_ceiling": round(eff / hw_ceiling, 4)
            if hw_ceiling
            else None,
        }
        if args.midpoint:
            mid = results["mid"]
            rec["mid"] = mid
            rec["efficiency_small_to_mid"] = round(
                (mid["edges_per_sec"] / small["edges_per_sec"]) / 2, 4
            )
            rec["efficiency_mid_to_large"] = round(
                (large["edges_per_sec"] / mid["edges_per_sec"]) / 2, 4
            )
        windows.append(rec)
        print(
            json.dumps(
                {
                    "window": w + 1,
                    "efficiency": round(eff, 4),
                    "probe_shift": round(probe_shift, 4),
                    "hw_ceiling": rec["hw_parallel_ceiling"],
                    "accepted": accepted,
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
        "fixed_heap": args.mem or None,
        "n_small": args.n,
        "n_large": args.n * 4,
        "host_capacity_curve": curve,
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
            "A second gate brackets the window with a pure-arithmetic "
            "AGGREGATE-capacity probe at N and 4N busy processes (open "
            "and close): single-thread probes run at full speed while "
            "the hypervisor throttles aggregate capacity, so a window "
            "whose measured hardware parallel ceiling is below the 0.8 "
            "target could not evidence the target no matter what the "
            "engine did, and is rejected as a hardware-invalid window. "
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
        "min_hw_ceiling_gate": args.min_hw_ceiling,
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
