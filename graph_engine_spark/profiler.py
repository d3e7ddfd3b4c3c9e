"""Per-stage timing report — the reference profiler's contract.

Reference performance/profiler.py monkey-patches timers onto
parse_file / scan_secrets / storage add-update / storage save and
prints a fixed-format report (:115-145) whose fields its E2E test
asserts (tests/test_performance.py:41-103). Here the same stages are
the engine's pipeline phases, timed around Spark actions, and the
report format and field names are preserved so the contract carries
over: "Overall processing time", per-step total/calls/avg-ms rows,
and an "Untimed/Overhead" remainder.

Usage: ``python -m graph_engine_spark.profiler [--n-files 500]``.
"""

from __future__ import annotations

import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.timings: dict[str, list[float]] = defaultdict(list)

    def timed(self, name: str, fn):
        t0 = time.time()
        out = fn()
        self.timings[name].append(time.time() - t0)
        return out

    def report(self, overall: float, processed: int) -> str:
        lines = [
            "--- Performance Report ---",
            f"Overall processing time: {overall:.4f}s for {processed} files",
            "--------------------------",
            f"{'Step':<30} | {'Total Time (s)':<15} | {'Calls':<8} | {'Avg Time (ms)':<15}",
            "-" * 71,
        ]
        rows = []
        timed_total = 0.0
        for name, durations in self.timings.items():
            total = sum(durations)
            calls = len(durations)
            avg_ms = total / calls * 1000 if calls else 0.0
            rows.append((name, total, calls, avg_ms))
            timed_total += total
        rows.sort(key=lambda r: r[1], reverse=True)
        for name, total, calls, avg_ms in rows:
            lines.append(f"{name:<30} | {total:<15.4f} | {calls:<8} | {avg_ms:<15.4f}")
        lines.append("-" * 71)
        lines.append(f"Untimed/Overhead: {overall - timed_total:.4f}s")
        lines.append("--------------------------")
        return "\n".join(lines)


def profile_pipeline(spark, n_files: int = 500, output_dir: str | None = None) -> str:
    """Time the extract → scan → merge → save pipeline stage by stage
    and return the reference-format report."""
    from graph_engine_spark.corpus import synthesize_corpus
    from graph_engine_spark.extractor.extract import dedupe_edges, dedupe_nodes, extract_ir
    from graph_engine_spark.functions.secrets import scan_secrets

    timer = StageTimer()
    t0 = time.time()
    corpus = synthesize_corpus(spark, n_files=n_files).persist()
    processed = corpus.count()

    ir = timer.timed("parse_file", lambda: extract_ir(corpus).persist())
    timer.timed("parse_file", ir.count)  # materialize the extraction pass
    timer.timed("scan_secrets", lambda: scan_secrets(corpus).count())
    nodes = timer.timed("storage_add_update_nodes", lambda: dedupe_nodes(ir).persist())
    timer.timed("storage_add_update_nodes", nodes.count)
    edges = timer.timed("storage_add_update_edges", lambda: dedupe_edges(ir).persist())
    timer.timed("storage_add_update_edges", edges.count)
    if output_dir:
        timer.timed(
            "storage_save",
            lambda: nodes.write.mode("overwrite").parquet(f"{output_dir}/nodes"),
        )
        timer.timed(
            "storage_save",
            lambda: edges.write.mode("overwrite").parquet(f"{output_dir}/edges"),
        )
    overall = time.time() - t0
    for df in (corpus, ir, nodes, edges):
        df.unpersist()
    return timer.report(overall, processed)


def main() -> None:
    import argparse

    from graph_engine_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-files", type=int, default=500)
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    spark = get_spark(app_name="graph-engine-profiler", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    print(profile_pipeline(spark, args.n_files, args.output_dir))


if __name__ == "__main__":
    main()
