"""Capture .explain("formatted") plans for the queries/operators touched
in the optimization round. Usage:

    python scripts/capture_plans.py plans/r06 before [name ...]
    python scripts/capture_plans.py plans/r06 after  [name ...]

Each capture writes plans/r06/<name>_<tag>.txt. The iterative
algorithms' interesting plan is the ROUND BODY (what runs per
superstep), so those captures build one round's DataFrame exactly the
way the loop does and explain that.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir, tag = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from graph_engine_spark.session import get_spark

    spark = get_spark(app_name="capture-plans", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    captures: dict[str, object] = {}

    # --- sssp round body (shape of graph/traversal.py sssp loop) ---
    from graph_engine_spark.graph.pagerank import _IterLoopConf

    def sssp_round():
        loop_conf = _IterLoopConf(spark, 4)
        try:
            edges = spark.createDataFrame(
                [(str(i), str((i * 3) % 40), float(i % 5 + 1)) for i in range(200)],
                ["src", "dst", "w"],
            )
            from graph_engine_spark.graph import traversal as tv

            adj = (
                edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
                .filter(F.col("u") != F.col("v"))
                .groupBy("u", "v")
                .agg(F.min("w").alias("w"))
                .repartition(4, "u")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            adj.count()
            dists = spark.createDataFrame([("0", 0.0), ("3", 0.0)], ["id", "dist"])
            dists = dists.persist(StorageLevel.MEMORY_AND_DISK)
            dists.count()
            body = tv._sssp_round_body if hasattr(tv, "_sssp_round_body") else None
            if body is not None:
                df = body(adj, dists, dists)
            else:
                # pre-optimization shape: cand -> improved
                cand = (
                    adj.join(
                        dists.select(
                            F.col("id").alias("u"), F.col("dist").alias("_du")
                        ).hint("shuffle_hash"),
                        "u",
                    )
                    .select("v", (F.col("_du") + F.col("w")).alias("_nd"))
                    .groupBy("v")
                    .agg(F.min("_nd").alias("_nd"))
                    .select(F.col("v").alias("id"), "_nd")
                )
                df = (
                    cand.join(dists.hint("shuffle_hash"), "id", "left")
                    .filter(F.col("dist").isNull() | (F.col("_nd") < F.col("dist")))
                    .select("id", F.col("_nd").alias("dist"))
                )
            p = plan_of(df)
            adj.unpersist()
            dists.unpersist()
            return p
        finally:
            loop_conf.restore()

    captures["sssp_round"] = sssp_round

    def bfs_round():
        loop_conf = _IterLoopConf(spark, 4)
        try:
            edges = spark.createDataFrame(
                [(str(i), str((i * 3) % 40)) for i in range(200)], ["src", "dst"]
            )
            from graph_engine_spark.graph import traversal as tv

            adj = (
                edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
                .repartition(4, "u")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            adj.count()
            frontier = spark.createDataFrame([("0",), ("3",)], ["id"])
            visited = frontier.select("id", F.lit(0).alias("dist")).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            visited.count()
            body = tv._bfs_round_body if hasattr(tv, "_bfs_round_body") else None
            if body is not None:
                df = body(adj, frontier, visited, 1)
            else:
                df = (
                    adj.join(
                        frontier.withColumnRenamed("id", "u").hint("shuffle_hash"),
                        "u",
                    )
                    .select(F.col("v").alias("id"))
                    .distinct()
                    .join(visited.hint("shuffle_hash"), "id", "left_anti")
                )
            p = plan_of(df)
            adj.unpersist()
            visited.unpersist()
            return p
        finally:
            loop_conf.restore()

    captures["bfs_round"] = bfs_round

    def cc_round():
        from graph_engine_spark.graph.components import _large_star, _small_star

        loop_conf = _IterLoopConf(spark, 4)
        try:
            e = spark.createDataFrame(
                [(str(i), str((i * 7) % 50)) for i in range(300)], ["u", "v"]
            ).persist(StorageLevel.MEMORY_AND_DISK)
            e.count()
            p = plan_of(_small_star(_large_star(e)))
            e.unpersist()
            return p
        finally:
            loop_conf.restore()

    captures["cc_round"] = cc_round

    def lpa_round():
        from pyspark.sql import Window
        from graph_engine_spark.graph import lpa as lpamod

        loop_conf = _IterLoopConf(spark, 4)
        try:
            edges = spark.createDataFrame(
                [(str(i), str((i * 3) % 40)) for i in range(200)], ["src", "dst"]
            )
            sym = (
                edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
                .unionAll(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
                .filter(F.col("a") != F.col("b"))
                .distinct()
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            sym.count()
            labels = (
                sym.select(F.col("a").alias("id")).distinct()
                .select("id", F.col("id").alias("label"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            labels.count()
            body = getattr(lpamod, "_lpa_round_body", None)
            if body is not None:
                df = body(sym, labels, weighted=False)
            else:
                votes = (
                    sym.join(labels, sym.a == labels.id)
                    .groupBy(F.col("b").alias("id"), "label")
                    .agg(F.count("*").alias("cnt"))
                )
                win = Window.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
                best = (
                    votes.withColumn("rn", F.row_number().over(win))
                    .filter(F.col("rn") == 1)
                    .select("id", F.col("label").alias("new_label"))
                )
                df = labels.join(best.hint("shuffle_hash"), "id", "left").select(
                    "id",
                    F.col("label").alias("_prev"),
                    F.coalesce("new_label", "label").alias("label"),
                )
            p = plan_of(df)
            sym.unpersist()
            labels.unpersist()
            return p
        finally:
            loop_conf.restore()

    captures["lpa_round"] = lpa_round

    def entry_query(name):
        import __spark_entry__ as entrymod

        q = entrymod.queries()
        return lambda: plan_of(q[name](spark, SF_DIR))

    for name in ("minhash_lsh", "simhash_near_dup", "lang_id", "connected_components",
                 "sssp_weighted", "bfs_3hops", "label_propagation"):
        captures[name] = entry_query(name)

    def streaming_upsert():
        import tempfile

        from graph_engine_spark.corpus import synthesize_corpus
        from graph_engine_spark.streaming.maintenance import (
            apply_upserts,
            empty_state,
            persist_state_version,
        )

        corpus = synthesize_corpus(spark, n_files=500, n_components=5, hubs_per_component=4)
        bucket = F.pmod(F.xxhash64("path"), F.lit(8))
        with tempfile.TemporaryDirectory(prefix="plan_stream_") as sdir:
            state = persist_state_version(
                spark, apply_upserts(empty_state(spark), corpus.filter(bucket < 4)), sdir, 0
            )
            batch = corpus.filter(bucket == 0).withColumn(
                "content", F.concat("content", F.lit("\n# touched\n"))
            )
            st2 = apply_upserts(state, batch)
            p = "=== nodes ===\n" + plan_of(st2.nodes) + "\n=== edges ===\n" + plan_of(st2.edges)
            st2.release()
            return p

    captures["streaming_upsert"] = streaming_upsert

    for name, fn in captures.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            with open(path, "w") as f:
                f.write(fn())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            continue
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
