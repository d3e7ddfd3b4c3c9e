"""Superstep checkpointing with per-partition lineage and metrics.

North-rule requirement: "checkpointed every k supersteps with
per-partition lineage and convergence metrics so runs resume
mid-iteration". Design: every k supersteps the current state table is
written to Parquet under ``<dir>/iter_<n>/`` together with a manifest
recording the iteration number, convergence metric, wall time,
partition count, and per-partition row counts (the lineage evidence —
which partition held what). The manifest is written atomically
(tmp + os.replace), the same commit protocol as the reference's JSON
snapshot (reference graph_core/storage/json_storage.py:217-224); on a
real cluster this role is played by an Iceberg snapshot commit.

``resume()`` returns the newest state whose manifest is complete, so a
killed run restarts from the last durable superstep rather than
iteration 0.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"


class CheckpointManager:
    def __init__(self, base_dir: str, every_k: int = 5, keep_last: int = 2):
        self.base_dir = base_dir
        self.every_k = every_k
        self.keep_last = keep_last
        os.makedirs(base_dir, exist_ok=True)

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.base_dir, f"iter_{iteration:06d}")

    def should_checkpoint(self, iteration: int) -> bool:
        return self.every_k > 0 and iteration > 0 and iteration % self.every_k == 0

    def save(self, df: DataFrame, iteration: int, metrics: dict) -> DataFrame:
        """Write state + manifest; return the re-read DataFrame (fresh
        lineage — truncates the iterative query plan)."""
        path = self._iter_dir(iteration)
        data_path = os.path.join(path, "data")
        df.write.mode("overwrite").parquet(data_path)
        spark = df.sparkSession
        reread = spark.read.parquet(data_path)
        part_counts = (
            reread.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .orderBy("partition")
            .collect()
        )
        manifest = {
            "iteration": iteration,
            "metrics": metrics,
            "written_at": time.time(),
            "num_partitions": reread.rdd.getNumPartitions(),
            "partition_rows": {str(r["partition"]): r["count"] for r in part_counts},
            "schema": reread.schema.jsonValue(),
        }
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, MANIFEST))
        self._gc(iteration)
        return reread

    def _gc(self, current_iteration: int) -> None:
        done = sorted(self.iterations())
        for it in done[: -self.keep_last] if self.keep_last else []:
            if it < current_iteration:
                shutil.rmtree(self._iter_dir(it), ignore_errors=True)

    def iterations(self) -> list[int]:
        out = []
        if not os.path.isdir(self.base_dir):
            return out
        for name in os.listdir(self.base_dir):
            mpath = os.path.join(self.base_dir, name, MANIFEST)
            if name.startswith("iter_") and os.path.exists(mpath):
                out.append(int(name.split("_")[1]))
        return sorted(out)

    def resume(self, spark: SparkSession, expected_id_type: str | None = None):
        """(iteration, state_df, metrics) of the newest complete
        checkpoint, or None.

        expected_id_type: simpleString of the FIRST state column's type
        the resuming run requires (its vertex-id coding: "bigint" when
        ids are xxhash64-encoded, "string" when raw). A checkpoint
        written under a different coding would silently join against
        nothing downstream (decode joins comp.id vs xxhash64 vids) —
        fail fast here instead. Validated from the manifest's recorded
        schema, so checkpoints written before this guard existed are
        still checkable."""
        its = self.iterations()
        if not its:
            return None
        it = its[-1]
        path = self._iter_dir(it)
        with open(os.path.join(path, MANIFEST)) as f:
            manifest = json.load(f)
        if expected_id_type is not None:
            fields = manifest.get("schema", {}).get("fields", [])
            saved_type = fields[0].get("type") if fields else None
            if isinstance(saved_type, str):  # primitive types only
                # Parquet re-read schema is the source of truth; "long"
                # and "bigint" are the same simpleString family
                norm = {"long": "bigint", "integer": "int"}
                if norm.get(saved_type, saved_type) != norm.get(
                    expected_id_type, expected_id_type
                ):
                    raise ValueError(
                        f"checkpoint {path} was written with id column type "
                        f"'{saved_type}' but this run expects "
                        f"'{expected_id_type}' (different vertex-id coding); "
                        "delete the checkpoint dir or rerun with the "
                        "matching encode_ids setting"
                    )
        df = spark.read.parquet(os.path.join(path, "data"))
        return it, df, manifest["metrics"]
