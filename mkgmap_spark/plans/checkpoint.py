"""Stage checkpointing with lineage + metrics, and resume-from-last-commit.

North-rule requirement: every stage writes per-partition lineage +
metrics to a checkpoint table so a killed job resumes from the last
committed batch.  Locally the checkpoint store is a parquet directory
per stage with an atomic `_COMMITTED` marker + `_META.json` (lineage:
inputs, row count, per-partition rows, wall time); on a cluster the
same layout maps 1:1 onto an Iceberg table per stage (snapshot commit =
marker, snapshot summary = metrics).

This is also the engine's materialization primitive: Spark's in-memory
`persist()` turned out ~5x slower than a columnar write+readback for
wide fan-in reuse (measured in BENCH notes), and a checkpointed stage
is re-scannable for free by every later stage and by resumed runs.

mkgmap analogue: the per-tile `.img` files on disk are its process
boundary/restart unit (combiners re-read them, combiners/FileInfo.java);
we make the boundary explicit per stage.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str, collect_partition_metrics: bool = True):
        self.spark = spark
        self.base_dir = base_dir
        self.collect_partition_metrics = collect_partition_metrics
        os.makedirs(base_dir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str, str]:
        d = os.path.join(self.base_dir, name)
        return d, os.path.join(d, "_COMMITTED"), os.path.join(d, "_META.json")

    def has(self, name: str) -> bool:
        _, marker, _ = self._paths(name)
        return os.path.exists(marker)

    def load(self, name: str) -> DataFrame:
        d, _, _ = self._paths(name)
        return self.spark.read.parquet(os.path.join(d, "data"))

    def meta(self, name: str) -> dict:
        _, _, meta = self._paths(name)
        with open(meta) as f:
            return json.load(f)

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: list[str] | None = None,
        extra_meta: dict | None = None,
        coalesce: int | None = None,
    ) -> DataFrame:
        """Run (or resume) a stage.  If `_COMMITTED` exists the stage is
        skipped and its output re-read — resume-from-last-commit."""
        d, marker, meta_path = self._paths(name)
        if os.path.exists(marker):
            return self.load(name)
        if os.path.exists(d):
            shutil.rmtree(d)  # torn previous attempt: roll back
        os.makedirs(d, exist_ok=True)

        t0 = time.time()
        df = build()
        if coalesce:
            # fewer, larger files: per-file open/commit overhead is a
            # flat serial cost that dwarfs the data at high core counts
            df = df.coalesce(coalesce)
        data_path = os.path.join(d, "data")
        df.write.mode("overwrite").parquet(data_path)
        out = self.spark.read.parquet(data_path)

        meta: dict = {
            "stage": name,
            "inputs": inputs or [],
            "wall_s": round(time.time() - t0, 3),
            "committed_at": time.time(),
            "n_rows": out.count(),
        }
        if self.collect_partition_metrics:
            parts = (
                out.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .orderBy("pid")
                .collect()
            )
            meta["partitions"] = [{"pid": r["pid"], "rows": r["count"]} for r in parts]
        if extra_meta:
            meta.update(extra_meta)
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        # atomic commit marker last: a crash before this line leaves the
        # stage uncommitted and it will be rebuilt on resume
        with open(marker, "w") as f:
            f.write("ok")
        return out

    def manifest(self) -> list[dict]:
        out = []
        if not os.path.isdir(self.base_dir):
            return out
        for name in sorted(os.listdir(self.base_dir)):
            if self.has(name):
                out.append(self.meta(name))
        return out
