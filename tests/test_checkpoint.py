"""Checkpoint/lineage/resume semantics (north-rule requirement)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mkgmap_spark.plans.checkpoint import CheckpointManager


def test_stage_commit_and_resume(spark, tmp_path):
    base = str(tmp_path / "ck")
    ck = CheckpointManager(spark, base)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(0, 1000).select(F.col("id"), (F.col("id") * 2).alias("v"))

    df1 = ck.stage("s1", build, inputs=["range"])
    assert df1.count() == 1000
    assert calls["n"] == 1

    # resume: a second manager (fresh "process") skips the committed stage
    ck2 = CheckpointManager(spark, base)
    df2 = ck2.stage("s1", build, inputs=["range"])
    assert df2.count() == 1000
    assert calls["n"] == 1  # not rebuilt

    meta = ck2.meta("s1")
    assert meta["n_rows"] == 1000
    assert meta["inputs"] == ["range"]
    assert meta["wall_s"] >= 0
    assert sum(p["rows"] for p in meta["partitions"]) == 1000  # per-partition lineage


def test_torn_stage_is_rebuilt(spark, tmp_path):
    """A stage directory without the commit marker (simulated crash
    mid-write) must be rolled back and rebuilt."""
    base = str(tmp_path / "ck2")
    ck = CheckpointManager(spark, base)

    def build():
        return spark.range(0, 10).select("id")

    ck.stage("s1", build)
    # simulate torn write: remove the marker, corrupt the data dir
    os.remove(os.path.join(base, "s1", "_COMMITTED"))
    with open(os.path.join(base, "s1", "data", "junk"), "w") as f:
        f.write("garbage")

    ck3 = CheckpointManager(spark, base)
    df = ck3.stage("s1", build)
    assert df.count() == 10
    assert ck3.has("s1")


def test_manifest(spark, tmp_path):
    base = str(tmp_path / "ck3")
    ck = CheckpointManager(spark, base)
    ck.stage("a", lambda: spark.range(5).select("id"))
    ck.stage("b", lambda: spark.range(7).select("id"))
    man = ck.manifest()
    assert [m["stage"] for m in man] == ["a", "b"]
    assert [m["n_rows"] for m in man] == [5, 7]
