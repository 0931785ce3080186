"""Materialization seam: local vs table mode must be result-identical;
table mode writes fault-tolerant parquet instead of pinning executor
storage (the 100-TB setting)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mkgmap_spark.plans.materialize import DIR_CONF, MODE_CONF, materialize


@pytest.fixture
def table_mode(spark, tmp_path):
    spark.conf.set(MODE_CONF, "table")
    spark.conf.set(DIR_CONF, str(tmp_path / "scratch"))
    yield str(tmp_path / "scratch")
    spark.conf.set(MODE_CONF, "local")


def test_modes_identical(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 3 % 97)
    local = materialize(df).collect()
    spark.conf.set(MODE_CONF, "table")
    spark.conf.set(DIR_CONF, str(tmp_path / "s"))
    try:
        tabled = materialize(df).collect()
    finally:
        spark.conf.set(MODE_CONF, "local")
    assert sorted(map(tuple, local)) == sorted(map(tuple, tabled))


def test_table_mode_writes_parquet(spark, table_mode):
    df = spark.range(0, 10)
    out = materialize(df, tag="probe")
    assert out.count() == 10
    dirs = os.listdir(table_mode)
    assert any(d.startswith("probe-") for d in dirs)


def test_table_mode_requires_dir(spark):
    spark.conf.set(MODE_CONF, "table")
    spark.conf.unset(DIR_CONF)
    try:
        with pytest.raises(ValueError, match="scratch location"):
            materialize(spark.range(3))
    finally:
        spark.conf.set(MODE_CONF, "local")


def test_operator_through_table_mode(spark, table_mode):
    """A representative iterative operator (coastline components) runs
    identically under table materialization."""
    from mkgmap_spark.operators.sea import coastline_components

    ways = spark.createDataFrame(
        [
            (1, [0, 10], [0, 10]),
            (2, [10, 20], [10, 20]),   # chains with 1
            (3, [500, 510], [500, 510]),
        ],
        "id long, lats array<int>, lons array<int>",
    )
    got = {r["id"]: r["component"] for r in coastline_components(ways).collect()}
    assert got[1] == got[2] == 1 and got[3] == 3
