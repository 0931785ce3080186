"""Regression: driver-harness environment parity.

The round-2 driver gate ran queries on a VANILLA SparkSession (no
mkgmap_spark.session.get_spark), where spark.sql.mapKeyDedupPolicy
defaults to EXCEPTION — and compile_rules hard-raised, turning 3 green
queries red.  These tests re-create that environment by resetting the
session confs get_spark customizes to their Spark defaults before
invoking the affected queries, so an engine-code assumption about the
session factory can never again pass locally while failing the driver.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

# runtime-settable confs get_spark sets, with vanilla Spark defaults
_VANILLA = {
    "spark.sql.mapKeyDedupPolicy": "EXCEPTION",
    "spark.sql.shuffle.partitions": "200",
}


@pytest.fixture()
def vanilla_confs(spark):
    saved = {k: spark.conf.get(k) for k in _VANILLA}
    for k, v in _VANILLA.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    [
        "style_rules", "style_rules_full", "apply_members",
        # round-4 query families: collation pandas_udf, per-tile sea
        # synthesis, iterative flare walks, materialized link splits,
        # locator kNN fallback, precomputed-tree assignment
        "mdr_index", "sea_polygons", "roundabout_flares",
        "dest_hints", "locator_autofill", "house_interpolation",
    ],
)
def test_rule_queries_run_on_vanilla_session(vanilla_confs, name):
    spark = vanilla_confs
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0


def test_compile_rules_sets_dedup_policy(vanilla_confs):
    """compile_rules must SET LAST_WIN itself, not demand it."""
    from mkgmap_spark.rules.compiler import compile_rules
    from mkgmap_spark.rules.parser import parse_rules

    spark = vanilla_confs
    df = spark.createDataFrame(
        [(1, {"highway": "primary", "name": "A"})], "id long, tags map<string,string>"
    )
    rules = parse_rules("highway=primary { set touched=yes } [0x02 resolution 20]")
    out = compile_rules(rules, df)
    rows = out.collect()
    assert len(rows) == 1
    assert spark.conf.get("spark.sql.mapKeyDedupPolicy") == "LAST_WIN"
    # fixture teardown restores; while inside, LAST_WIN is what the
    # driver's process would keep for the rest of its run — correct.


def test_is_complete_null_matches_interpreter(spark):
    """Null `complete` (rows the resolver never stamped) must read as
    complete in BOTH engines — only explicit false means clipped."""
    from mkgmap_spark.rules.compiler import compile_rules
    from mkgmap_spark.rules.interpreter import interpret
    from mkgmap_spark.rules.parser import parse_rules

    rules = parse_rules("highway=* & is_complete()=true { set ok=yes } [0x1 resolution 24]")
    df = spark.createDataFrame(
        [(1, {"highway": "a"}, True), (2, {"highway": "a"}, None), (3, {"highway": "a"}, False)],
        "id long, tags map<string,string>, complete boolean",
    )
    got = {r["id"]: r["tags_out"].get("ok") for r in compile_rules(rules, df).collect()}
    assert got == {1: "yes", 2: "yes", 3: None}
    for comp, want in ((True, "yes"), (None, "yes"), (False, None)):
        _, tags = interpret(rules, {"highway": "a"}, geom={"complete": comp}, el={"id": 9, "kind": "way"})
        assert tags.get("ok") == want, comp
