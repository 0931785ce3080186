"""global_rank / global_cumsum — the range-partitioned exclusive-scan
helpers every former single-partition window now rides on."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from mkgmap_spark.functions.rank import global_cumsum, global_rank


def test_global_rank_matches_global_window(spark):
    rng = random.Random(42)
    rows = [(rng.randrange(10**9), i) for i in range(5000)]
    # unique keys required (ties make any distributed rank ambiguous)
    rows = [(k * 10000 + i, i) for (k, i) in rows]
    df = spark.createDataFrame(rows, "k long, payload int")
    got = {
        r["k"]: r["idx"]
        for r in global_rank(df, ["k"], out="idx", num_partitions=7).collect()
    }
    want = {
        r["k"]: r["idx"]
        for r in df.withColumn(
            "idx", F.row_number().over(Window.orderBy("k")).cast("long")
        ).collect()
    }
    assert got == want


def test_global_rank_composite_key_and_empty(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 9), ("a", 1), ("c", 5)], "s string, n int"
    )
    out = {
        (r["s"], r["n"]): r["idx"]
        for r in global_rank(df, ["s", "n"], num_partitions=3).collect()
    }
    assert out == {("a", 1): 1, ("a", 9): 2, ("b", 2): 3, ("c", 5): 4}
    empty = df.limit(0)
    assert global_rank(empty, ["s", "n"]).count() == 0


def test_global_cumsum_matches_global_window(spark):
    rng = random.Random(7)
    rows = [(i * 3 + 1, rng.randrange(1, 1000)) for i in range(4000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cumsum"]
        for r in global_cumsum(df, ["k"], "v", num_partitions=9).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["c"]
        for r in df.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
        ).collect()
    }
    assert got == want
    # exclusive: first key's prefix is 0
    first = min(k for k, _ in rows)
    assert got[first] == 0
