"""Isolated per-query profiler: times query construction (eager driver
work + materializations) separately from the final action, repeated N
times warm in one session.  Not part of the frozen bench contract.

Usage: python scripts/profile_query.py q1,q2,... [repeats]
"""
from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mkgmap_spark.queries import QUERIES
    from mkgmap_spark.session import get_spark

    spark = get_spark(
        app_name="mkgmap_spark_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else None,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    @F.pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    wdf = spark.range(0, 10_000, 1, int(cpus) if cpus.isdigit() else 8)
    (
        wdf.withColumn("w", _warm(F.col("id")))
        .groupBy(F.col("id") % 97)
        .agg(F.sum("w").alias("s"))
        .withColumn("r", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("s")))
        .count()
    )

    def release() -> None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)

    for name in names:
        fn = QUERIES[name]
        for r in range(repeats):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: construct")
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: count")
            n = df.count()
            t2 = time.perf_counter()
            print(
                f"{name} run{r}: construct={t1 - t0:.3f}s count={t2 - t1:.3f}s "
                f"total={t2 - t0:.3f}s rows={n}",
                flush=True,
            )
            release()
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
