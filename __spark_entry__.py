"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship tile-assignment pipeline on sf0.001.
queries()     -> 56 operator queries from SURVEY.md §2 (mkgmap_spark/queries.py).
oracle_sql()  -> 56 matching DuckDB SQL twins — every query is fully
                 SQL-oracled.  tile_assign's twin embeds the quadtree
                 precomputed by the independent element-at-a-time
                 oracle for each gate scale (self-selected by lineitem
                 row count; scripts/gen_tile_oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic points from sf0.001 lineitem -> quadtree
    split -> tile assignment; returns per-tile membership counts."""
    from pyspark.sql import functions as F

    from mkgmap_spark.queries import q_tile_assign

    members = q_tile_assign(spark, "/root/testdata/sf0.001")
    return (
        members.groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n_features"), F.min("id").alias("min_feature_id"))
        .orderBy("tile_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mkgmap_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mkgmap_spark.queries import ORACLES

    return dict(ORACLES)
