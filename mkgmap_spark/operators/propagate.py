"""Iterative graph propagation along connected ways.

Reference: LinkDestinationHook (reader/osm/LinkDestinationHook.java) —
`destination` tags copied from *_link chains onto adjacent ways; a
small fixed-depth graph traversal.

Spark re-expression: an iterative self-join on shared endpoints, depth
bounded (link chains are short); each round is one equi-join on the
endpoint key + one aggregation. The same pattern serves the
nearest-city/locator back-propagation and any bounded label spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_labels(
    ways: DataFrame,
    label_col: str = "destination",
    max_depth: int = 3,
) -> DataFrame:
    """ways: (id, lats, lons, <label_col> nullable).  Unlabeled ways
    adopt the min label of any labeled way sharing an endpoint,
    repeated ``max_depth`` times.  Deterministic (min), no UDFs."""
    pts = ways.select(
        "id",
        F.col(label_col).alias("_lbl"),
        F.explode(
            F.array(
                F.struct(F.expr("lats[0]").alias("y"), F.expr("lons[0]").alias("x")),
                F.struct(
                    F.expr("lats[size(lats) - 1]").alias("y"),
                    F.expr("lons[size(lons) - 1]").alias("x"),
                ),
            )
        ).alias("p"),
    ).select("id", "_lbl", (F.col("p.y").cast("long") * (1 << 32) + F.col("p.x")).alias("ep"))

    cur = pts
    for _ in range(max_depth):
        labeled = cur.filter(F.col("_lbl").isNotNull()).groupBy("ep").agg(
            F.min("_lbl").alias("_nb")
        )
        cur = (
            cur.join(labeled, "ep", "left")
            .withColumn("_lbl", F.coalesce(F.col("_lbl"), F.col("_nb")))
            .drop("_nb")
        )
        # a label reaching one endpoint belongs to the whole way:
        # spread it to the way's other endpoint before the next hop
        per_id = cur.groupBy("id").agg(F.min("_lbl").alias("_wl"))
        cur = (
            cur.join(per_id, "id")
            .withColumn("_lbl", F.coalesce(F.col("_lbl"), F.col("_wl")))
            .drop("_wl")
        )
    out = cur.groupBy("id").agg(F.min("_lbl").alias(label_col))
    return out
