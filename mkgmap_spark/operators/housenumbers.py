"""Housenumber interval generation.

Reference: osmstyle/housenumber/HousenumberGenerator.java — after the
kNN house->road match (operators/knn.py provides that stage), houses
along each road are sorted by their projected position and each road
side gets numbering intervals with a NumberStyle: ODD / EVEN / BOTH
and start/end numbers in travel direction (the Garmin NET numbering
model, imgfmt/app/net/Numbers).

Engine form: the matching is the cell-ring kNN join; the interval
derivation is one aggregation — groupBy(road, side) with
min_by/max_by over the projection parameter, and a parity vote for
the style.  Pure JVM aggregation (SQL-oracle-able).  Divergence
documented: the reference splits a road into multiple intervals when
the number sequence reverses or interleaves
(HousenumberRoad.checkIntervals); we emit one interval per (road,
side) — the dominant case — and expose the violation count so a
caller can split further.

side assignment: sign of the cross product of the road segment
direction with the house offset (left = positive), the same
left/right definition HousenumberGenerator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_houses(houses: DataFrame, roads: DataFrame) -> DataFrame:
    """Project matched houses onto their road's segments.

    houses: (house_id, number, road_id, hy, hx); roads: (road_id,
    lats, lons).  Output adds ``t`` (position along the road: segment
    index + fraction, exact rational compare via scaled bigint) and
    ``side`` ('L'/'R' by cross-product sign, 'ON' when collinear).
    Equi join on road_id + JVM array math over the packed arrays."""
    j = houses.join(roads.select("road_id", "lats", "lons"), "road_id")
    # per segment i: frac = clamp(dot(h-a, b-a) / |b-a|^2, 0, 1),
    # d2 = |h - (a + frac*(b-a))|^2; argmin over segments (first wins
    # on ties).  Double arithmetic (coords overflow exact int64 here);
    # the cross product for the side stays exact int64.
    frac = (
        "greatest(0D, least(1D, "
        "((hy - lats[i]) * (lats[i+1] - lats[i]) + (hx - lons[i]) * (lons[i+1] - lons[i])) "
        "/ greatest(1D, cast((lats[i+1] - lats[i]) * (lats[i+1] - lats[i]) "
        "+ (lons[i+1] - lons[i]) * (lons[i+1] - lons[i]) as double))))"
    )
    d2 = (
        f"(pow(hy - (lats[i] + (lats[i+1] - lats[i]) * {frac}), 2) "
        f"+ pow(hx - (lons[i] + (lons[i+1] - lons[i]) * {frac}), 2))"
    )
    cross = (
        "(cast(lons[i+1] as bigint) - lons[i]) * (cast(hy as bigint) - lats[i]) "
        "- (cast(lats[i+1] as bigint) - lats[i]) * (cast(hx as bigint) - lons[i])"
    )
    acc_t = "struct<i: int, d2: double, t: double, cross: bigint>"
    seg = F.expr(
        f"""
        aggregate(
          transform(sequence(0, size(lats) - 2), i -> named_struct(
            'i', cast(i as int),
            'd2', {d2},
            't', cast(i as double) + {frac},
            'cross', {cross})),
          cast(null as {acc_t}),
          (acc, s) -> if(acc is null or s.d2 < acc.d2, s, acc)
        )
        """
    )
    out = j.withColumn("_seg", seg).filter(F.col("_seg").isNotNull())
    return out.select(
        "house_id",
        "number",
        "road_id",
        F.col("_seg.t").alias("t"),
        F.when(F.col("_seg.cross") > 0, F.lit("L"))
        .when(F.col("_seg.cross") < 0, F.lit("R"))
        .otherwise(F.lit("ON"))
        .alias("side"),
    )


def housenumber_intervals(projected: DataFrame) -> DataFrame:
    """(house_id, number, road_id, t, side) -> one numbering interval
    per (road_id, side): NumberStyle O/E/B, start/end numbers in travel
    direction, house count, and the count of order violations (where
    the number sequence is non-monotonic — split_intervals below cuts
    there)."""
    from pyspark.sql import Window

    w = Window.partitionBy("road_id", "side").orderBy("t", "house_id")
    d = projected.withColumn("_prev", F.lag("number").over(w))
    first_dir = F.when(
        F.col("_prev").isNotNull(), F.signum(F.col("number") - F.col("_prev"))
    )
    d = d.withColumn("_step", first_dir)
    return (
        d.groupBy("road_id", "side")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_houses"),
            F.when(F.max(F.pmod("number", F.lit(2))) == 0, F.lit("E"))
            .when(F.min(F.pmod("number", F.lit(2))) == 1, F.lit("O"))
            .otherwise(F.lit("B"))
            .alias("style"),
            F.min_by("number", F.struct("t", "house_id")).cast("int").alias("start_num"),
            F.max_by("number", F.struct("t", "house_id")).cast("int").alias("end_num"),
            # order violations: sign changes in the number sequence
            (
                F.sum(F.when(F.col("_step") > 0, 1).otherwise(0))
                * F.sum(F.when(F.col("_step") < 0, 1).otherwise(0))
                > 0
            ).alias("needs_split"),
        )
        .select("road_id", "side", "style", "start_num", "end_num", "n_houses", "needs_split")
    )


def housenumber_intervals_split(projected: DataFrame) -> DataFrame:
    """Multi-interval variant (HousenumberRoad.checkIntervals
    semantics): a new interval starts wherever the number sequence
    REVERSES direction along the road side — each interval is then
    monotonic and Garmin-encodable.  Pure window arithmetic: direction
    per step, interval id = running count of direction flips.

    Output: (road_id, side, interval, style, start_num, end_num,
    n_houses, t_start, t_end)."""
    from pyspark.sql import Window

    w = Window.partitionBy("road_id", "side").orderBy("t", "house_id")
    d = projected.withColumn("_prev", F.lag("number").over(w))
    step = F.when(F.col("_prev").isNotNull(), F.signum(F.col("number") - F.col("_prev")))
    d = d.withColumn("_step", step)
    # carry the last NON-ZERO direction forward (equal numbers don't
    # establish a direction), then flag flips
    dirn = F.last(F.when(F.col("_step") != 0, F.col("_step")), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_dir", dirn)
    prev_dir = F.lag("_dir").over(w)
    flip = F.when(
        prev_dir.isNotNull() & F.col("_dir").isNotNull() & (F.col("_dir") != prev_dir), 1
    ).otherwise(0)
    d = d.withColumn("_interval", F.sum(flip).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        d.groupBy("road_id", "side", F.col("_interval").cast("int").alias("interval"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_houses"),
            F.when(F.max(F.pmod("number", F.lit(2))) == 0, F.lit("E"))
            .when(F.min(F.pmod("number", F.lit(2))) == 1, F.lit("O"))
            .otherwise(F.lit("B"))
            .alias("style"),
            F.min_by("number", F.struct("t", "house_id")).cast("int").alias("start_num"),
            F.max_by("number", F.struct("t", "house_id")).cast("int").alias("end_num"),
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
        )
        .select(
            "road_id", "side", "interval", "style", "start_num", "end_num",
            "n_houses", "t_start", "t_end",
        )
    )
