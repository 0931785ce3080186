"""POI generation from areas and lines (--add-pois-to-areas /
--add-pois-to-lines).

Reference: reader/osm/POIGeneratorHook.java —

- areas (:236-263): the POI sits on the highest-priority *labeling
  node* found on the polygon ring — priority = position of the node's
  matching tag in the ``pois-to-areas-placement`` list (default
  ``entrance=main;entrance=yes;building=entrance``, :101-149), ties
  broken by earliest ring position — else on the area's centre of
  gravity (Way.getCofG:193-209: mean of the ring points, last point
  excluded when it repeats the first).  The POI carries the polygon's
  tags plus ``mkgmap:area2poi=true``.
- lines (:266-330): one POI per line point — first (``line2poitype=
  start``), last (``end``), each inner point that differs from its
  predecessor (``inner``) — plus a ``mid`` POI interpolated at half
  the line's length.  All carry ``mkgmap:line2poi=true``.

Spark form: everything is Column arithmetic over the packed coord
arrays (posexplode for the ring-label join, one aggregate() fold per
line for the midpoint walk).  Divergences, shared with the SQL
oracles: centre of gravity rounds half-up as floor((2*sum + n) /
(2*n)) over exact int64 operands (IEEE division + floor are correctly
rounded, so the value is bit-identical in any engine) instead of the
reference's high-precision Coord average; the default segment length
is the equirectangular estimate with the longitude delta wrapped the
short way around, WITHOUT the reference's >=10 km rhumb-line switch
(Coord.distance:432-473) — mid POIs on lines with very long segments
may differ; and ``planar=True`` swaps the equirectangular cos()
(not IEEE-specified, differs across engines) for the planar integer
length, which is bit-reproducible anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PLACEMENT = [("entrance", "main"), ("entrance", "yes"), ("building", "entrance")]

_MU = 2.0 * 3.141592653589793 / (1 << 24)  # map units -> radians


def areas_to_pois(
    polygons: DataFrame,
    nodes: DataFrame,
    placement: list[tuple[str, str | None]] | None = None,
) -> DataFrame:
    """polygons: (id, tags, lats, lons); nodes: (id, tags, lat, lon).
    Output: (id, tags, lat, lon) — one POI per polygon, tags include
    mkgmap:area2poi=true."""
    placement = DEFAULT_PLACEMENT if placement is None else placement

    # labeling nodes with their placement order (first match wins)
    order = None
    for i, (k, v) in enumerate(placement):
        cond = (
            F.col("tags").getItem(k).isNotNull()
            if v is None
            else F.col("tags").getItem(k).eqNullSafe(F.lit(v))
        )
        order = F.when(cond, i) if order is None else order.when(cond, i)
    labels = (
        nodes.select(
            F.col("lat").alias("_ly"), F.col("lon").alias("_lx"),
            (order if order is not None else F.lit(None)).alias("_ord"),
        )
        .filter(F.col("_ord").isNotNull())
        # several nodes may share a coordinate: keep the best order
        .groupBy("_ly", "_lx")
        .agg(F.min("_ord").alias("_ord"))
    )

    pts = polygons.select(
        "id", F.posexplode(F.arrays_zip("lats", "lons")).alias("_pos", "_p")
    ).select(
        "id", "_pos",
        F.col("_p.lats").alias("_ly"), F.col("_p.lons").alias("_lx"),
    )
    best = (
        pts.join(labels, ["_ly", "_lx"])
        .groupBy("id")
        .agg(
            F.min_by(
                F.struct(F.col("_ly").alias("y"), F.col("_lx").alias("x")),
                F.struct("_ord", "_pos"),
            ).alias("_label")
        )
    )

    # centre of gravity: ring points excluding a repeated closing point
    n_eff = F.expr(
        "size(lats) - if(size(lats) > 1 and lats[0] = lats[size(lats)-1] "
        "and lons[0] = lons[size(lons)-1], 1, 0)"
    )
    def rounded_avg(sum_expr: str) -> F.Column:
        # round-half-up via floor((2s + n) / 2n): both operands are
        # exact int64 well under 2^53, and IEEE double division and
        # floor are correctly rounded — bit-identical in any engine
        return F.expr(
            f"cast(floor((2 * {sum_expr} + _n) / cast(2 * _n as double)) as int)"
        )

    # empty coordinate arrays: the reference's getCofG returns null
    # (Way.java:194-196); here the polygon simply emits no POI instead
    # of aborting the job on ANSI divide-by-zero
    withn = polygons.filter(F.expr("size(lats) > 0")).withColumn("_n", n_eff)
    sy = f"aggregate(slice(lats, 1, _n), 0L, (a, x) -> a + x)"
    sx = f"aggregate(slice(lons, 1, _n), 0L, (a, x) -> a + x)"
    out = (
        withn.join(best, "id", "left")
        .select(
            "id",
            F.map_concat(
                F.expr("map_filter(tags, (k, v) -> k != 'mkgmap:area2poi')"),
                F.create_map(F.lit("mkgmap:area2poi"), F.lit("true")),
            ).alias("tags"),
            F.coalesce(F.col("_label.y"), rounded_avg(sy)).alias("lat"),
            F.coalesce(F.col("_label.x"), rounded_avg(sx)).alias("lon"),
        )
    )
    return out


def lines_to_pois(lines: DataFrame, planar: bool = False) -> DataFrame:
    """lines: (id, tags, lats, lons).  Output: (id, tags, lat, lon,
    poi_type in start|end|inner|mid) with mkgmap:line2poi=true.

    ``planar=True``: segment lengths without the equirectangular cos()
    latitude scaling — every op IEEE-specified, so the result is
    bit-identical in any engine (the driver-oracle twin).  The default
    is the reference's equirectangular estimate with short-way
    longitude wrapping; see the module docstring for the >=10 km
    rhumb-line divergence."""
    tagged = lines.select(
        "id",
        F.map_concat(
            F.expr("map_filter(tags, (k, v) -> k not in ('mkgmap:line2poi', 'mkgmap:line2poitype'))"),
            F.create_map(F.lit("mkgmap:line2poi"), F.lit("true")),
        ).alias("tags"),
        "lats",
        "lons",
    )
    # midpoint at half the cumulative length: one aggregate() fold per
    # line walks the segments (POIGeneratorHook:331-357)
    if planar:
        # widen BEFORE squaring: int32 coordinate deltas square past
        # 2^31 and ANSI mode throws on the overflow
        seg = (
            "sqrt(cast(cast(lats[i] - lats[i-1] as bigint) * (lats[i] - lats[i-1]) "
            "+ cast(lons[i] - lons[i-1] as bigint) * (lons[i] - lons[i-1]) as double))"
        )
    else:
        half = 1 << 23  # half the lon range: wrap deltas the short way
        dlon = (
            f"(pmod(cast(lons[i] - lons[i-1] as bigint) + {half}, {2 * half}) - {half})"
        )
        seg = (
            f"sqrt(pow(cast(lats[i] - lats[i-1] as double) * {_MU!r}, 2) + "
            f"pow(cast({dlon} as double) * {_MU!r} * "
            f"cos((cast(lats[i-1] as double) + lats[i]) * {_MU!r} / 2), 2))"
        )
    # guard: sequence(1, 0) would be the DESCENDING [1, 0], so gate the
    # distance array on size >= 2 (single-point lines get no mid POI)
    dists = (
        "if(size(lats) >= 2, "
        f"transform(sequence(1, size(lats) - 1), i -> {seg}), "
        "array())"
    )
    walk = (
        "aggregate(_d, "
        "named_struct('rem', _half, 'done', false, 'i', 0), "
        "(a, d) -> if(a.done, a, "
        # d = 0 on degenerate all-equal-point lines: frac 0, not 0/0
        "  if(a.rem <= d, named_struct('rem', if(d = 0D, 0D, a.rem / d), 'done', true, 'i', a.i), "
        "     named_struct('rem', a.rem - d, 'done', false, 'i', a.i + 1))))"
    )
    # ONE pass over the lines: start, end, deduped inner points and the
    # midpoint collect into a single per-line POI array exploded once —
    # the earlier four-branch union scanned the input (and re-derived
    # the tag map) four times for the same rows
    inner_arr = (
        "if(size(lats) > 2, "
        "filter(transform(sequence(1, size(lats) - 2), i -> "
        "named_struct('y', lats[i], 'x', lons[i], "
        "'dup', lats[i] = lats[i-1] and lons[i] = lons[i-1])), "
        "p -> not p.dup), "
        "array())"
    )
    pois = (
        "concat("
        "array(named_struct('y', lats[0], 'x', lons[0], 't', 'start')), "
        "array(named_struct('y', lats[size(lats)-1], 'x', lons[size(lons)-1], 't', 'end')), "
        f"transform({inner_arr}, p -> named_struct('y', p.y, 'x', p.x, 't', 'inner')), "
        "if(_w.done, array(named_struct("
        "'y', cast(floor(lats[_w.i] + _w.rem * (lats[_w.i + 1] - lats[_w.i]) + 0.5d) as int), "
        "'x', cast(floor(lons[_w.i] + _w.rem * (lons[_w.i + 1] - lons[_w.i]) + 0.5d) as int), "
        "'t', 'mid')), array()))"
    )
    return (
        tagged
        # materialize the lengths once: lambda-bearing expressions are
        # excluded from subexpression elimination (SPARK-35410), so
        # inlining dists in both aggregates doubles the sqrt work
        .withColumn("_d", F.expr(dists))
        .withColumn("_half", F.expr("aggregate(_d, 0D, (a, d) -> a + d) / 2"))
        .withColumn("_w", F.expr(walk))
        .select("id", "tags", F.explode(F.expr(pois)).alias("_p"))
        .select(
            "id",
            F.map_concat(
                F.col("tags"),
                F.create_map(F.lit("mkgmap:line2poitype"), F.col("_p.t")),
            ).alias("tags"),
            F.col("_p.y").alias("lat"),
            F.col("_p.x").alias("lon"),
            F.col("_p.t").alias("poi_type"),
        )
    )
