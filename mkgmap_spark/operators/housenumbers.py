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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metres per degree at the equator: Coord.U / 360 (Coord.java:60-61)
_M_PER_DEG = 2.0 * math.pi * 6378137.0 / 360.0
# degrees per 24-bit map unit
_DEG_PER_UNIT = 360.0 / (1 << 24)
_RAD_PER_DEG = math.pi / 180.0


def interpolate_housenumbers(
    interp_ways: DataFrame,
    addr_nodes: DataFrame,
    metric: str = "equirect",
) -> DataFrame:
    """Synthesize intermediate house nodes along ``addr:interpolation``
    ways (HousenumberGenerator.interpretInterpolationWay:342-438 +
    HousenumberIvl.calcSteps:103 / getInterpolatedPoints:371-418).

    interp_ways: (way_id, method, lats, lons) — method is the
    addr:interpolation value; addr_nodes: (node_id, number, street,
    y, x) — addressed nodes; membership is by exact coordinate match
    against the way's points (the table re-expression of the hook's
    node-id list, HousenumberHooks.mkgmapNodeIdsTagKey).

    Semantics carried over:
    - method all/1 -> step 1; even/odd/2 -> step 2; others ignored;
    - consecutive addressed-node pairs along the way with the SAME
      non-null street form intervals; steps = |end-start|/step - 1
      synthesized numbers per interval (calcSteps);
    - different street names between intervals reject the WHOLE way,
      as does an even/odd method with a wrong-parity endpoint
      (interpretInterpolationWay returns before registering any
      interval in both cases);
    - houses are spaced evenly ALONG the sub-polyline between the
      pair: interval length = polyline length / (steps+1), walking
      segments (getInterpolatedPoints); an interval shorter than
      0.1 m generates nothing;
    - numbers run start + k*step towards end.

    ``metric``: 'equirect' (default) measures segment lengths in
    metres with the reference's flat-earth formula (U/360 * sqrt in
    degrees, cos of mean latitude — Coord.distanceInDegreesSquared);
    'planar' measures in raw map units (bit-stable across engines,
    used by the SQL-oracled driver query; the 0.1 m guard then
    applies in map units, i.e. effectively off).

    Divergence (documented): interpolated coords round to 24-bit map
    units directly instead of the reference's 30-bit high-precision
    intermediate (makeBetweenPoint); positions can differ by <= half
    a map unit.

    Output: (way_id, pair_idx, number, street, lat, lon,
    interpolated=true) — one row per synthesized house, ready to
    union with real houses ahead of the kNN road match.
    """
    step_expr = (
        "CASE method WHEN 'all' THEN 1 WHEN '1' THEN 1 "
        "WHEN 'even' THEN 2 WHEN 'odd' THEN 2 WHEN '2' THEN 2 ELSE 0 END"
    )
    ways = interp_ways.withColumn("step", F.expr(step_expr)).filter(F.col("step") > 0)

    # addressed nodes located on the way, ordered by point position
    pts = ways.select(
        "way_id",
        F.posexplode(F.arrays_zip("lats", "lons")).alias("pos", "_p"),
    ).select("way_id", "pos", F.col("_p.lats").alias("y"), F.col("_p.lons").alias("x"))
    on_way = pts.join(
        addr_nodes.select(
            F.col("y").alias("ny"), F.col("x").alias("nx"), "number", "street"
        ),
        (F.col("y") == F.col("ny")) & (F.col("x") == F.col("nx")),
    )
    seqs = on_way.groupBy("way_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "number", "street"))).alias("hn")
    )
    d = ways.join(seqs, "way_id")

    # eligible pairs: consecutive addressed nodes sharing a non-null street
    pairs_expr = (
        "filter(transform(sequence(0, size(hn) - 2), i -> named_struct("
        "'pos1', hn[i].pos, 'pos2', hn[i + 1].pos, "
        "'start', hn[i].number, 'end', hn[i + 1].number, "
        "'street', hn[i].street, 'street2', hn[i + 1].street)), "
        "p -> p.pos2 > p.pos1 and p.street is not null and p.street2 is not null "
        "and p.street = p.street2)"
    )
    d = d.withColumn("_pairs", F.expr(pairs_expr)).filter(F.expr("size(_pairs) > 0"))

    # whole-way rejections (interpretInterpolationWay's early returns)
    one_street = "size(array_distinct(transform(_pairs, p -> p.street))) <= 1"
    parity_ok = (
        "not (method = 'even' and exists(_pairs, p -> p.start % 2 != 0 or p.end % 2 != 0)) "
        "and not (method = 'odd' and exists(_pairs, p -> p.start % 2 = 0 or p.end % 2 = 0))"
    )
    d = d.filter(F.expr(one_street)).filter(F.expr(parity_ok))

    pair = d.select(
        "way_id",
        "step",
        "lats",
        "lons",
        F.posexplode("_pairs").alias("pair_idx", "p"),
    ).select(
        "way_id",
        "pair_idx",
        "step",
        "lats",
        "lons",
        F.col("p.pos1").alias("pos1"),
        F.col("p.pos2").alias("pos2"),
        F.col("p.start").alias("start"),
        F.col("p.end").alias("end"),
        F.col("p.street").alias("street"),
    )
    pair = pair.withColumn(
        "steps", F.expr("cast(abs(end - start) / step as int) - 1")
    ).filter(F.col("steps") >= 1)

    # segment length i -> i+1 (0-based within pos1..pos2-1)
    if metric == "planar":
        seglen = (
            "sqrt(pow(cast(lats[pos1 + j + 1] - lats[pos1 + j] as double), 2D) + "
            "pow(cast(lons[pos1 + j + 1] - lons[pos1 + j] as double), 2D))"
        )
        min_ivl = 0.0
    else:
        dlat = f"(cast(lats[pos1 + j + 1] - lats[pos1 + j] as double) * {_DEG_PER_UNIT!r})"
        dlon = f"(cast(lons[pos1 + j + 1] - lons[pos1 + j] as double) * {_DEG_PER_UNIT!r})"
        cosavg = (
            f"cos({_RAD_PER_DEG!r} * abs(cast(lats[pos1 + j] + lats[pos1 + j + 1] as double)"
            f" * {_DEG_PER_UNIT!r} / 2D))"
        )
        seglen = f"({_M_PER_DEG!r} * sqrt(pow({dlat}, 2D) + pow({dlon} * {cosavg}, 2D)))"
        min_ivl = 0.1

    # cumulative lengths: cum[1] = 0, cum[j+2] = length through segment j
    cum = (
        f"aggregate(sequence(0, pos2 - pos1 - 1), array(0D), "
        f"(acc, j) -> acc || array(element_at(acc, -1) + {seglen}))"
    )
    pair = pair.withColumn("_cum", F.expr(cum)).withColumn(
        "_ivl", F.expr("element_at(_cum, -1) / (steps + 1)")
    )
    if min_ivl > 0:
        pair = pair.filter(F.col("_ivl") >= min_ivl)

    # per k: distance k*_ivl -> segment j (first with cum end >= d),
    # linear interpolation inside it; usedStep signs towards `end`
    houses = (
        "transform(sequence(1, steps), k -> named_struct("
        "'number', start + k * step * if(end >= start, 1, -1), "
        "'j', coalesce(array_min(filter(sequence(0, pos2 - pos1 - 1), "
        "     j -> element_at(_cum, j + 2) >= k * _ivl)), pos2 - pos1 - 1), "
        "'d', k * _ivl))"
    )
    out = pair.select(
        "way_id",
        "pair_idx",
        "street",
        "lats",
        "lons",
        "pos1",
        "_cum",
        F.explode(F.expr(houses)).alias("h"),
    )
    frac = (
        "if(element_at(_cum, h.j + 2) - element_at(_cum, h.j + 1) <= 0D, 0D, "
        "(h.d - element_at(_cum, h.j + 1)) / "
        "(element_at(_cum, h.j + 2) - element_at(_cum, h.j + 1)))"
    )
    return out.select(
        "way_id",
        "pair_idx",
        F.col("h.number").cast("int").alias("number"),
        "street",
        F.expr(
            f"cast(round(lats[pos1 + h.j] + (lats[pos1 + h.j + 1] - lats[pos1 + h.j]) * {frac}) as int)"
        ).alias("lat"),
        F.expr(
            f"cast(round(lons[pos1 + h.j] + (lons[pos1 + h.j + 1] - lons[pos1 + h.j]) * {frac}) as int)"
        ).alias("lon"),
        F.lit(True).alias("interpolated"),
    )


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


# ------------------------------------------------------------------
# Garmin number-interval spec (imgfmt/app/net/Numbers.java)
# ------------------------------------------------------------------

# max plausible |start - end| (Numbers.java:28, per NumberPreparer)
NUMBERS_MAX_DELTA = 131071


class Numbers:
    """The reference's per-node numbering interval record, as written
    by the Polish reader's ``Numbers<i>=`` lines and produced by the
    housenumber generator:

        node,leftStyle,leftStart,leftEnd,rightStyle,rightStart,rightEnd
        [,leftZip,rightZip[,city info...]]

    Styles: N one, E ven, O dd, B oth ('0' tolerated as O,
    NumberStyle.fromChar).  Implements the reference's plausibility
    checks (style/parity per side, interval overlap between sides
    unless zip/city distinguish them, the single-number-both-sides
    exemption) and per-number matching (Numbers.isPlausible:299-353,
    countMatches:367-378, NumDesc.contained:56-70)."""

    def __init__(self, spec: str):
        f = spec.split(",")
        self.node = int(f[0])
        self.left_style = _style_from_char(f[1])
        self.left_start = int(f[2])
        self.left_end = int(f[3])
        self.right_style = _style_from_char(f[4])
        self.right_start = int(f[5])
        self.right_end = int(f[6])
        self.left_zip = f[7] if len(f) > 8 and f[7] != "-1" else None
        self.right_zip = f[8] if len(f) > 8 and f[8] != "-1" else None
        self.left_city = self.right_city = None
        if len(f) > 9:
            pos = 9
            if f[pos] != "-1":
                self.left_city = tuple(f[pos : pos + 3])
                pos = 12
            else:
                pos = 10
            if len(f) > pos and f[pos] != "-1":
                self.right_city = tuple(f[pos : pos + 3])

    def is_plausible(self) -> bool:
        for style, start, end in (
            (self.left_style, self.left_start, self.left_end),
            (self.right_style, self.right_start, self.right_end),
        ):
            if abs(start - end) > NUMBERS_MAX_DELTA:
                return False
            if style == "E" and (start % 2 != 0 or end % 2 != 0):
                return False
            if style == "O" and (start % 2 == 0 or end % 2 == 0):
                return False
        if self.left_style == "N" or self.right_style == "N":
            return True
        if self.left_city is not None:
            if self.left_city != self.right_city:
                return True
        elif self.right_city is not None:
            return True
        if self.left_zip is not None:
            if self.left_zip != self.right_zip:
                return True
        elif self.right_city is not None:  # sic — mirrors :315
            return True
        if (
            self.left_style == self.right_style
            or self.left_style == "B"
            or self.right_style == "B"
        ):
            s1, e1 = sorted((self.left_start, self.left_end))
            s2, e2 = sorted((self.right_start, self.right_end))
            if s2 > e1 or e2 < s1:
                return True
            if (
                self.left_start == self.left_end
                and self.right_start == self.right_end
                and self.left_start == self.right_start
            ):
                return True  # single number on both sides
            return False
        return True

    def _contained(self, hn: int, left: bool) -> bool:
        style, start, end = (
            (self.left_style, self.left_start, self.left_end)
            if left
            else (self.right_style, self.right_start, self.right_end)
        )
        if style == "N":
            return False
        is_even = hn % 2 == 0
        if style == "B" or (style == "E" and is_even) or (style == "O" and not is_even):
            lo, hi = sorted((start, end))
            return lo <= hn <= hi
        return False

    def count_matches(self, hn: int) -> int:
        matches = int(self._contained(hn, True)) + int(self._contained(hn, False))
        if (
            matches > 1
            and self.left_start == self.left_end
            and self.right_start == self.right_end
        ):
            matches = 1  # single number on both sides
        return matches


def _style_from_char(s: str) -> str:
    c = s[0] if s else "N"
    if c == "0":
        return "O"  # zero instead of capital O (NumberStyle.fromChar:64-66)
    return c if c in "NEOB" else "N"


# ------------------------------------------------------------------
# NET numbering bit-stream round trip (imgfmt/app/net/NumberPreparer)
# ------------------------------------------------------------------

_NS_ROUNDTRIP_SCHEMA = (
    "road_id long, node int, l_style string, l_start int, l_end int, "
    "r_style string, r_start int, r_end int"
)


def roundtrip_number_streams(intervals: DataFrame) -> DataFrame:
    """Encode each road's per-node interval records into the Garmin
    NET numbering bit stream and decode them back.

    Input: one row per (road, node) with the polish-format fields
    node / l_style / l_start / l_end / r_style / r_start / r_end.
    Output: the decoded records — equal to the input whenever the
    records are parity-consistent (the reference's own test property,
    NumberPreparerTest / NumberRangeTest).

    Scale shape: one ``collect_list`` per road (bounded by the node
    count of a single road, i.e. tiny), then an Arrow-batched kernel;
    roads are independent, so this is a single keyed exchange followed
    by embarrassingly parallel per-row work — no driver state.
    """
    import pandas as pd

    from ..functions.numbers_codec import (
        BitReader,
        NumberPreparer,
        NumberReader,
        NumberSpec,
    )

    from ..functions.grouped import kernel_partitions

    # explicit repartition pins the kernel's parallelism (the groupBy
    # reuses the partitioning, so this is still ONE exchange) — AQE
    # would otherwise coalesce the tiny shuffle to a single partition
    # and run the whole per-road codec on one core
    grouped = intervals.repartition(kernel_partitions(intervals), "road_id").groupBy(
        "road_id"
    ).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "node", "l_style", "l_start", "l_end",
                    "r_style", "r_start", "r_end",
                )
            )
        ).alias("recs")
    )

    cols = [
        "road_id", "node", "l_style", "l_start", "l_end",
        "r_style", "r_start", "r_end",
    ]

    def kernel(batches):
        for pdf in batches:
            rows = []
            for road_id, recs in zip(pdf["road_id"], pdf["recs"]):
                specs = []
                for r in recs:
                    n = NumberSpec()
                    n.node = int(r["node"])
                    n.index = n.node
                    n.set_numbers(True, r["l_style"], int(r["l_start"]), int(r["l_end"]))
                    n.set_numbers(False, r["r_style"], int(r["r_start"]), int(r["r_end"]))
                    specs.append(n)
                prep = NumberPreparer(specs)
                bw = prep.fetch_bit_stream()
                if not prep.is_valid():
                    # surfaces as an oracle mismatch rather than a crash
                    continue
                nr = NumberReader(BitReader(bw.get_bytes()[: bw.length]))
                nr.set_number_of_nodes(specs[-1].get_index() + 1)
                for d in nr.read_numbers(prep.get_swapped()):
                    rows.append((
                        int(road_id), d.get_index(),
                        d.left_style, d.left_start, d.left_end,
                        d.right_style, d.right_start, d.right_end,
                    ))
            yield pd.DataFrame(rows, columns=cols)

    return grouped.mapInPandas(kernel, _NS_ROUNDTRIP_SCHEMA)
