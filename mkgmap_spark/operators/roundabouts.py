"""Roundabout direction checking and drive-on-side detection.

Reference: osmstyle/StyledConverter.java —

- ``--check-roundabouts`` (checkRoundabout:963-1020): for every third
  segment of a roundabout ring, vote +1 when the ring's centre of
  gravity lies to the LEFT of the segment (bearing difference in
  [15°, 165°)), −1 when to the right; dir > 0 means clockwise; a
  roundabout is flagged when its rotation contradicts the driving
  side (drive-on-left needs clockwise, :1005-1012).  Segments shorter
  than 2.5 m or nearly collinear with the centre are skipped.
- ``--drive-on=detect`` (calcDrivingSide:758-792): count roads whose
  country drives left vs right (the LocationHook country join
  supplies the side); detect left iff L > R + unknown, right iff
  R > L + unknown, else the configured fallback.

Spark form: pure Column folds over the packed coord arrays — one
aggregate() per ring for the vote, one global aggregate for the side
counts.  ``planar=True`` replaces the trigonometric trust window with
the exact-integer cross-product sign (every ring segment votes unless
degenerate): bit-reproducible in any engine, used by the driver
oracle; the default path keeps the reference's bearing windows AND
its 2.5 m segment/centre distance skip (the planar path deliberately
omits the skip — its exact votes are noise-free by construction).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MU = 2.0 * math.pi / (1 << 24)
# metres per map unit at the equator: Coord.U / 2^24 with
# U = 2*pi*R, R = 6378137 (WGS84, Coord.java:60-61)
_M_PER_UNIT = 2.0 * math.pi * 6378137.0 / (1 << 24)
# checkRoundabout skips segments where pi.distance(centre) <= 2.5 m or
# pi.distance(pi1) <= 2.5 m (StyledConverter.java:983); squared
# threshold in map-unit^2 for the equirect distance
_MIN_D2_UNITS = (2.5 / _M_PER_UNIT) ** 2


def check_roundabouts(
    ways: DataFrame, drive_on_left: bool, planar: bool = False
) -> DataFrame:
    """ways: (id, lats, lons) closed roundabout rings (closing point
    repeated).  Output: (id, dir_votes, clockwise, wrong_direction)."""
    # centre of gravity over the distinct ring points (closing dup
    # excluded) — the integer round-half-up shared with poi_gen
    n = "(size(lats) - 1)"
    cy = f"cast(floor((2 * aggregate(slice(lats, 1, {n}), 0L, (a, v) -> a + v) + {n}) / cast(2 * {n} as double)) as long)"
    cx = f"cast(floor((2 * aggregate(slice(lons, 1, {n}), 0L, (a, v) -> a + v) + {n}) / cast(2 * {n} as double)) as long)"

    if planar:
        # cross((p1 - p0), (centre - p0)) sign; exact int64.  cross < 0
        # = centre RIGHT of travel = clockwise = +1, matching the
        # reference's positive bearing-difference vote
        cross = (
            "(cast(lons[i+1] - lons[i] as bigint) * (_cy - lats[i]) "
            "- cast(lats[i+1] - lats[i] as bigint) * (_cx - lons[i]))"
        )
        vote = f"if({cross} < 0, 1, if({cross} > 0, -1, 0))"
    else:
        # the reference's bearing-window vote (trig — pytest only).
        # bearing() in map units; equirect-scaled x like Coord.bearingTo
        def bear(y1, x1, y2, x2):
            return (
                f"degrees(atan2(cast({x2} - {x1} as double) * cos(cast({y1} as double) * {_MU!r}), "
                f"cast({y2} - {y1} as double)))"
            )

        a = bear("lats[i]", "lons[i]", "lats[i+1]", "lons[i+1]")
        b = bear("lats[i]", "lons[i]", "_cy", "_cx")
        diff = f"(pmod({b} - ({a}) + 180D, 360D) - 180D)"

        # segment/centre 2.5 m guards (StyledConverter.java:983):
        # equirect squared distance in map units, cos at the segment
        # start like Coord.distance's flat-earth approximation
        def d2(y2, x2):
            return (
                f"(pow(cast({y2} - lats[i] as double), 2D) + "
                f"pow(cast({x2} - lons[i] as double) * cos(cast(lats[i] as double) * {_MU!r}), 2D))"
            )

        guard = (
            f"({d2('_cy', '_cx')} > {_MIN_D2_UNITS!r} and "
            f"{d2('lats[i+1]', 'lons[i+1]')} > {_MIN_D2_UNITS!r})"
        )
        vote = (
            f"if({guard}, if({diff} >= 15D and {diff} < 165D, 1, "
            f"if({diff} <= -15D and {diff} > -165D, -1, 0)), 0)"
        )

    # every third segment (i += 3, checkRoundabout:977)
    votes = (
        f"aggregate(filter(sequence(0, size(lats) - 2), i -> i % 3 = 0), 0, "
        f"(acc, i) -> acc + {vote})"
    )
    d = (
        ways.filter(F.expr("size(lats) > 3"))
        .withColumn("_cy", F.expr(cy))
        .withColumn("_cx", F.expr(cx))
        .withColumn("dir_votes", F.expr(votes))
    )
    clockwise = F.col("dir_votes") > 0
    wrong = (
        (clockwise == F.lit(False)) if drive_on_left else (clockwise == F.lit(True))
    )
    return d.select(
        "id",
        "dir_votes",
        clockwise.alias("clockwise"),
        F.when(F.col("dir_votes") != 0, wrong).otherwise(F.lit(False)).alias(
            "wrong_direction"
        ),
    )


def detect_drive_side(
    roads: DataFrame, side_col: str = "drive_side", fallback: str = "right"
) -> bool:
    """calcDrivingSide detect rule over per-road driving sides
    ('left' / 'right' / null = unknown country)."""
    row = roads.agg(
        F.sum(F.when(F.col(side_col) == "left", 1).otherwise(0)).alias("l"),
        F.sum(F.when(F.col(side_col) == "right", 1).otherwise(0)).alias("r"),
        F.sum(F.when(F.col(side_col).isNull(), 1).otherwise(0)).alias("u"),
    ).collect()[0]
    left, right, unknown = int(row["l"] or 0), int(row["r"] or 0), int(row["u"] or 0)
    if left > right + unknown:
        return True
    if right > left + unknown:
        return False
    return fallback == "left"
