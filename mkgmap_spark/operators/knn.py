"""k-nearest-neighbour join.

Reference semantics: HousenumberGenerator's RoadSegmentIndex radius/kNN
search over a KdTree (osmstyle/housenumber/HousenumberGenerator.java:
1688-1770, util/KdTree.java:116-143) and the Locator nearest-city lookup
(build/Locator.java:37-40).  A kd-tree is a driver-side structure; the
distributed re-expression is **cell-ring expansion**:

  * index the right side by grid cell (functions/cells.py);
  * round r: each pending left row joins right rows in the cells of its
    Chebyshev ring <= r;
  * a left row is *certified done* once its k-th best squared distance
    <= (r * cell_size)^2 — any point outside ring r is at least
    r*cell_size away, so no better neighbour can exist outside;
  * only uncertified rows expand to ring r+1 (dense areas finish in
    round 0-1; sparse areas keep widening — adaptive to skew).

Distances are exact int64 squared euclidean in map units: deterministic,
reproducible, tie-broken by neighbour id.

Two physical strategies:
  - ``broadcast``: right side small (mkgmap's in-memory KdTree case) —
    broadcast cross join + per-left top-k window.  One shuffle (window).
  - ``cells``: both sides large — the ring-expansion loop above; every
    join is an equi-join on cell id (AQE-skew-splittable), never a
    cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import CELL_OFFSET, CELL_SPAN
from ..plans.materialize import materialize


def _dist2(ly, lx, ry, rx):
    dy = ly.cast("long") - ry.cast("long")
    dx = lx.cast("long") - rx.cast("long")
    return dy * dy + dx * dx


def knn_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_id: str = "id",
    right_id: str = "rid",
    left_coords: tuple[str, str] = ("ay", "ax"),
    right_coords: tuple[str, str] = ("ry", "rx"),
) -> DataFrame:
    """Exact kNN with a broadcast right side.

    Output: (left_id, right_id, rank, dist2) with rank 1..k ordered by
    (dist2, right_id).
    """
    ly, lx = (F.col(c) for c in left_coords)
    ry, rx = (F.col(c) for c in right_coords)
    j = left.select(left_id, *left_coords).crossJoin(
        F.broadcast(right.select(right_id, *right_coords))
    )
    j = j.withColumn("dist2", _dist2(ly, lx, ry, rx))
    w = Window.partitionBy(left_id).orderBy(F.col("dist2"), F.col(right_id))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(left_id, right_id, "rank", "dist2")
    )


def knn_join_cells(
    left: DataFrame,
    right: DataFrame,
    k: int,
    gshift: int,
    left_id: str = "id",
    right_id: str = "rid",
    left_coords: tuple[str, str] = ("ay", "ax"),
    right_coords: tuple[str, str] = ("ry", "rx"),
    max_rings: int = 64,
) -> DataFrame:
    """Exact kNN via cell-ring expansion (both sides distributed).

    ``gshift`` picks the cell size (2^gshift map units); choose it so a
    typical cell holds >= k right rows — round 0 then certifies most of
    the left side immediately.
    """
    cell_size = 1 << gshift
    ly, lx = left_coords
    ry, rx = right_coords

    # degenerate right side: fewer than k rows can never certify
    # (_n >= k is unreachable) — the exact answer is the full top-k,
    # which the broadcast strategy computes in one pass
    ext = right.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ry).alias("y0"), F.max(ry).alias("y1"),
        F.min(rx).alias("x0"), F.max(rx).alias("x1"),
    ).collect()[0]
    if ext["n"] is None or ext["n"] < k:
        return knn_join_broadcast(left, right, k, left_id, right_id, left_coords, right_coords)
    lext = left.agg(
        F.min(ly).alias("y0"), F.max(ly).alias("y1"),
        F.min(lx).alias("x0"), F.max(lx).alias("x1"),
    ).collect()[0]
    # once the rings cover the combined left+right extent, `best` holds
    # the exact top-k for every remaining left row — stop expanding
    span = max(
        max(int(ext["y1"]), int(lext["y1"])) - min(int(ext["y0"]), int(lext["y0"])),
        max(int(ext["x1"]), int(lext["x1"])) - min(int(ext["x0"]), int(lext["x0"])),
    )
    max_rings = min(max_rings, span // cell_size + 2)

    r_cells = right.select(
        F.col(right_id),
        F.col(ry),
        F.col(rx),
        (F.shiftright(F.col(ry).cast("long"), gshift)).alias("_rcy"),
        (F.shiftright(F.col(rx).cast("long"), gshift)).alias("_rcx"),
    )

    pending = left.select(
        F.col(left_id),
        F.col(ly),
        F.col(lx),
        (F.shiftright(F.col(ly).cast("long"), gshift)).alias("_lcy"),
        (F.shiftright(F.col(lx).cast("long"), gshift)).alias("_lcx"),
    )

    best: DataFrame | None = None  # accumulated top-k candidates per left id
    best_cache: DataFrame | None = None  # persisted handles (for unpersist)
    pending_cache: DataFrame | None = None
    results: list[DataFrame] = []

    for ring in range(1, max_rings + 1):
        # round 1 covers Chebyshev <= 1 (certification radius 0 at ring
        # 0 can never fire, so probing the 3x3 block immediately saves
        # one full driver round); later rounds add ring `ring` only
        offsets = []
        if ring == 1:
            offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        else:
            for dx in range(-ring, ring + 1):
                offsets.append((-ring, dx))
                offsets.append((ring, dx))
            for dy in range(-ring + 1, ring):
                offsets.append((dy, -ring))
                offsets.append((dy, ring))
        off_df = F.explode(
            F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx")) for dy, dx in offsets])
        )
        probes = pending.select(left_id, ly, lx, "_lcy", "_lcx", off_df.alias("o")).select(
            left_id,
            ly,
            lx,
            "_lcy",
            "_lcx",
            ((F.col("_lcy") + F.col("o.dy") + CELL_OFFSET) * CELL_SPAN + (F.col("_lcx") + F.col("o.dx") + CELL_OFFSET)).alias("_probe_cell"),
        )
        r_keyed = r_cells.withColumn(
            "_probe_cell",
            ((F.col("_rcy") + CELL_OFFSET) * CELL_SPAN + (F.col("_rcx") + CELL_OFFSET)),
        )
        cand = probes.join(r_keyed, "_probe_cell").select(
            left_id,
            ly,
            lx,
            "_lcy",
            "_lcx",
            F.col(right_id),
            _dist2(F.col(ly), F.col(lx), F.col(ry), F.col(rx)).alias("dist2"),
        )
        prev_best_cache, prev_pending_cache = best_cache, pending_cache
        best = cand if best is None else best.unionByName(cand)
        w = Window.partitionBy(left_id).orderBy("dist2", right_id)
        best = (
            best.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")
        ).persist()
        best_cache = best  # the handle that actually holds the cache

        # certification: k-th best distance <= (ring * cell)^2 (any
        # point beyond ring `ring` is at least ring*cell away)
        cert_radius2 = (ring * cell_size) ** 2
        stats = best.groupBy(left_id).agg(
            F.count(F.lit(1)).alias("_n"), F.max("dist2").alias("_kth")
        )
        done_ids = stats.filter((F.col("_n") >= k) & (F.col("_kth") <= F.lit(cert_radius2)))
        done = best.join(done_ids.select(left_id), left_id, "left_semi")
        # materialize this round's finished rows so the superseded
        # caches can be dropped without recompute next round
        results.append(done.select(left_id, right_id, "dist2").transform(materialize))
        pending = pending.join(done_ids.select(left_id), left_id, "left_anti").persist()
        pending_cache = pending
        best = best.join(done_ids.select(left_id), left_id, "left_anti")
        # full count (not limit-1) so the new pending cache is fully
        # materialized before its parent cache is dropped
        empty = pending.count() == 0
        # unpersist the PERSISTED handles from the previous round (the
        # derived anti-join views don't hold the cache)
        if prev_best_cache is not None:
            prev_best_cache.unpersist()
        if prev_pending_cache is not None:
            prev_pending_cache.unpersist()
        if empty:
            break
    else:
        # ring budget exhausted: emit current best for the stragglers
        if best is not None:
            results.append(best.select(left_id, right_id, "dist2"))

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    w = Window.partitionBy(left_id).orderBy("dist2", right_id)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(left_id, right_id, "rank", "dist2")
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    gshift: int = 21,
    broadcast_threshold: int = 256,
    strategy: str | None = None,
    **kwargs,
) -> DataFrame:
    """Strategy dispatch, mirroring the reference's in-memory-KdTree vs
    grid-index choice: a right side of bounded size (city lists, border
    posts) broadcasts; anything that scales with the input goes through
    the cell-ring path (equi-joins only, no cross join at any sf).

    ``strategy`` ('broadcast' | 'cells') skips the cardinality probe
    (one bounded count action) for call sites that know their side."""
    if strategy is None:
        n = right.limit(broadcast_threshold + 1).count()
        strategy = "broadcast" if n <= broadcast_threshold else "cells"
    if strategy == "broadcast":
        return knn_join_broadcast(left, right, k, **kwargs)
    if strategy == "cells":
        return knn_join_cells(left, right, k, gshift=gshift, **kwargs)
    raise ValueError(f"unknown knn_join strategy {strategy!r}")
