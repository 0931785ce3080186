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
    gshift: int | None = None,
    left_id: str = "id",
    right_id: str = "rid",
    left_coords: tuple[str, str] = ("ay", "ax"),
    right_coords: tuple[str, str] = ("ry", "rx"),
    max_rings: int = 64,
) -> DataFrame:
    """Exact kNN via cell-ring expansion (both sides distributed).

    ``gshift`` picks the cell size (2^gshift map units).  Default None
    auto-tunes it from the right side's extent and count so a 3x3 cell
    block holds ~4k right rows in expectation: big enough that ring 1
    certifies most left rows (expected k-th NN distance < one cell),
    small enough that the candidate fanout stays ~O(k) per left row
    instead of degenerating toward the cross product when the grid is
    coarser than the data (a fixed gshift did exactly that at bench
    scale: 22 occupied cells -> 5.3M ring-1 candidates for a 15k x 1k
    join).  Density-adaptive, so it holds at any sf.
    """
    ly, lx = left_coords
    ry, rx = right_coords

    # ONE job for both sides' count + extent (drives gshift auto-tune,
    # ring budget, and the driver-side pending counter)
    sides = (
        right.select(F.lit(1).alias("_s"), F.col(ry).alias("_y"), F.col(rx).alias("_x"))
        .unionByName(left.select(F.lit(0).alias("_s"), F.col(ly).alias("_y"), F.col(lx).alias("_x")))
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_y").alias("y0"), F.max("_y").alias("y1"),
            F.min("_x").alias("x0"), F.max("_x").alias("x1"),
        )
        .collect()
    )
    by_side = {int(r["_s"]): r for r in sides}
    ext, lext = by_side.get(1), by_side.get(0)
    # degenerate right side: fewer than k rows can never certify
    # (_n >= k is unreachable) — the exact answer is the full top-k,
    # which the broadcast strategy computes in one pass
    if ext is None or ext["n"] < k:
        return knn_join_broadcast(left, right, k, left_id, right_id, left_coords, right_coords)
    if lext is None:
        return knn_join_broadcast(left, right, k, left_id, right_id, left_coords, right_coords)
    if gshift is None:
        import math

        ry_span = max(1, int(ext["y1"]) - int(ext["y0"]))
        rx_span = max(1, int(ext["x1"]) - int(ext["x0"]))
        # cell edge s.t. 9 * n * cell^2 / area ~= 4k  (see docstring)
        cell = math.sqrt(4 * k * ry_span * rx_span / (9 * int(ext["n"])))
        gshift = min(24, max(8, math.ceil(math.log2(max(cell, 2.0)))))
    cell_size = 1 << gshift
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
    ).persist()
    n_pending = int(lext["n"])  # tracked driver-side: one action per ring

    best: DataFrame | None = None  # accumulated top-k candidates per left id
    persisted: list[DataFrame] = [pending]  # handles to release at the end
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
        best = cand if best is None else best.unionByName(cand)
        w = Window.partitionBy(left_id).orderBy("dist2", right_id)
        wp = Window.partitionBy(left_id)
        # _rk: within the rows surviving the <= k filter it IS the true
        # global rank once a row certifies — so no re-rank window is
        # needed after the loop.  _n/_kth (certification inputs) are
        # window columns over the SAME partitioning, so Catalyst reuses
        # the one exchange: no separate groupBy-stats shuffle and no
        # done_ids semi/anti equi-joins — certification is a row filter.
        best = (
            best.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .withColumn("_n", F.count(F.lit(1)).over(wp))
            .withColumn("_kth", F.max("dist2").over(wp))
        ).persist()
        persisted.append(best)

        # certification: k-th best distance <= (ring * cell)^2 (any
        # point beyond ring `ring` is at least ring*cell away).  ONE
        # action per ring: the scalar rollup both populates the `best`
        # cache and tells the driver how many left rows certified — no
        # separate pending.count() round-trip (round-4 verdict item 1).
        cert_radius2 = (ring * cell_size) ** 2
        cert = (F.col("_n") >= k) & (F.col("_kth") <= F.lit(cert_radius2))
        n_done = int(
            best.agg(
                F.sum((cert & (F.col("_rk") == 1)).cast("long")).alias("d")
            ).collect()[0]["d"]
            or 0
        )
        results.append(
            best.filter(cert).select(left_id, right_id, F.col("_rk").alias("rank"), "dist2")
        )
        n_pending -= n_done
        if n_pending <= 0:
            break
        done_ids = best.filter(cert & (F.col("_rk") == 1)).select(left_id)
        pending = pending.join(done_ids, left_id, "left_anti")
        best = best.filter(~cert).drop("_rk", "_n", "_kth")
    else:
        # ring budget exhausted: emit current best for the stragglers
        # (the continue path dropped _rk, so re-rank the <= k survivors)
        if best is not None:
            w = Window.partitionBy(left_id).orderBy("dist2", right_id)
            results.append(
                best.withColumn("rank", F.row_number().over(w)).select(
                    left_id, right_id, "rank", "dist2"
                )
            )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    out = out.select(left_id, right_id, "rank", "dist2")
    # one lineage cut at the end, then release every per-ring cache —
    # the caller sees a self-contained result with no pinned blocks
    out = materialize(out, tag="knn")
    for h in persisted:
        h.unpersist()
    return out


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    gshift: int | None = None,
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
