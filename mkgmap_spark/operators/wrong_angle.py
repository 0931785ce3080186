"""WrongAngleFixer: repair zig-zag artifacts from map-unit rounding.

Reference: osmstyle/WrongAngleFixer.java:39-57 — coordinates rounded
from high precision (30-bit, DELTA_SHIFT=6 subunits) to 24-bit map
units can flip nearly-straight lines into zig-zags when adjacent
points round in opposite directions.  The fixer measures, per point
("center of angle"), the BEARING ERROR between the real segment
bearing and the displayed (rounded) bearing to each neighbour
(calcBearingError: rhumb-line bearings over high-prec radians,
Coord.bearingToOnRhumbLine:577); points whose worst error is >=
MAX_BEARING_ERROR (15 deg) are either MOVED to an alternative display
position (the adjacent grid point per axis when the real position is
more than a quarter unit away — Coord.getAlternativePositions:714,
MAX_DELTA = 1 << (DELTA_SHIFT-2)) or REMOVED (calcRemoveError: only
degree-<=2, non-preserved points, penalty |realAngle|/2, guarded by
the displayed-angle and displacement-distance checks).  Decision
thresholds mirror CenterOfAngle.tryChange:980-1090.

Engine re-expression: a per-way numpy kernel over packed
high-precision coordinate arrays, run as mapInPandas (Arrow batches;
ways are independent rows, no shuffle).  Documented divergences from
the reference: (a) centers shared between ways are fixed per way, not
as one merged cluster (the reference builds cross-way CenterOfAngle
graphs); (b) no merge-of-duplicate-centers step; (c) bearings use
exact atan2 (the reference uses atan2_approximation for speed in the
non-high-prec path); (d) a bounded pass loop (the reference iterates
with extra passes until quiet).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA_SHIFT = 6  # Coord.java: high-precision subunit bits
MAX_DELTA = 1 << (DELTA_SHIFT - 2)  # quarter map unit
MAX_BEARING_ERROR = 15.0
MAX_BEARING_ERROR_HALF = 7.5
_MU = 2.0 * math.pi / (1 << 24)  # map units -> radians
_HP = _MU / (1 << DELTA_SHIFT)  # high-prec units -> radians


def hp_to_display(hp: np.ndarray) -> np.ndarray:
    """Round high-precision to map units (Coord constructor rounding)."""
    return (hp + (1 << (DELTA_SHIFT - 1))) >> DELTA_SHIFT


def _bearing(lat1, lon1, lat2, lon2) -> float:
    """Rhumb-line bearing in degrees; inputs in radians (shared
    implementation in functions/bearing.py)."""
    from ..functions.bearing import rhumb_bearing_rad_deg

    return rhumb_bearing_rad_deg(lat1, lon1, lat2, lon2)


def _bearing_err(c_hp, n_hp, c_disp, n_disp) -> float:
    """calcBearingError: |displayed - real| normalized to [0, 180];
    coincident points -> inf (the merge case)."""
    if c_hp[0] == n_hp[0] and c_hp[1] == n_hp[1]:
        return float("inf")
    real = _bearing(c_hp[0] * _HP, c_hp[1] * _HP, n_hp[0] * _HP, n_hp[1] * _HP)
    if c_disp[0] == n_disp[0] and c_disp[1] == n_disp[1]:
        return float("inf")
    disp = _bearing(
        c_disp[0] * _MU, c_disp[1] * _MU, n_disp[0] * _MU, n_disp[1] * _MU
    )
    err = disp - real
    while err > 180:
        err -= 360
    while err < -180:
        err += 360
    return abs(err)


def _alternatives(hp_lat: int, hp_lon: int, d_lat: int, d_lon: int):
    """Coord.getAlternativePositions: the adjacent display grid point
    per axis when the real position is > MAX_DELTA subunits away."""
    delta_lat = (d_lat << DELTA_SHIFT) - hp_lat
    delta_lon = (d_lon << DELTA_SHIFT) - hp_lon
    mod_lat, mod_lon = d_lat, d_lon
    if delta_lat > MAX_DELTA:
        mod_lat -= 1
    elif delta_lat < -MAX_DELTA:
        mod_lat += 1
    if delta_lon > MAX_DELTA:
        mod_lon -= 1
    elif delta_lon < -MAX_DELTA:
        mod_lon += 1
    out = []
    if mod_lat != d_lat:
        if mod_lon != d_lon:
            out.append((mod_lat, mod_lon))
        out.append((mod_lat, d_lon))
    if mod_lon != d_lon:
        out.append((d_lat, mod_lon))
    return out


def fix_way_angles(
    hp_lats: np.ndarray,
    hp_lons: np.ndarray,
    preserved: np.ndarray | None = None,
    max_passes: int = 10,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fix one way.  Inputs: high-precision int coords (map units <<
    DELTA_SHIFT).  Returns (display_lats, display_lons, keep_mask).
    Endpoints are never removed; preserved points are never removed."""
    n = len(hp_lats)
    hp = np.stack([hp_lats.astype(np.int64), hp_lons.astype(np.int64)], axis=1)
    disp = np.stack([hp_to_display(hp[:, 0]), hp_to_display(hp[:, 1])], axis=1)
    keep = np.ones(n, dtype=bool)
    if preserved is None:
        preserved = np.zeros(n, dtype=bool)

    def neighbours(i):
        idx = np.flatnonzero(keep)
        pos = np.searchsorted(idx, i)
        out = []
        if pos > 0:
            out.append(idx[pos - 1])
        if pos + 1 < len(idx):
            out.append(idx[pos + 1])
        return out

    for _ in range(max_passes):
        changed = False
        for i in range(n):
            if not keep[i]:
                continue
            nbs = neighbours(i)
            if not nbs:
                continue
            # infinite error (coincident real or displayed points)
            # COUNTS toward the worst error — it forces a change
            # attempt, exactly like Double.MAX_VALUE in the reference
            errs = [_bearing_err(hp[i], hp[j], disp[i], disp[j]) for j in nbs]
            init_max = max(errs)
            if init_max < MAX_BEARING_ERROR:
                continue
            # try alternative display positions (move)
            best_err, best_pos = init_max, None
            for alt in _alternatives(hp[i][0], hp[i][1], disp[i][0], disp[i][1]):
                errs2 = [
                    _bearing_err(hp[i], hp[j], np.array(alt), disp[j]) for j in nbs
                ]
                m2 = max(errs2)
                if m2 < best_err:
                    best_err, best_pos = m2, alt
            # removal penalty (calcRemoveError)
            remove_err = float("inf")
            is_endpoint = i == 0 or i == n - 1
            if (
                not is_endpoint
                and not preserved[i]
                and len(nbs) == 2
            ):
                a, b = nbs
                # displayed angle at c between the outer points
                d1 = _bearing(
                    disp[i][0] * _MU, disp[i][1] * _MU, disp[a][0] * _MU, disp[a][1] * _MU
                )
                d2 = _bearing(
                    disp[i][0] * _MU, disp[i][1] * _MU, disp[b][0] * _MU, disp[b][1] * _MU
                )
                dspl_angle = 180.0 - abs(abs(d1 - d2) - 180.0)
                dspl_dev = 180.0 - dspl_angle
                r1 = _bearing(hp[i][0] * _HP, hp[i][1] * _HP, hp[a][0] * _HP, hp[a][1] * _HP)
                r2 = _bearing(hp[i][0] * _HP, hp[i][1] * _HP, hp[b][0] * _HP, hp[b][1] * _HP)
                real_angle = 180.0 - abs(abs(r1 - r2) - 180.0)
                real_dev = 180.0 - real_angle
                if dspl_dev >= 3:  # displayed not straight: removal can help
                    remove_err = abs(real_dev) / 2
            if (
                remove_err < best_err
                and init_max - remove_err >= MAX_BEARING_ERROR_HALF
                and remove_err < MAX_BEARING_ERROR_HALF
            ):
                keep[i] = False
                changed = True
            elif best_pos is not None and best_err < MAX_BEARING_ERROR:
                disp[i] = best_pos
                changed = True
            elif remove_err < MAX_BEARING_ERROR and not is_endpoint:
                keep[i] = False
                changed = True
        if not changed:
            break
    return disp[:, 0], disp[:, 1], keep


def max_bearing_error(hp_lats, hp_lons, disp_lats, disp_lons) -> float:
    """Diagnostic: worst bearing error along a way."""
    worst = 0.0
    for i in range(len(hp_lats) - 1):
        e = _bearing_err(
            (int(hp_lats[i]), int(hp_lons[i])),
            (int(hp_lats[i + 1]), int(hp_lons[i + 1])),
            (int(disp_lats[i]), int(disp_lons[i])),
            (int(disp_lats[i + 1]), int(disp_lons[i + 1])),
        )
        if math.isfinite(e):
            worst = max(worst, e)
    return worst


WA_SCHEMA = "id long, lats array<int>, lons array<int>, n_removed int"


def fix_wrong_angles(ways: DataFrame, hp: bool = True) -> DataFrame:
    """DataFrame form: ways (id, lats, lons[, preserved]) with
    high-precision coords (map units << 6) when ``hp`` else plain map
    units (upscaled internally, which makes every point grid-exact and
    the op a no-op — pass real high-prec input for effect).
    Output: (id, lats, lons, n_removed) with DISPLAY (map unit) coords.
    Per-way kernel, Arrow-batched, no shuffle."""
    has_pres = "preserved" in ways.columns
    cols = ["id", "lats", "lons"] + (["preserved"] if has_pres else [])

    def kernel(it):
        for pdf in it:
            out = []
            for r in pdf.itertuples():
                la = np.asarray(r.lats, dtype=np.int64)
                lo = np.asarray(r.lons, dtype=np.int64)
                if not hp:
                    la, lo = la << DELTA_SHIFT, lo << DELTA_SHIFT
                pres = (
                    np.asarray(r.preserved, dtype=bool)
                    if has_pres
                    else None
                )
                dla, dlo, keep = fix_way_angles(la, lo, pres)
                out.append(
                    (
                        r.id,
                        dla[keep].astype(np.int32).tolist(),
                        dlo[keep].astype(np.int32).tolist(),
                        int((~keep).sum()),
                    )
                )
            yield pd.DataFrame(out, columns=["id", "lats", "lons", "n_removed"])

    return ways.select(*cols).mapInPandas(kernel, WA_SCHEMA)


# ------------------------------------------------------------------
# cross-way fixpoint (the reference's CenterOfAngle graph)
# ------------------------------------------------------------------


def fix_group_angles(
    group: list[tuple[int, np.ndarray, np.ndarray, np.ndarray | None]],
    max_passes: int = 10,
):
    """Cross-way fixer for one group of ways (the reference runs per
    tile; WrongAngleFixer.java builds CenterOfAngle objects SHARED
    between ways via the global coord pool, :249-420).

    group: [(way_id, hp_lats, hp_lons, preserved)].  Returns
    {way_id: (disp_lats, disp_lons, keep_mask)} where a point shared
    by several ways gets ONE display position decided from the union
    of all its neighbours.

    Divergence (documented): centers are keyed by exact high-precision
    coordinate value (the reference keys by Coord object identity from
    the tile's coord pool — same value within a tile); points shared
    by more than one way, way endpoints and preserved points may MOVE
    but never REMOVE (the reference additionally allows removing some
    shared degree-2 points after merging duplicate centers — a rare
    cascade this model skips)."""
    ways = []
    for wid, la, lo, pres in group:
        hp = np.stack([la.astype(np.int64), lo.astype(np.int64)], axis=1)
        disp = np.stack([hp_to_display(hp[:, 0]), hp_to_display(hp[:, 1])], axis=1)
        n = len(hp)
        keep = np.ones(n, dtype=bool)
        p = pres if pres is not None else np.zeros(n, dtype=bool)
        ways.append({"id": wid, "hp": hp, "disp": disp, "keep": keep, "pres": p})

    # centers: hp coord value -> list of (way_idx, pos)
    centers: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for wi, w in enumerate(ways):
        for pos in range(len(w["hp"])):
            centers.setdefault((int(w["hp"][pos][0]), int(w["hp"][pos][1])), []).append(
                (wi, pos)
            )

    def occ_neighbours(wi, pos):
        w = ways[wi]
        idx = np.flatnonzero(w["keep"])
        at = np.searchsorted(idx, pos)
        out = []
        if at > 0:
            out.append(idx[at - 1])
        if at + 1 < len(idx):
            out.append(idx[at + 1])
        return out

    def set_disp(occs, val):
        for wi, pos in occs:
            ways[wi]["disp"][pos] = val

    for _ in range(max_passes):
        changed = False
        for key, occs in centers.items():
            occs_alive = [(wi, pos) for wi, pos in occs if ways[wi]["keep"][pos]]
            if not occs_alive:
                continue
            wi0, pos0 = occs_alive[0]
            hp_c = ways[wi0]["hp"][pos0]
            disp_c = ways[wi0]["disp"][pos0]
            # union of neighbours over every way through the center
            nbs = [
                (wi, j)
                for wi, pos in occs_alive
                for j in occ_neighbours(wi, pos)
            ]
            if not nbs:
                continue
            errs = [
                _bearing_err(hp_c, ways[wi]["hp"][j], disp_c, ways[wi]["disp"][j])
                for wi, j in nbs
            ]
            init_max = max(errs)
            if init_max < MAX_BEARING_ERROR:
                continue
            best_err, best_pos = init_max, None
            for alt in _alternatives(hp_c[0], hp_c[1], disp_c[0], disp_c[1]):
                m2 = max(
                    _bearing_err(hp_c, ways[wi]["hp"][j], np.array(alt), ways[wi]["disp"][j])
                    for wi, j in nbs
                )
                if m2 < best_err:
                    best_err, best_pos = m2, alt
            # removal only for single-way, interior, unpreserved,
            # degree-2 centers
            remove_err = float("inf")
            removable = (
                len(occs_alive) == 1
                and len(nbs) == 2
                and pos0 not in (0, len(ways[wi0]["hp"]) - 1)
                and not ways[wi0]["pres"][pos0]
            )
            if removable:
                (wa, a), (wb, b) = nbs
                da = ways[wa]["disp"][a]
                db = ways[wb]["disp"][b]
                d1 = _bearing(disp_c[0] * _MU, disp_c[1] * _MU, da[0] * _MU, da[1] * _MU)
                d2 = _bearing(disp_c[0] * _MU, disp_c[1] * _MU, db[0] * _MU, db[1] * _MU)
                dspl_dev = 180.0 - (180.0 - abs(abs(d1 - d2) - 180.0))
                ha = ways[wa]["hp"][a]
                hb = ways[wb]["hp"][b]
                r1 = _bearing(hp_c[0] * _HP, hp_c[1] * _HP, ha[0] * _HP, ha[1] * _HP)
                r2 = _bearing(hp_c[0] * _HP, hp_c[1] * _HP, hb[0] * _HP, hb[1] * _HP)
                real_dev = 180.0 - (180.0 - abs(abs(r1 - r2) - 180.0))
                if dspl_dev >= 3:
                    remove_err = abs(real_dev) / 2
            if (
                remove_err < best_err
                and init_max - remove_err >= MAX_BEARING_ERROR_HALF
                and remove_err < MAX_BEARING_ERROR_HALF
            ):
                ways[wi0]["keep"][pos0] = False
                changed = True
            elif best_pos is not None and best_err < MAX_BEARING_ERROR:
                set_disp(occs_alive, np.array(best_pos))
                changed = True
            elif remove_err < MAX_BEARING_ERROR and removable:
                ways[wi0]["keep"][pos0] = False
                changed = True
        if not changed:
            break
    return {
        w["id"]: (w["disp"][:, 0], w["disp"][:, 1], w["keep"]) for w in ways
    }


def fix_wrong_angles_grouped(
    ways: DataFrame, group_col: str = "tile_id", hp: bool = True
) -> DataFrame:
    """Cross-way DataFrame form: ways (group_col, id, lats, lons
    [, preserved]); each group (a tile — the reference's processing
    unit, bounded size) runs one cross-way fixpoint.  Aggregated
    JVM-side and batched via mapInPandas (many groups per Arrow batch,
    same pattern as the sea synthesis).  Output: (group_col, id, lats,
    lons, n_removed)."""
    has_pres = "preserved" in ways.columns
    struct_cols = ["id", "lats", "lons"] + (["preserved"] if has_pres else [])
    agg = ways.groupBy(group_col).agg(
        F.collect_list(F.struct(*struct_cols)).alias("ws")
    )

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                grp = []
                for wrow in r.ws:
                    la = np.asarray(wrow["lats"], dtype=np.int64)
                    lo = np.asarray(wrow["lons"], dtype=np.int64)
                    if not hp:
                        la, lo = la << DELTA_SHIFT, lo << DELTA_SHIFT
                    pres = (
                        np.asarray(wrow["preserved"], dtype=bool) if has_pres else None
                    )
                    grp.append((int(wrow["id"]), la, lo, pres))
                fixed = fix_group_angles(grp)
                gval = getattr(r, group_col)
                for wid, (dla, dlo, keep) in fixed.items():
                    rows.append(
                        (
                            gval,
                            wid,
                            dla[keep].astype(np.int32).tolist(),
                            dlo[keep].astype(np.int32).tolist(),
                            int((~keep).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[group_col, "id", "lats", "lons", "n_removed"]
            )

    return agg.mapInPandas(
        kernel,
        f"{group_col} long, id long, lats array<int>, lons array<int>, n_removed int",
    )
