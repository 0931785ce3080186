"""Garmin DEM tile codec: DemTileTest.java goldens + round trips.

The four goldens pin the encoder bit-for-bit to the reference
(test/uk/me/parabola/imgfmt/app/dem/DemTileTest.java — the worked
example from Frank Stinner's Dem-Daten.pdf); the randomized suites pin
the decoder to the encoder across terrain regimes.
"""

from __future__ import annotations

import math
import random

import pytest

from mkgmap_spark.functions.dem_codec import (
    UNDEF,
    analyze_tile,
    decode_tile,
    encode_tile,
)


def test_known_bitstream():
    # DemTileTest.testKnownBitstream
    h = [0] * (64 * 64)
    h[63 * 64] = 3
    base, md, et, bs = encode_tile(h, 64, 64)
    assert len(bs) == 12
    assert bs == bytes([0xFF] * 10 + [0xC0, 0x2E])
    assert decode_tile(bs, base, md, et, 64, 64) == h


def test_all_zero():
    # DemTileTest.testAllZero
    base, md, et, bs = encode_tile([0] * (64 * 64), 64, 64)
    assert (len(bs), base, md, et) == (0, 0, 0, 0)


def test_all_one():
    # DemTileTest.testAllOne
    base, md, et, bs = encode_tile([1] * (64 * 64), 64, 64)
    assert (len(bs), base, md, et) == (0, 1, 0, 0)
    assert decode_tile(bs, base, md, et, 64, 64) == [1] * (64 * 64)


def test_all_zero_one_undef():
    # DemTileTest.testAllZeroOneUndef
    h = [0] * (64 * 64)
    h[63 * 64] = UNDEF
    base, md, et, bs = encode_tile(h, 64, 64)
    assert len(bs) == 12
    assert (base, md, et) == (0, 1, 2)
    assert bs == bytes([0xFF] * 10 + [0xC0, 0x3E])
    assert decode_tile(bs, base, md, et, 64, 64) == h


def test_all_void():
    base, md, et, bs = encode_tile([UNDEF] * 64, 8, 8)
    assert (len(bs), base, md, et) == (0, 0, 0, 2)
    assert decode_tile(bs, base, md, et, 8, 8) == [UNDEF] * 64


def test_header_analysis_void_reserves_top():
    base, md, et, has = analyze_tile([10, 20, UNDEF, 15])
    assert (base, md, et, has) == (10, 11, 2, True)


def _terrain(rng: random.Random, regime: int, n: int):
    vals = []
    if regime == 0:  # smooth rolling
        cur = rng.randint(-200, 3000)
        for _ in range(n):
            cur += rng.randint(-3, 3)
            vals.append(cur)
    elif regime == 1:  # rough mountains
        vals = [rng.randint(0, 4000) for _ in range(n)]
    elif regime == 2:  # plateaus with steps
        v = rng.randint(0, 500)
        while len(vals) < n:
            vals.extend([v] * rng.randint(1, 30))
            v += rng.choice([-7, -1, 0, 1, 7, 100])
        vals = vals[:n]
    elif regime == 3:  # void-pocked
        vals = [UNDEF if rng.random() < 0.1 else rng.randint(-10, 300)
                for _ in range(n)]
    else:  # near-constant, tiny delta
        top = rng.choice([1, 2, 3])
        vals = [rng.randint(0, top) for _ in range(n)]
    return vals


@pytest.mark.parametrize("regime", range(5))
def test_roundtrip_randomized(regime):
    rng = random.Random(1000 + regime)
    for trial in range(60):
        w = rng.choice([8, 16, 32, 64])
        h = rng.choice([8, 16, 32, 64])
        vals = _terrain(rng, regime, w * h)
        base, md, et, bs = encode_tile(vals, w, h)
        assert decode_tile(bs, base, md, et, w, h) == vals, \
            f"regime={regime} trial={trial} w={w} h={h}"


def _tile_info_ref(dem_points: int, dem_dist: int):
    """Direct port of DEMSection.getTileInfo (DEMSection.java:92-113)
    used as the independent truth for the Column-arithmetic grid."""
    resolution = 64 * dem_dist
    dem_points += dem_dist
    n_full = dem_points // resolution
    rest = dem_points - n_full * resolution
    num = n_full
    nonstd = rest // dem_dist
    if rest % dem_dist != 0:
        nonstd += 1
    if nonstd >= 32:
        num += 1
    elif num > 0:
        nonstd += 64
    if num == 0:
        num = 1
    return num, nonstd


def test_section_tile_grid_matches_reference_arithmetic(spark):
    import pandas as pd

    from mkgmap_spark.operators.dem import section_tile_grid

    rng = random.Random(5)
    rows = []
    cases = {}
    for sid in range(40):
        dist = rng.choice([16, 32, 48, 64, 3312, 5520])
        if sid % 6 == 0:
            h = 191 * dist  # exact-multiple edge: rest == 0
        else:
            h = rng.randint(1, 300000)
        w = rng.randint(1, 300000)
        rows.append({"sec_id": sid, "area_top": rng.randint(0, 10 ** 6),
                     "area_left": rng.randint(0, 10 ** 6),
                     "area_height": h, "area_width": w, "point_dist": dist})
        cases[sid] = rows[-1]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = section_tile_grid(df).collect()
    seen = {}
    for r in out:
        seen.setdefault(r.sec_id, []).append(r)
    assert set(seen) == set(cases)
    for sid, tiles in seen.items():
        c = cases[sid]
        n_lat, ns_lat = _tile_info_ref(c["area_height"], c["point_dist"])
        n_lon, ns_lon = _tile_info_ref(c["area_width"], c["point_dist"])
        assert len(tiles) == n_lat * n_lon, sid
        for t in tiles:
            assert (t.tiles_lat, t.nonstd_lat) == (n_lat, ns_lat)
            assert (t.tiles_lon, t.nonstd_lon) == (n_lon, ns_lon)
            assert t.lat_off == c["area_top"] - t.tile_row * 64 * c["point_dist"]
            assert t.lon_off == c["area_left"] + t.tile_col * 64 * c["point_dist"]
            assert t.tile_height == (ns_lat if t.tile_row == n_lat - 1 else 64)
            assert t.tile_width == (ns_lon if t.tile_col == n_lon - 1 else 64)


def test_section_record_desc_end_to_end(spark):
    """Encode a small mixed section and check the record descriptor
    against DEMSection.calcTiles' epilogue computed directly."""
    import pandas as pd

    from mkgmap_spark.operators.dem import (
        encode_dem_tiles,
        section_record_desc,
    )

    rng = random.Random(11)
    rows = []
    py_tiles = []
    for tile in range(6):
        w, h = (16, 16) if tile < 5 else (9, 16)
        vals = _terrain(rng, tile % 5, w * h)
        if tile == 3:
            vals = [UNDEF] * (w * h)  # all-void: trips hasExtra only
        base, md, et, bs = encode_tile(vals, w, h)
        has_data = any(v != UNDEF for v in vals)
        py_tiles.append((base, md, et, len(bs), has_data,
                         base + md - (0 if et == 0 else 1)))
        rows.extend({"sec_id": 1, "tile_id": tile, "tile_width": w,
                     "tile_height": h, "idx": i, "height": v}
                    for i, v in enumerate(vals))
    df = spark.createDataFrame(pd.DataFrame(rows)).selectExpr(
        "cast(sec_id as long) sec_id", "cast(tile_id as long) tile_id",
        "cast(tile_width as int) tile_width",
        "cast(tile_height as int) tile_height",
        "cast(idx as int) idx", "cast(height as int) height")
    headers = encode_dem_tiles(df, ["sec_id", "tile_id"])
    got_tiles = {r.tile_id: r for r in headers.collect()}
    assert len(got_tiles) == 6
    for tid, exp in enumerate(py_tiles):
        r = got_tiles[tid]
        assert (r.base, r.max_delta, r.enc_type, r.bs_len, r.has_data,
                r.max_height) == exp, tid

    desc = section_record_desc(headers, ["sec_id"]).collect()
    assert len(desc) == 1
    d = desc[0]
    data_len = sum(t[3] for t in py_tiles)
    valid = [t for t in py_tiles if t[4]]
    min_base = min(t[0] for t in valid)
    max_base = max(t[0] for t in valid)
    max_delta = max(t[1] for t in valid)
    offset_size = 1 if data_len <= 0xFF else 2 if data_len <= 0xFFFF else 3
    base_size = 1 if (-128 < min_base and max_base < 128) else 2
    delta_size = 1 if max_delta <= 255 else 2
    has_extra = any(t[2] != 0 for t in py_tiles)
    expect_desc = (offset_size - 1) | ((base_size > 1) << 2) \
        | ((delta_size > 1) << 3) | (has_extra << 4)
    assert d.record_desc == expect_desc
    assert d.tile_desc_size == offset_size + base_size + delta_size + \
        (1 if has_extra else 0)
    assert d.min_height == min_base
    assert d.max_height == max(t[5] for t in valid)


FACTOR = 45.0 / (1 << 29)


def _ref_round(x):
    return math.floor(x + 0.5)


def _ref_interpolated_height(qx, qy, hlt, hrt, hrb, hlb):
    """Literal scalar port of HGTConverter.interpolatedHeight for the
    oracle side of the end-to-end test."""
    U = UNDEF
    if hlb == U:
        if hrb == U or hlt == U or hrt == U:
            if hrt != U and hlt != U and qy > 0.5:
                return _ref_round((1.0 - qx) * hlt + qx * hrt)
            if hrt != U and hrb != U and qx > 0.5:
                return _ref_round((1.0 - qy) * hrb + qy * hrt)
            return (hlb if qy < 0.5 else hlt) if qx < 0.5 else \
                (hrb if qy < 0.5 else hrt)
        if qx + qy < 0.4:
            return U
        hlb = hlt + hrb - hrt
    elif hrt == U:
        if hlb == U or hrb == U or hlt == U:
            if hlb != U and hrb != U and qy < 0.5:
                return _ref_round((1.0 - qx) * hlb + qx * hrb)
            if hlb != U and hlt != U and qx < 0.5:
                return _ref_round((1.0 - qy) * hlb + qy * hlt)
            return (hlb if qy < 0.5 else hlt) if qx < 0.5 else \
                (hrb if qy < 0.5 else hrt)
        if qx + qy > 1.6:
            return U
        hrt = hlt + hrb - hlb
    elif hrb == U:
        if hlb == U or hlt == U or hrt == U:
            if hlt != U and hrt != U and qy > 0.5:
                return _ref_round((1.0 - qx) * hlt + qx * hrt)
            if hlt != U and hlb != U and qx < 0.5:
                return _ref_round((1.0 - qy) * hlb + qy * hlt)
            return (hlb if qy < 0.5 else hlt) if qx < 0.5 else \
                (hrb if qy < 0.5 else hrt)
        if qy < qx - 0.4:
            return U
        hrb = hlb + hrt - hlt
    elif hlt == U:
        if hlb == U or hrb == U or hrt == U:
            if hrb != U and hlb != U and qy < 0.5:
                return _ref_round((1.0 - qx) * hlb + qx * hrb)
            if hrb != U and hrt != U and qx > 0.5:
                return _ref_round((1.0 - qy) * hrb + qy * hrt)
            return (hlb if qy < 0.5 else hlt) if qx < 0.5 else \
                (hrb if qy < 0.5 else hrt)
        if qy > qx + 0.6:
            return U
        hlt = hlb + hrt - hrb
    hxt = (1.0 - qx) * hlt + qx * hrt
    hxb = (1.0 - qx) * hlb + qx * hrb
    return _ref_round((1.0 - qy) * hxb + qy * hxt)


def _ref_get_elevation(lat32, lon32, grids, min_lat_deg, min_lon_deg,
                       min_lat32, min_lon32, outside):
    """Literal scalar port of HGTConverter.getElevation (bilinear)."""
    row = int((lat32 - min_lat32) * FACTOR)
    col = int((lon32 - min_lon32) * FACTOR)
    key = (min_lat_deg + row, min_lon_deg + col)
    if key not in grids:
        return outside
    res, grid = grids[key]
    if res <= 0:
        return 0
    g = grid.reshape(res + 1, res + 1)
    scale = res * FACTOR
    y1 = (lat32 - min_lat32) * scale - row * res
    x1 = (lon32 - min_lon32) * scale - col * res
    x_left = int(x1)
    y_bottom = int(y1)
    qx = x1 - x_left
    qy = y1 - y_bottom
    return _ref_interpolated_height(
        qx, qy, int(g[y_bottom + 1, x_left]), int(g[y_bottom + 1, x_left + 1]),
        int(g[y_bottom, x_left + 1]), int(g[y_bottom, x_left]))


def test_build_dem_end_to_end(spark):
    """--dem end to end on synthetic HGT coverage: decoded tile heights
    must equal the independent element-at-a-time reference port for
    every zoom level, tile and lattice point."""
    import numpy as np

    from mkgmap_spark.mapunits import to_map_unit
    from mkgmap_spark.operators.dem import EXTRA, build_dem

    rng = random.Random(31)
    res = 64
    grids = {}
    for cy in (9, 10):
        for cx in (19, 20):
            if (cy, cx) == (10, 20):
                continue  # hole in coverage: ocean / missing file
            n = (res + 1) * (res + 1)
            g = np.zeros(n, dtype=np.int16)
            for i in range(n):
                y, x = divmod(i, res + 1)
                v = 100 * (cy - 9) + 50 * (cx - 19) + \
                    ((x * 13 + y * 7) % 37) + (x // 16) * 5
                if (x * 31 + y * 17 + cy + cx) % 41 == 0:
                    v = UNDEF  # scattered voids exercise the corner rules
                g[i] = v
            grids[(cy, cx)] = (res, g)

    min_lat_mu = to_map_unit(9.4)
    max_lat_mu = to_map_unit(10.3)
    min_lon_mu = to_map_unit(19.3)
    max_lon_mu = to_map_unit(20.4)
    dists = [3312, 6624]

    tiles_df, sections_df, tre = build_dem(
        spark, grids, min_lat_mu, min_lon_mu, max_lat_mu, max_lon_mu, dists,
        interpolation="bilinear")
    tiles = tiles_df.collect()
    sections = {r.zoom: r for r in sections_df.collect()}
    assert len(sections) == 2
    assert len(tiles) > 4

    from mkgmap_spark.functions.dem_codec import decode_tile
    from mkgmap_spark.operators.dem import dem_level_plan

    min_lat_deg = int(math.floor(9.4 - EXTRA))
    min_lon_deg = int(math.floor(19.3 - EXTRA))
    min_lat32 = int(to_map_unit(float(min_lat_deg))) * 256
    min_lon32 = int(to_map_unit(float(min_lon_deg))) * 256
    _, levels = dem_level_plan(min_lat_mu, min_lon_mu, max_lat_mu,
                               max_lon_mu, dists, highest_res=res)
    by_zoom = {lv.zoom: lv for lv in levels}

    checked = 0
    for t in tiles:
        lv = by_zoom[t.zoom]
        decoded = decode_tile(bytes(t.stream), t.base, t.max_delta,
                              t.enc_type, t.tile_width, t.tile_height)
        lat_off = lv.top - t.tile_row * 64 * lv.point_dist
        lon_off = lv.left + t.tile_col * 64 * lv.point_dist
        for idx in range(0, t.tile_width * t.tile_height,
                         max(1, (t.tile_width * t.tile_height) // 97)):
            y, x = divmod(idx, t.tile_width)
            lat32 = lat_off - y * lv.point_dist
            lon32 = lon_off + x * lv.point_dist
            exp = _ref_get_elevation(lat32, lon32, grids, min_lat_deg,
                                     min_lon_deg, min_lat32, min_lon32,
                                     UNDEF)
            assert decoded[idx] == exp, (t.zoom, t.tile_row, t.tile_col,
                                         idx, decoded[idx], exp)
            checked += 1
    assert checked > 500


def test_roundtrip_spark_operator(spark):
    """roundtrip_dem_tiles over a small grid of mixed-regime tiles."""
    import pandas as pd

    from mkgmap_spark.operators.dem import roundtrip_dem_tiles

    rng = random.Random(7)
    rows = []
    expect = {}
    for tile in range(12):
        vals = _terrain(rng, tile % 5, 16 * 16)
        expect[tile] = vals
        rows.extend({"tile_id": tile, "idx": i, "height": v}
                    for i, v in enumerate(vals))
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = roundtrip_dem_tiles(
        df.selectExpr("cast(tile_id as long) tile_id",
                      "cast(idx as int) idx",
                      "cast(height as int) height"),
        16, 16).collect()
    assert len(out) == 12 * 256
    headers = {t: encode_tile(v, 16, 16)[:3] for t, v in expect.items()}
    for r in out:
        assert r.height == expect[r.tile_id][r.idx], (r.tile_id, r.idx)
        assert (r.base, r.max_delta, r.enc_type) == headers[r.tile_id]


def _ref_cubic(p, t):
    return p[1] + 0.5 * t * (p[2] - p[0] + t * (
        2.0 * p[0] - 5.0 * p[1] + 4.0 * p[2] - p[3] + t * (
            3.0 * (p[1] - p[2]) + p[3] - p[0])))


def _ref_fill_array(grids, cy, cx, res, x_left, y_bottom):
    """Literal port of HGTConverter.fillArray/prepReader: gather the
    16-point window, borrowing edge rows/columns from same-resolution
    neighbour readers; None when a value is missing."""
    def rdr(dy, dx):
        n = grids.get((cy + dy, cx + dx))
        if n is None or n[0] != res:
            return None
        return n[1].reshape(res + 1, res + 1)

    cur = grids[(cy, cx)][1].reshape(res + 1, res + 1)
    ele = [[None] * 4 for _ in range(4)]  # ele[x][y]
    min_x = min_y = 0
    max_x = max_y = 3
    if x_left == 0:
        min_x = 1
    elif x_left == res - 1:
        max_x = 2
    if y_bottom == 0:
        min_y = 1
    elif y_bottom == res - 1:
        max_y = 2
    for x in range(min_x, max_x + 1):
        for y in range(min_y, max_y + 1):
            h = int(cur[y_bottom + y - 1, x_left + x - 1])
            if h == UNDEF:
                return None
            ele[x][y] = h
    if (min_x, min_y, max_x, max_y) == (0, 0, 3, 3):
        return ele

    def borrow(dy, dx, writes):
        g = rdr(dy, dx)
        if g is None:
            return False
        for (ex, ey, gy, gx) in writes:
            h = int(g[gy, gx])
            if h == UNDEF:
                return False
            ele[ex][ey] = h
        return True

    if 0 < x_left < res - 1:
        if y_bottom == 0:
            if not borrow(-1, 0, [(x, 0, res - 1, x_left + x - 1)
                                  for x in range(4)]):
                return None
        elif y_bottom == res - 1:
            if not borrow(1, 0, [(x, 3, 1, x_left + x - 1)
                                 for x in range(4)]):
                return None
    if 0 < y_bottom < res - 1:
        if x_left == 0:
            if not borrow(0, -1, [(0, y, y_bottom + y - 1, res - 1)
                                  for y in range(4)]):
                return None
        elif x_left == res - 1:
            if not borrow(0, 1, [(3, y, y_bottom + y - 1, 1)
                                 for y in range(4)]):
                return None
    if x_left == 0 and y_bottom == 0:
        if not (borrow(0, -1, [(0, y, y_bottom + y - 1, res - 1)
                               for y in range(1, 4)])
                and borrow(-1, 0, [(x, 0, res - 1, x_left + x - 1)
                                   for x in range(1, 4)])
                and borrow(-1, -1, [(0, 0, res - 1, res - 1)])):
            return None
    elif x_left == 0 and y_bottom == res - 1:
        if not (borrow(0, -1, [(0, y, y_bottom + y - 1, res - 1)
                               for y in range(0, 3)])
                and borrow(1, 0, [(x, 3, 1, x_left + x - 1)
                                  for x in range(1, 4)])
                and borrow(1, -1, [(0, 3, 1, res - 1)])):
            return None
    elif x_left == res - 1 and y_bottom == 0:
        if not (borrow(0, 1, [(3, y, y_bottom + y - 1, 1)
                              for y in range(1, 4)])
                and borrow(-1, 0, [(x, 0, res - 1, x_left + x - 1)
                                   for x in range(0, 3)])
                and borrow(-1, 1, [(3, 0, res - 1, 1)])):
            return None
    elif x_left == res - 1 and y_bottom == res - 1:
        if not (borrow(0, 1, [(3, y, y_bottom + y - 1, 1)
                              for y in range(0, 3)])
                and borrow(1, 0, [(x, 3, 1, x_left + x - 1)
                                  for x in range(0, 3)])
                and borrow(1, 1, [(3, 3, 1, 1)])):
            return None
    if any(v is None for col in ele for v in col):
        return None
    return ele


def _ref_get_elevation_bicubic(lat32, lon32, grids, min_lat_deg, min_lon_deg,
                               min_lat32, min_lon32, outside):
    """Literal port of getElevation with useComplexInterpolation on."""
    row = int((lat32 - min_lat32) * FACTOR)
    col = int((lon32 - min_lon32) * FACTOR)
    key = (min_lat_deg + row, min_lon_deg + col)
    if key not in grids:
        return outside
    res, grid = grids[key]
    if res <= 0:
        return 0
    scale = res * FACTOR
    y1 = (lat32 - min_lat32) * scale - row * res
    x1 = (lon32 - min_lon32) * scale - col * res
    x_left = int(x1)
    y_bottom = int(y1)
    qx = x1 - x_left
    qy = y1 - y_bottom
    ele = _ref_fill_array(grids, key[0], key[1], res, x_left, y_bottom)
    if ele is not None:
        arr = [_ref_cubic([float(v) for v in ele[x]], qy) for x in range(4)]
        return _ref_round(_ref_cubic(arr, qx))
    g = grid.reshape(res + 1, res + 1)
    return _ref_interpolated_height(
        qx, qy, int(g[y_bottom + 1, x_left]), int(g[y_bottom + 1, x_left + 1]),
        int(g[y_bottom, x_left + 1]), int(g[y_bottom, x_left]))


def test_build_dem_bicubic_end_to_end(spark):
    """Auto interpolation selects the 16-point Catmull-Rom path at fine
    zooms; every sampled point must match the literal fillArray +
    bicubicInterpolation port, including cross-file window borrowing
    and void-driven bilinear fallback."""
    import numpy as np

    from mkgmap_spark.mapunits import to_map_unit
    from mkgmap_spark.operators.dem import EXTRA, build_dem

    res = 64
    grids = {}
    for cy in (9, 10):
        for cx in (19, 20):
            if (cy, cx) == (10, 20):
                continue
            n = (res + 1) * (res + 1)
            g = np.zeros(n, dtype=np.int16)
            for i in range(n):
                y, x = divmod(i, res + 1)
                v = 100 * (cy - 9) + 50 * (cx - 19) + \
                    ((x * 13 + y * 7) % 37) + (x // 16) * 5
                if (x * 31 + y * 17 + cy + cx) % 41 == 0:
                    v = UNDEF
                g[i] = v
            grids[(cy, cx)] = (res, g)

    min_lat_mu = to_map_unit(9.93)
    max_lat_mu = to_map_unit(10.12)
    min_lon_mu = to_map_unit(19.88)
    max_lon_mu = to_map_unit(20.07)
    dists = [3312]  # auto: distHGTx3 for res 64 >> 3312 -> bicubic

    tiles_df, _secs, _tre = build_dem(
        spark, grids, min_lat_mu, min_lon_mu, max_lat_mu, max_lon_mu, dists)
    from mkgmap_spark.functions.dem_codec import decode_tile
    from mkgmap_spark.operators.dem import dem_level_plan

    min_lat_deg = int(math.floor(9.93 - EXTRA))
    min_lon_deg = int(math.floor(19.88 - EXTRA))
    min_lat32 = int(to_map_unit(float(min_lat_deg))) * 256
    min_lon32 = int(to_map_unit(float(min_lon_deg))) * 256
    _, levels = dem_level_plan(min_lat_mu, min_lon_mu, max_lat_mu,
                               max_lon_mu, dists, highest_res=res)
    lv = levels[0]
    checked = 0
    for t in tiles_df.collect():
        decoded = decode_tile(bytes(t.stream), t.base, t.max_delta,
                              t.enc_type, t.tile_width, t.tile_height)
        lat_off = lv.top - t.tile_row * 64 * lv.point_dist
        lon_off = lv.left + t.tile_col * 64 * lv.point_dist
        for idx in range(0, t.tile_width * t.tile_height,
                         max(1, (t.tile_width * t.tile_height) // 61)):
            y, x = divmod(idx, t.tile_width)
            lat32 = lat_off - y * lv.point_dist
            lon32 = lon_off + x * lv.point_dist
            exp = _ref_get_elevation_bicubic(
                lat32, lon32, grids, min_lat_deg, min_lon_deg,
                min_lat32, min_lon32, UNDEF)
            assert decoded[idx] == exp, (t.tile_row, t.tile_col, idx,
                                         decoded[idx], exp)
            checked += 1
    assert checked > 300


def _scalar_winding_inside(lat, lon, rings):
    """Independent scalar containment oracle for the --dem-poly tests:
    nonzero-winding per ring (java.awt Path2D default), applied in the
    add/subtract file order PolygonFileReader uses."""
    inside = False
    for ring in rings:
        ry = [v * 256 for v in ring.lats_mu.tolist()]
        rx = [v * 256 for v in ring.lons_mu.tolist()]
        wn = 0
        n = len(ry)
        for i in range(n):
            y1, x1 = ry[i], rx[i]
            y2, x2 = ry[(i + 1) % n], rx[(i + 1) % n]
            cross = (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
            if y1 <= lat < y2 and cross > 0:
                wn += 1
            elif y2 <= lat < y1 and cross < 0:
                wn -= 1
        if wn != 0:
            inside = not ring.negative
    return inside


def test_build_dem_poly_clip(spark):
    """--dem-poly: lattice points outside the bounding polygon carry
    the outside height; points inside match the unclipped build
    bit-for-bit (HGTConverter.getHeights' testArea clip)."""
    import numpy as np

    from mkgmap_spark.functions.dem_codec import decode_tile
    from mkgmap_spark.mapunits import to_map_unit
    from mkgmap_spark.operators.dem import build_dem, dem_level_plan
    from mkgmap_spark.sources.polyfile import PolyRing

    res = 64
    grids = {}
    for cy in (9, 10):
        for cx in (19, 20):
            n = (res + 1) * (res + 1)
            g = np.zeros(n, dtype=np.int16)
            for i in range(n):
                y, x = divmod(i, res + 1)
                g[i] = 80 * (cy - 9) + 40 * (cx - 19) + ((x * 11 + y * 5) % 29)
            grids[(cy, cx)] = (res, g)

    min_lat_mu = to_map_unit(9.4)
    max_lat_mu = to_map_unit(10.3)
    min_lon_mu = to_map_unit(19.3)
    max_lon_mu = to_map_unit(20.4)
    dists = [6624]

    def ring(neg, pts):
        return PolyRing(
            "r", neg,
            to_map_unit(np.array([p[0] for p in pts], dtype=np.float64)),
            to_map_unit(np.array([p[1] for p in pts], dtype=np.float64)))

    # covers the west half, with a hole in the middle of it
    rings = [ring(False, [(9.0, 19.0), (9.0, 19.9), (10.5, 19.9), (10.5, 19.0)]),
             ring(True, [(9.7, 19.45), (9.7, 19.7), (10.0, 19.7), (10.0, 19.45)])]

    outside = 7  # a custom --dem-outside-polygon value, not the void
    plain, _, _ = build_dem(spark, grids, min_lat_mu, min_lon_mu,
                            max_lat_mu, max_lon_mu, dists,
                            interpolation="bilinear")
    clipped, _, _ = build_dem(spark, grids, min_lat_mu, min_lon_mu,
                              max_lat_mu, max_lon_mu, dists,
                              outside_height=outside,
                              interpolation="bilinear", poly_rings=rings)

    _, levels = dem_level_plan(min_lat_mu, min_lon_mu, max_lat_mu,
                               max_lon_mu, dists, highest_res=res)
    lv = levels[0]
    plain_heights = {}
    for t in plain.collect():
        dec = decode_tile(bytes(t.stream), t.base, t.max_delta,
                          t.enc_type, t.tile_width, t.tile_height)
        plain_heights[(t.tile_row, t.tile_col)] = (dec, t.tile_width)

    n_in = n_out = 0
    for t in clipped.collect():
        dec = decode_tile(bytes(t.stream), t.base, t.max_delta,
                          t.enc_type, t.tile_width, t.tile_height)
        base, width = plain_heights[(t.tile_row, t.tile_col)]
        lat_off = lv.top - t.tile_row * 64 * lv.point_dist
        lon_off = lv.left + t.tile_col * 64 * lv.point_dist
        for idx in range(len(dec)):
            y, x = divmod(idx, width)
            lat32 = lat_off - y * lv.point_dist
            lon32 = lon_off + x * lv.point_dist
            if _scalar_winding_inside(lat32, lon32, rings):
                assert dec[idx] == base[idx], (t.tile_row, t.tile_col, idx)
                n_in += 1
            else:
                assert dec[idx] == outside, (t.tile_row, t.tile_col, idx,
                                             dec[idx])
                n_out += 1
    assert n_in > 500 and n_out > 500
