"""Round-trip tests for the HGT and BND binary file readers, feeding
the existing raster-overlay and PIP-join operators."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from mkgmap_spark.sources.bnd import (
    parse_bnd,
    read_bnd,
    read_var_double,
    write_bnd,
    write_var_double,
)
from mkgmap_spark.sources.hgt import (
    UNDEF,
    get_elevation,
    parse_hgt,
    parse_hgt_name,
    read_hgt,
    write_hgt,
)


def test_vardouble_roundtrip():
    import io
    import random

    vals = [0.0, 1.0, -1.0, 123456.789, float("inf"), float("-inf"),
            3.5e-20, -7.25, 2.0**60, 1e-300]
    rng = random.Random(3)
    vals += [rng.uniform(-1e8, 1e8) for _ in range(200)]
    vals += [float(rng.randint(-(1 << 23), 1 << 23)) for _ in range(200)]
    buf = io.BytesIO()
    for v in vals:
        write_var_double(buf, v)
    buf.seek(0)
    got = [read_var_double(buf) for _ in vals]
    assert got == vals
    # integers (the common case) encode compactly: few mantissa bits
    buf2 = io.BytesIO()
    write_var_double(buf2, 4096.0)
    assert len(buf2.getvalue()) <= 3


def test_hgt_parse_and_indexing(tmp_path):
    # 5x5 grid (res 4), row 0 = north
    grid = np.arange(25, dtype=np.int16).reshape(5, 5)
    grid[0, 0] = UNDEF
    p = os.path.join(tmp_path, "N51E010.hgt")
    write_hgt(p, grid)
    data = open(p, "rb").read()
    assert len(data) == 50 and data[:2] == struct.pack(">h", UNDEF)
    res, g = parse_hgt(data)
    assert res == 4 and (g == grid).all()
    # getElevation: y counts from the SOUTH edge (HGTReader:242)
    assert get_elevation(g, 0, 0) == int(grid[4, 0])
    assert get_elevation(g, 2, 4) == int(grid[0, 2])
    assert get_elevation(g, 0, 4) == UNDEF
    assert parse_hgt_name("N51E010.hgt") == (51, 10)
    assert parse_hgt_name("S01W120.hgt.zip") == (-1, -120)
    # invalid size rejected like calcRes
    assert parse_hgt(b"\x00" * 51)[0] == -1


def test_read_hgt_feeds_overlay(spark, tmp_path):
    from mkgmap_spark.operators.raster import overlay_sample

    # constant-gradient grid: elevation == row index from the south
    n = 9
    grid = np.repeat(np.arange(n, 0, -1, dtype=np.int16), n).reshape(n, n)
    p = os.path.join(tmp_path, "N10E020.hgt")
    write_hgt(p, grid)
    rasters = read_hgt(spark, str(tmp_path))
    row = rasters.collect()[0]
    assert row["media_ref"] == "N10E020.hgt"
    assert row["width"] == row["height"] == n
    # south-first pixel order: first row is the grid's LAST file row
    assert row["pixels"][:n] == [1] * n
    feats = spark.createDataFrame(
        [(1, 100, 200, "N10E020.hgt")], "id long, ay int, ax int, media_ref string"
    )
    out = overlay_sample(feats, rasters).collect()
    assert len(out) == 1 and out[0]["sampled"] == pytest.approx(
        1 + (100 & 0xFFFF) / 65535 * (n - 1), abs=1e-6
    )


def test_bnd_roundtrip_and_pip(spark, tmp_path):
    from mkgmap_spark.operators.pip_join import pip_join_broadcast

    bounds = [
        {
            "boundary_id": "r1",
            "tags": {"admin_level": "4", "name": "Région", "postal_code": "75"},
            "rings": [
                [(0, 0), (0, 1000), (1000, 1000), (1000, 0), (0, 0)],
                [(200, 200), (200, 400), (400, 400), (400, 200), (200, 200)],
            ],
        },
        {
            "boundary_id": "r2",
            "tags": {"admin_level": "2", "name": "Land"},
            "rings": [[(500, 500), (500, 2000), (2000, 2000), (2000, 500), (500, 500)]],
        },
    ]
    p = os.path.join(tmp_path, "bounds_0_0.bnd")
    write_bnd(p, bounds)

    # driver-side parse round-trips exactly
    parsed = parse_bnd(open(p, "rb").read())
    assert [b["boundary_id"] for b in parsed] == ["r1", "r2"]
    assert parsed[0]["tags"]["name"] == "Région"
    assert parsed[0]["rings"] == [[tuple(pt) for pt in r] for r in bounds[0]["rings"]]

    # Spark reader -> PIP join table
    bdf = read_bnd(spark, str(tmp_path))
    rows = {r["boundary_id"]: r for r in bdf.collect()}
    assert rows["r1"]["admin_level"] == 4 and rows["r1"]["postcode"] == "75"
    assert rows["r1"]["rings"][1]["is_hole"] is True
    pts = spark.createDataFrame(
        [(1, 100, 100), (2, 300, 300), (3, 1500, 1500), (4, 5000, 5000)],
        "id long, ay int, ax int",
    )
    got = {
        (r["id"], r["boundary_id"])
        for r in pip_join_broadcast(pts, bdf).collect()
    }
    # point 2 sits in r1's hole; point 3 only in r2; point 4 nowhere
    assert got == {(1, "r1"), (3, "r2")}


def test_bnd_bad_magic():
    with pytest.raises(ValueError, match="unsupported boundary data type"):
        parse_bnd(b"\x00\x03XXX" + b"\x00" * 16)


def test_hgtconverter_read_height_offset_math(tmp_path):
    """Port of HGTConverterTest.testReadHeight/testLat0Top
    (test/.../reader/hgt/HGTConverterTest.java).  The original uses a
    downloaded S01W091.hgt (not shipped); here the same 1201x1201 file
    is synthesized with the tested value 308 at hgt cell (x=348, y=931)
    — whose file offset the reference asserts to be 646834 — and ocean
    (0) elsewhere, so every offset/indexing assertion carries over."""
    import struct

    res = 1200
    hgt_x, hgt_y = 348, 931
    grid = np.zeros((res + 1, res + 1), dtype=np.int16)
    grid[res - hgt_y, hgt_x] = 308  # row index from the north edge

    p = os.path.join(tmp_path, "S01W091.hgt")
    write_hgt(p, grid)
    data = open(p, "rb").read()

    # the reference's offset equation: 2 * ((res - y) * (res+1) + x)
    file_offset = 2 * ((res - hgt_y) * (res + 1) + hgt_x)
    assert file_offset == 646834
    assert struct.unpack_from(">h", data, file_offset)[0] == 308

    _, g = parse_hgt(data)
    assert get_elevation(g, hgt_x, hgt_y) == 308

    # bbox corners from testLat0Top are all ocean -> 0; the top edge is
    # EXACTLY lat 0 (the r4065 ArrayIndexOutOfBounds regression): the
    # north row is row index 0 / y == res, which must stay in bounds
    assert get_elevation(g, 0, res) == 0
    assert get_elevation(g, res, res) == 0
    assert get_elevation(g, 0, 0) == 0
    assert get_elevation(g, res, 0) == 0

    # georeferencing: S01W091 covers lat -1..0, lon -91..-90
    assert parse_hgt_name(p) == (-1, -91)

    # the exact lattice point samples to its stored value under both
    # interpolators (HGTConverter.interpolatedHeight at grid nodes)
    from mkgmap_spark.operators.raster import bicubic_sample, bilinear_sample

    px = grid[::-1].astype(np.float64).ravel()  # south-first like read_hgt
    fx = np.array([float(hgt_x)])
    fy = np.array([float(hgt_y)])  # south-first row == y from south
    assert bilinear_sample(px, res + 1, res + 1, fx, fy)[0] == 308.0
    assert bicubic_sample(px, res + 1, res + 1, fx, fy)[0] == 308.0
