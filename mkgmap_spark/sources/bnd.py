"""Boundary ``.bnd`` file source (precompiled admin boundaries).

Reference: reader/osm/boundary/BoundaryUtil.java — a ``.bnd`` file is
Java DataOutputStream records:

- header: UTF "BND", long create-time, int header-length, then inside
  the header blob: UTF data-format ("RAW"/"QUADTREE"), int record
  version, UTF mkgmap release (loadQuadTreeFromStream:442-505);
- RAW v1 records until EOF (readStreamRawFormat:284-330): int minLat,
  minLong, maxLat, maxLong, int record-size (for bbox skipping), UTF
  id, int tag count, (UTF key, UTF value) pairs, then the area as a
  serialized Path2D (readAreaAsPath:200-273): int winding rule, then
  typed segments — SEG_MOVETO(0) one delta-coded point, SEG_LINETO(1)
  int run-length + that many points, SEG_CLOSE(4) — terminated by -1;
- each coordinate is a delta against the previous value, written as a
  VarDouble (writeVarDouble:508-525: the raw IEEE-754 bits emitted as
  MSB-first 7-bit groups with a continuation bit, trailing zero bits
  elided); a +Infinity delta is the RESET marker and the next
  VarDouble is an absolute value (BoundarySaver.RESET_DELTA:49).

The QUADTREE format is an internal cache layout of the same data; the
engine consumes RAW (what the boundary preparer's first pass writes)
and converts straight to the PIP-join boundary table
(boundary_id, admin_level, name, postcode, rings).
"""

from __future__ import annotations

import io
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RESET_DELTA = float("inf")
_SEG_MOVETO = 0
_SEG_LINETO = 1
_SEG_CLOSE = 4


# ---------------------------------------------------------------- varDouble
def read_var_double(f) -> float:
    """BoundaryUtil.readVarDouble:686-706."""
    res = 0
    to_shift = 64 - 7
    while True:
        b = f.read(1)
        if not b:
            raise EOFError
        b = b[0]
        if not (b & 0x80):
            break
        res |= b & 0x7F
        to_shift -= 7
        if to_shift > 0:
            res = (res << 7) & 0xFFFFFFFFFFFFFFFF
    if to_shift > 0:
        res |= b
        res = (res << to_shift) & 0xFFFFFFFFFFFFFFFF
    else:
        # all 64 bits written (9*7 + 1 — a 10th group only exists when
        # the mantissa LSB is 1, so the reference hardcodes it, :700-704)
        res = ((res << 1) | 1) & 0xFFFFFFFFFFFFFFFF
    return struct.unpack(">d", struct.pack(">Q", res))[0]


def write_var_double(out, val: float) -> None:
    """BoundarySaver.writeVarDouble:508-525 (fixture writer twin)."""
    v64 = struct.unpack(">Q", struct.pack(">d", val))[0]
    if v64 == 0:
        out.write(b"\x00")
        return
    buf = bytearray()
    while v64 != 0:
        v64 = ((v64 << 7) | (v64 >> 57)) & 0xFFFFFFFFFFFFFFFF  # rotl 7
        buf.append((v64 & 0x7F) | 0x80)
        v64 &= 0xFFFFFFFFFFFFFF80
    buf[-1] &= 0x7F
    out.write(bytes(buf))


def _read_utf(f) -> str:
    (n,) = struct.unpack(">H", f.read(2))
    return f.read(n).decode("utf-8")


def _write_utf(out, s: str) -> None:
    b = s.encode("utf-8")
    out.write(struct.pack(">H", len(b)))
    out.write(b)


def _read_int(f) -> int:
    b = f.read(4)
    if len(b) < 4:
        raise EOFError
    return struct.unpack(">i", b)[0]


# ---------------------------------------------------------------- area path
def read_area_path(f) -> list[list[tuple[int, int]]]:
    """readAreaAsPath:200-273 -> list of rings (closed sub-paths).

    Coordinates round back to integer map units (the saver serializes
    int coordinates through doubles)."""
    _winding = _read_int(f)
    rings: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    res = [0.0, 0.0]
    seg_type = _read_int(f)

    def read_pt():
        for i in range(2):
            delta = read_var_double(f)
            if delta == RESET_DELTA:
                res[i] = read_var_double(f)
            else:
                res[i] = res[i] + delta
        # Path2D x = longitude, y = latitude (Java2DConverter axes)
        return (int(round(res[1])), int(round(res[0])))

    while seg_type >= 0:
        if seg_type == _SEG_MOVETO:
            if cur:
                rings.append(cur)
            cur = [read_pt()]
        elif seg_type == _SEG_LINETO:
            n = _read_int(f)
            for _ in range(n):
                cur.append(read_pt())
        elif seg_type == _SEG_CLOSE:
            if cur:
                if cur[0] != cur[-1]:
                    cur.append(cur[0])
                rings.append(cur)
                cur = []
        else:
            raise ValueError(f"unsupported path segment type {seg_type}")
        seg_type = _read_int(f)
    if cur:
        rings.append(cur)
    return rings


def parse_bnd(data: bytes) -> list[dict]:
    """Parse one RAW v1 .bnd file into boundary dicts."""
    f = io.BytesIO(data)
    magic = _read_utf(f)
    if magic != "BND":
        raise ValueError(f"unsupported boundary data type {magic!r}")
    _create_time = struct.unpack(">q", f.read(8))[0]
    header_len = _read_int(f)
    header = io.BytesIO(f.read(header_len))
    data_format = _read_utf(header) if header_len else "RAW"
    version = _read_int(header) if header.tell() < header_len else 1
    if data_format != "RAW" or version != 1:
        raise ValueError(f"unsupported boundary format {data_format} v{version}")

    out = []
    while True:
        try:
            min_lat = _read_int(f)
        except EOFError:
            break
        _min_lon, _max_lat, _max_lon = _read_int(f), _read_int(f), _read_int(f)
        _bsize = _read_int(f)
        bid = _read_utf(f)
        n_tags = _read_int(f)
        tags = {}
        for _ in range(n_tags):
            k = _read_utf(f)
            tags[k] = _read_utf(f)
        rings = read_area_path(f)
        out.append({"boundary_id": bid, "tags": tags, "rings": rings})
    return out


def write_bnd(path: str, boundaries: list[dict]) -> None:
    """Fixture writer twin of BoundarySaver (RAW v1): boundaries are
    {boundary_id, tags: dict, rings: [[(lat, lon), ...]]} — first ring
    outer, later rings holes (the winding encodes that in the real
    files; the writer emits each ring as MOVETO/LINETO/CLOSE)."""
    body = io.BytesIO()
    for b in boundaries:
        rec = io.BytesIO()
        _write_utf(rec, b["boundary_id"])
        rec.write(struct.pack(">i", len(b["tags"])))
        for k, v in b["tags"].items():
            _write_utf(rec, k)
            _write_utf(rec, v)
        rec.write(struct.pack(">i", 1))  # WIND_NON_ZERO
        last = [None, None]
        for ring in b["rings"]:
            for j, (lat, lon) in enumerate(ring):
                rec.write(struct.pack(">i", _SEG_MOVETO if j == 0 else _SEG_LINETO))
                if j > 0:
                    rec.write(struct.pack(">i", 1))  # run length 1
                for i, v in enumerate((float(lon), float(lat))):
                    if last[i] is None:
                        write_var_double(rec, RESET_DELTA)
                        write_var_double(rec, v)
                    else:
                        write_var_double(rec, v - last[i])
                    last[i] = v
            rec.write(struct.pack(">i", _SEG_CLOSE))
        rec.write(struct.pack(">i", -1))
        payload = rec.getvalue()
        lats = [p[0] for r in b["rings"] for p in r]
        lons = [p[1] for r in b["rings"] for p in r]
        body.write(
            struct.pack(">iiii", min(lats), min(lons), max(lats), max(lons))
        )
        body.write(struct.pack(">i", len(payload)))
        body.write(payload)
    header = io.BytesIO()
    _write_utf(header, "RAW")
    header.write(struct.pack(">i", 1))
    _write_utf(header, "mkgmap_spark")
    hb = header.getvalue()
    with open(path, "wb") as out:
        _write_utf(out, "BND")
        out.write(struct.pack(">q", 0))
        out.write(struct.pack(">i", len(hb)))
        out.write(hb)
        out.write(body.getvalue())


def read_bnd(spark: SparkSession, path: str) -> DataFrame:
    """Decode .bnd files into the PIP-join boundary table:
    (boundary_id, admin_level, name, postcode, rings) with rings as
    array<struct<lats, lons, is_hole>> — the first ring of a boundary
    is the outer, subsequent rings are holes (the dominant admin
    boundary layout; nested-multi-outer files keep every ring with
    is_hole=false beyond index 0 only when winding says so is NOT
    recovered — documented divergence, the quadtree cache format
    carries that explicitly)."""
    files = spark.read.format("binaryFile").load(path)

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                for b in parse_bnd(bytes(r.content)):
                    tags = b["tags"]
                    rings = [
                        {
                            "lats": [p[0] for p in ring],
                            "lons": [p[1] for p in ring],
                            "is_hole": i > 0,
                        }
                        for i, ring in enumerate(b["rings"])
                    ]
                    rows.append(
                        {
                            "boundary_id": b["boundary_id"],
                            "admin_level": int(tags.get("admin_level", "0") or 0),
                            "name": tags.get("name"),
                            "postcode": tags.get("postal_code") or tags.get("postcode"),
                            "rings": rings,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["boundary_id", "admin_level", "name", "postcode", "rings"],
            )

    return files.select("path", "content").mapInPandas(
        kernel,
        "boundary_id string, admin_level int, name string, postcode string, "
        "rings array<struct<lats: array<int>, lons: array<int>, is_hole: boolean>>",
    )
