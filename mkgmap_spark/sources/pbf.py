"""OSM PBF source.

Reference: reader/osm/bin/OsmBinHandler.java:38-60 — the protobuf
block stream (crosby/osmpbf, public schema): a file is repeated
[4-byte big-endian length][BlobHeader][Blob]; OSMData blobs hold a
zlib-compressed PrimitiveBlock with a string table, dense nodes
(packed zigzag deltas for ids/lats/lons, interleaved key/val indices
with 0 separators), ways (packed key/val indices + delta refs) and
relations (roles_sid/memids deltas/types).  Coordinates are
nano-degrees scaled by the block granularity and offsets.

No protobuf library ships in this container, so this module decodes
the protobuf WIRE FORMAT directly (varint / zigzag / length-delimited
fields — the full generality of protobuf isn't needed, only the
osmpbf message shapes) plus an encoder for fixture round-trips.
One Arrow kernel per file, like the other sources.
"""

from __future__ import annotations

import math
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .o5m import O5M_SCHEMA, squash_raw_tags


# ------------------------------------------------------- wire primitives
def _rd_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _wr_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _wr_zigzag(v: int) -> bytes:
    return _wr_varint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


def _fields(buf: bytes):
    """Iterate (field_no, wiretype, value) over a protobuf message;
    value is int for varint (0) / fixed (1, 5), bytes for
    length-delimited (2)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _rd_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _rd_varint(buf, pos)
        elif wt == 2:
            ln, pos = _rd_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[pos : pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_varints(buf: bytes, zigzag: bool = False) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _rd_varint(buf, pos)
        out.append(_zigzag(v) if zigzag else v)
    return out


def _tag(fno: int, wt: int) -> bytes:
    return _wr_varint(fno << 3 | wt)


def _ld(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _wr_varint(len(payload)) + payload


# --------------------------------------------------------------- decode
def to_map_unit_nano(nano_deg: int) -> int:
    return int(math.floor(nano_deg * ((1 << 24) / 360e9) + 0.5))


def parse_pbf(data: bytes) -> list[dict]:
    """Decode one .osm.pbf byte stream into element dicts (same shape
    as sources/o5m.parse_o5m)."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        (hlen,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        header = data[pos : pos + hlen]
        pos += hlen
        btype = None
        dsize = 0
        for fno, _wt, v in _fields(header):
            if fno == 1:
                btype = v.decode()
            elif fno == 3:
                dsize = v
        blob = data[pos : pos + dsize]
        pos += dsize
        raw = None
        for fno, _wt, v in _fields(blob):
            if fno == 1:
                raw = v
            elif fno == 3:
                raw = zlib.decompress(v)
        if btype != "OSMData" or raw is None:
            continue
        out.extend(_parse_primitive_block(raw))
    return out


def _parse_primitive_block(buf: bytes) -> list[dict]:
    strings: list[str] = []
    groups: list[bytes] = []
    granularity = 100
    lat_off = lon_off = 0
    for fno, _wt, v in _fields(buf):
        if fno == 1:  # stringtable
            for f2, _w2, s in _fields(v):
                if f2 == 1:
                    strings.append(s.decode("utf-8"))
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            granularity = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v
    out: list[dict] = []
    for g in groups:
        for fno, _wt, v in _fields(g):
            if fno == 2:  # DenseNodes
                ids = lats = lons = kv = None
                for f2, _w2, p in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(p, zigzag=True)
                    elif f2 == 8:
                        lats = _packed_varints(p, zigzag=True)
                    elif f2 == 9:
                        lons = _packed_varints(p, zigzag=True)
                    elif f2 == 10:
                        kv = _packed_varints(p)
                kv = kv or []
                cid = clat = clon = 0
                ki = 0
                for i in range(len(ids or [])):
                    cid += ids[i]
                    clat += lats[i]
                    clon += lons[i]
                    tags = {}
                    while ki < len(kv) and kv[ki] != 0:
                        tags[strings[kv[ki]]] = strings[kv[ki + 1]]
                        ki += 2
                    ki += 1  # the 0 separator
                    out.append(
                        {
                            "id": cid,
                            "kind": "node",
                            "tags": tags,
                            "lat": to_map_unit_nano(lat_off + granularity * clat),
                            "lon": to_map_unit_nano(lon_off + granularity * clon),
                        }
                    )
            elif fno == 3:  # Way
                wid = 0
                keys = vals = refs = []
                for f2, _w2, p in _fields(v):
                    if f2 == 1:
                        wid = p
                    elif f2 == 2:
                        keys = _packed_varints(p)
                    elif f2 == 3:
                        vals = _packed_varints(p)
                    elif f2 == 8:
                        refs = _packed_varints(p, zigzag=True)
                cur = 0
                abs_refs = []
                for d in refs:
                    cur += d
                    abs_refs.append(cur)
                out.append(
                    {
                        "id": wid,
                        "kind": "way",
                        "tags": {strings[k]: strings[x] for k, x in zip(keys, vals)},
                        "refs": abs_refs,
                    }
                )
            elif fno == 4:  # Relation
                rid = 0
                keys = vals = roles = memids = types = []
                for f2, _w2, p in _fields(v):
                    if f2 == 1:
                        rid = p
                    elif f2 == 2:
                        keys = _packed_varints(p)
                    elif f2 == 3:
                        vals = _packed_varints(p)
                    elif f2 == 8:
                        roles = _packed_varints(p)
                    elif f2 == 9:
                        memids = _packed_varints(p, zigzag=True)
                    elif f2 == 10:
                        types = _packed_varints(p)
                cur = 0
                members = []
                for i in range(len(memids)):
                    cur += memids[i]
                    members.append(
                        {
                            "role": strings[roles[i]],
                            "mtype": ["node", "way", "relation"][types[i]],
                            "ref": cur,
                        }
                    )
                out.append(
                    {
                        "id": rid,
                        "kind": "relation",
                        "tags": {strings[k]: strings[x] for k, x in zip(keys, vals)},
                        "members": members,
                    }
                )
    return out


# --------------------------------------------------------------- encode
def encode_pbf(elements: list[dict], granularity: int = 100) -> bytes:
    """Encode element dicts into one OSMData block .osm.pbf (fixture
    generator; coordinates in nano-degrees via 'lat_nano'/'lon_nano')."""
    strings = [""]  # index 0 reserved
    sidx: dict[str, int] = {}

    def s(x: str) -> int:
        if x not in sidx:
            sidx[x] = len(strings)
            strings.append(x)
        return sidx[x]

    groups = bytearray()
    nodes = [e for e in elements if e["kind"] == "node"]
    if nodes:
        ids = lats = lons = None
        idb, latb, lonb, kvb = bytearray(), bytearray(), bytearray(), bytearray()
        cid = clat = clon = 0
        for e in nodes:
            idb += _wr_zigzag(e["id"] - cid)
            latb += _wr_zigzag(e["lat_nano"] // granularity - clat)
            lonb += _wr_zigzag(e["lon_nano"] // granularity - clon)
            cid, clat, clon = e["id"], e["lat_nano"] // granularity, e["lon_nano"] // granularity
            for k, v in e.get("tags", {}).items():
                kvb += _wr_varint(s(k)) + _wr_varint(s(v))
            kvb += _wr_varint(0)
        dense = _ld(1, bytes(idb)) + _ld(8, bytes(latb)) + _ld(9, bytes(lonb)) + _ld(10, bytes(kvb))
        groups += _ld(2, _ld(2, dense))
    for e in elements:
        if e["kind"] == "way":
            keys = b"".join(_wr_varint(s(k)) for k in e.get("tags", {}))
            vals = b"".join(_wr_varint(s(v)) for v in e.get("tags", {}).values())
            refb = bytearray()
            cur = 0
            for r in e["refs"]:
                refb += _wr_zigzag(r - cur)
                cur = r
            way = _tag(1, 0) + _wr_varint(e["id"]) + _ld(2, keys) + _ld(3, vals) + _ld(8, bytes(refb))
            groups += _ld(2, _ld(3, way))
        elif e["kind"] == "relation":
            keys = b"".join(_wr_varint(s(k)) for k in e.get("tags", {}))
            vals = b"".join(_wr_varint(s(v)) for v in e.get("tags", {}).values())
            roles = b"".join(_wr_varint(s(m["role"])) for m in e["members"])
            types = b"".join(
                _wr_varint({"node": 0, "way": 1, "relation": 2}[m["mtype"]]) for m in e["members"]
            )
            memb = bytearray()
            cur = 0
            for m in e["members"]:
                memb += _wr_zigzag(m["ref"] - cur)
                cur = m["ref"]
            rel = (
                _tag(1, 0) + _wr_varint(e["id"]) + _ld(2, keys) + _ld(3, vals)
                + _ld(8, roles) + _ld(9, bytes(memb)) + _ld(10, types)
            )
            groups += _ld(2, _ld(4, rel))
    st = b"".join(_ld(1, x.encode("utf-8")) for x in strings)
    block = _ld(1, st) + bytes(groups) + _tag(17, 0) + _wr_varint(granularity)
    blob = _tag(2, 0) + _wr_varint(len(block)) + _ld(3, zlib.compress(block))
    header = _ld(1, b"OSMData") + _tag(3, 0) + _wr_varint(len(blob))
    return struct.pack(">I", len(header)) + header + blob


def read_pbf(spark: SparkSession, path: str) -> DataFrame:
    """Read .osm.pbf files into the raw element table (O5M_SCHEMA)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def kernel(it):
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                for el in parse_pbf(bytes(content)):
                    rows.append(
                        (
                            el["id"],
                            el["kind"],
                            squash_raw_tags(el.get("tags", {})),
                            el.get("lat"),
                            el.get("lon"),
                            el.get("refs"),
                            el.get("members"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["id", "kind", "tags", "lat", "lon", "refs", "members"]
            )

    return files.mapInPandas(kernel, O5M_SCHEMA)
