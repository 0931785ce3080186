"""O5M binary source.

Reference: reader/osm/o5m/O5mBinHandler.java:35-55 — the o5m format
(public spec: 0xff reset marker, 0xe0 header dataset carrying "o5m2",
datasets 0x10 node / 0x11 way / 0x12 relation / 0xdb..0xdd bbox etc.,
0xfe EOF): unsigned little-endian 7-bit varints, signed varints with
the sign in the lowest bit, DELTA-encoded ids/coordinates/refs, and a
sliding string-pair table (the most recent 15000 short strings are
referenced by back-distance instead of repeated inline).

This module implements a real decoder (and an encoder for fixtures /
round-trip tests) in pure Python, run per FILE in an Arrow kernel —
o5m is a sequential delta stream, so a file is the parallelism unit,
exactly like the reference's thread-per-input-file model.

Coordinates are 100-nano-degree ints in the stream; converted to
24-bit map units with the reference's toMapUnit rounding.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RESET = 0xFF
EOF_MARK = 0xFE
HEADER = 0xE0
NODE = 0x10
WAY = 0x11
REL = 0x12

STRING_TABLE_SIZE = 15000
MAX_STRING_REF_LEN = 250


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _svarint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(buf, pos)
    if u & 1:
        return -((u >> 1) + 1), pos
    return u >> 1, pos


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_svarint(v: int) -> bytes:
    return _enc_uvarint((-v - 1) << 1 | 1 if v < 0 else v << 1)


def to_map_unit_1e7(coord_1e7: int) -> int:
    """100-nano-degrees -> 24-bit map units (Utils.toMapUnit rounding)."""
    return int(math.floor(coord_1e7 * ((1 << 24) / 360e7) + 0.5))


class _StringTable:
    def __init__(self):
        self.items: list[bytes] = []

    def push(self, pair: bytes):
        if len(pair) <= MAX_STRING_REF_LEN:
            self.items.append(pair)
            if len(self.items) > STRING_TABLE_SIZE:
                self.items.pop(0)

    def ref(self, dist: int) -> bytes:
        return self.items[-dist]

    def find(self, pair: bytes) -> int | None:
        # encoder side: back-distance of the most recent occurrence
        for i in range(len(self.items) - 1, -1, -1):
            if self.items[i] == pair:
                return len(self.items) - i
        return None


def _read_pair(buf: bytes, pos: int, table: _StringTable) -> tuple[str, str, int]:
    if buf[pos] == 0x00:
        end1 = buf.index(0x00, pos + 1)
        end2 = buf.index(0x00, end1 + 1)
        pair = buf[pos + 1 : end2]
        table.push(pair)
        k = buf[pos + 1 : end1].decode("utf-8")
        v = buf[end1 + 1 : end2].decode("utf-8")
        return k, v, end2 + 1
    dist, pos = _uvarint(buf, pos)
    pair = table.ref(dist)
    k, _, v = pair.partition(b"\x00")
    return k.decode("utf-8"), v.decode("utf-8"), pos


def _write_pair(k: str, v: str, table: _StringTable) -> bytes:
    pair = k.encode("utf-8") + b"\x00" + v.encode("utf-8")
    dist = table.find(pair)
    if dist is not None:
        return _enc_uvarint(dist)
    table.push(pair)
    return b"\x00" + pair + b"\x00"


def parse_o5m(data: bytes) -> list[dict]:
    """Decode one .o5m byte stream into element dicts
    (id, kind, tags, lat/lon map units | refs | members)."""
    out: list[dict] = []
    pos = 0
    table = _StringTable()
    d_id = d_lon = d_lat = d_wref = 0
    d_mref = [0, 0, 0]  # per member type

    def reset():
        nonlocal d_id, d_lon, d_lat, d_wref, d_mref, table
        d_id = d_lon = d_lat = d_wref = 0
        d_mref = [0, 0, 0]
        table = _StringTable()

    n = len(data)
    while pos < n:
        t = data[pos]
        pos += 1
        if t == RESET:
            reset()
            continue
        if t == EOF_MARK:
            break
        length, pos = _uvarint(data, pos)
        body = data[pos : pos + length]
        pos += length
        if t == HEADER:
            continue
        if t not in (NODE, WAY, REL):
            continue  # bbox/timestamp/other datasets skipped
        p = 0
        did, p = _svarint(body, p)
        d_id += did
        # version info: 0 = no metadata (the only form we emit; foreign
        # files with metadata are consumed and discarded)
        ver, p = _uvarint(body, p)
        if ver != 0:
            ts, p = _svarint(body, p)
            if ts != 0:
                _cs, p = _svarint(body, p)
                _u1, _u2, p = _read_pair(body, p, table)
        if t == NODE:
            dlon, p = _svarint(body, p)
            dlat, p = _svarint(body, p)
            d_lon += dlon
            d_lat += dlat
            tags = {}
            while p < len(body):
                k, v, p = _read_pair(body, p, table)
                tags[k] = v
            out.append(
                {
                    "id": d_id,
                    "kind": "node",
                    "tags": tags,
                    "lat": to_map_unit_1e7(d_lat),
                    "lon": to_map_unit_1e7(d_lon),
                }
            )
        elif t == WAY:
            rlen, p = _uvarint(body, p)
            rend = p + rlen
            refs = []
            while p < rend:
                dr, p = _svarint(body, p)
                d_wref += dr
                refs.append(d_wref)
            tags = {}
            while p < len(body):
                k, v, p = _read_pair(body, p, table)
                tags[k] = v
            out.append({"id": d_id, "kind": "way", "tags": tags, "refs": refs})
        else:  # relation
            rlen, p = _uvarint(body, p)
            rend = p + rlen
            members = []
            while p < rend:
                dr, p = _svarint(body, p)
                # the type+role string names the member type
                tr, _v, p = _read_pair(body, p, table)
                mtype = {"0": "node", "1": "way", "2": "relation"}[tr[0]]
                ti = int(tr[0])
                d_mref[ti] += dr
                members.append({"role": tr[1:], "mtype": mtype, "ref": d_mref[ti]})
            tags = {}
            while p < len(body):
                k, v, p = _read_pair(body, p, table)
                tags[k] = v
            out.append({"id": d_id, "kind": "relation", "tags": tags, "members": members})
    return out


def encode_o5m(elements: list[dict]) -> bytes:
    """Encode element dicts (ids ascending per kind, coordinates in
    100-nano-degrees via 'lat_1e7'/'lon_1e7') into an .o5m byte stream
    — the fixture generator for the decoder's round-trip tests."""
    out = bytearray([RESET])
    out += bytes([HEADER]) + _enc_uvarint(4) + b"o5m2"
    table = _StringTable()
    d_id = d_lon = d_lat = d_wref = 0
    d_mref = [0, 0, 0]
    for el in elements:
        body = bytearray()
        body += _enc_svarint(el["id"] - d_id)
        d_id = el["id"]
        body += _enc_uvarint(0)  # version 0: no metadata
        if el["kind"] == "node":
            t = NODE
            body += _enc_svarint(el["lon_1e7"] - d_lon)
            body += _enc_svarint(el["lat_1e7"] - d_lat)
            d_lon, d_lat = el["lon_1e7"], el["lat_1e7"]
        elif el["kind"] == "way":
            t = WAY
            refs = bytearray()
            for r in el["refs"]:
                refs += _enc_svarint(r - d_wref)
                d_wref = r
            body += _enc_uvarint(len(refs)) + refs
        else:
            t = REL
            mem = bytearray()
            for m in el["members"]:
                ti = {"node": 0, "way": 1, "relation": 2}[m["mtype"]]
                mem += _enc_svarint(m["ref"] - d_mref[ti])
                d_mref[ti] = m["ref"]
                mem += _write_pair(str(ti) + m["role"], "", table)
            body += _enc_uvarint(len(mem)) + mem
        for k, v in el.get("tags", {}).items():
            body += _write_pair(k, v, table)
        out += bytes([t]) + _enc_uvarint(len(body)) + body
    out.append(EOF_MARK)
    return bytes(out)


O5M_SCHEMA = (
    "id long, kind string, tags map<string,string>, lat int, lon int, "
    "refs array<long>, members array<struct<role: string, mtype: string, ref: long>>"
)

# Raw-OSM tag-value normalization (Element.addTagFromRawOSM /
# Label.squashSpaces + squashDel): Java-trim (codepoints <= U+0020),
# collapse ASCII-whitespace RUNS to one space, strip DEL (0x7f).
# Applied by every OSM reader (XML / o5m / PBF), matching the three
# reference handlers that call addTagFromRawOSM.
_JAVA_WS = "".join(chr(i) for i in range(0x21))
_SQUASH_SPACES = re.compile(r"[ \t\n\x0b\f\r][ \t\n\x0b\f\r]+")


def squash_raw_tag(val: str | None) -> str | None:
    """Label.squashSpaces/squashDel semantics for one tag value."""
    if val is None:
        return None
    val = val.strip(_JAVA_WS)
    if val:
        val = _SQUASH_SPACES.sub(" ", val)
        val = val.replace("\x7f", "")
    return val


def squash_raw_tags(tags: dict) -> dict:
    """Apply squash_raw_tag to every value of a raw tag dict."""
    return {k: squash_raw_tag(v) for k, v in tags.items()}


def read_o5m(spark: SparkSession, path: str) -> DataFrame:
    """Read .o5m files into the raw element table (nodes with map-unit
    coords, ways with node-ref lists, relations with members) — the
    input to way->node resolution and the rest of the engine.  One
    Arrow kernel per file (sequential delta stream)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def kernel(it):
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                for el in parse_o5m(bytes(content)):
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


def resolve_way_coords(elements: DataFrame) -> DataFrame:
    """way->node coordinate resolution (ElementSaver.java:95-106) as an
    order-preserving equi join: explode refs with position, join the
    node table on id, re-assemble sorted by position.

    Also derives the reference's extract-boundary bookkeeping
    (OsmHandler.java:152-169): ``complete`` is false when any node ref
    failed to resolve (the way was clipped by the input extract — the
    inner join dropped those positions), and ``closed_in_osm`` records
    whether first and last REF are equal, which is how the reference
    decides closedness for incomplete ways (Way.isClosed:105-109).
    Ways whose refs ALL fall outside the extract have no coordinates
    at all and are dropped entirely."""
    from pyspark.sql import functions as F

    nodes = elements.filter(F.col("kind") == "node").select(
        F.col("id").alias("ref"), F.col("lat").alias("_ny"), F.col("lon").alias("_nx")
    )
    ways = elements.filter(F.col("kind") == "way").select(
        "id",
        "tags",
        F.size("refs").alias("_n_refs"),
        (F.expr("refs[0]") == F.expr("refs[size(refs) - 1]")).alias("_closed_osm"),
        F.posexplode("refs").alias("pos", "ref"),
    )
    j = ways.join(nodes, "ref")
    return (
        j.groupBy("id")
        .agg(
            F.first("tags").alias("tags"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_ny", "_nx"))),
                lambda s: s.getField("_ny"),
            ).alias("lats"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_ny", "_nx"))),
                lambda s: s.getField("_nx"),
            ).alias("lons"),
            (F.count(F.lit(1)) == F.first("_n_refs")).alias("complete"),
            F.first("_closed_osm").alias("closed_in_osm"),
        )
    )
