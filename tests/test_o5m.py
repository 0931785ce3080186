"""O5M binary source: varint/delta/string-table round-trip + the
Spark read path + way->node resolution."""

from __future__ import annotations

from mkgmap_spark.sources.o5m import (
    encode_o5m,
    parse_o5m,
    read_o5m,
    resolve_way_coords,
    to_map_unit_1e7,
)


def _elements():
    els = []
    for i in range(1, 6):
        els.append(
            {
                "id": i,
                "kind": "node",
                "tags": {"name": f"n{i}"} if i % 2 else {},
                "lat_1e7": 10_0000000 + i * 1000,
                "lon_1e7": -20_0000000 + i * 2000,
            }
        )
    els.append({"id": 100, "kind": "way", "tags": {"highway": "primary", "name": "n1"},
                "refs": [1, 2, 3]})
    els.append({"id": 101, "kind": "way", "tags": {"highway": "primary"}, "refs": [3, 4, 5]})
    els.append(
        {
            "id": 200,
            "kind": "relation",
            "tags": {"type": "route"},
            "members": [
                {"role": "stop", "mtype": "node", "ref": 1},
                {"role": "", "mtype": "way", "ref": 100},
            ],
        }
    )
    return els


def test_o5m_roundtrip():
    els = _elements()
    data = encode_o5m(els)
    assert data[0] == 0xFF and data[-1] == 0xFE
    got = parse_o5m(data)
    assert len(got) == len(els)
    n1 = got[0]
    assert n1["id"] == 1 and n1["kind"] == "node" and n1["tags"] == {"name": "n1"}
    assert n1["lat"] == to_map_unit_1e7(10_0000000 + 1000)
    assert n1["lon"] == to_map_unit_1e7(-20_0000000 + 2000)
    w = got[5]
    assert w["id"] == 100 and w["refs"] == [1, 2, 3]
    # the string table deduped 'name\x00n1' (used by node 1 AND way 100)
    assert data.count(b"name\x00n1") == 1
    r = got[7]
    assert r["members"][0] == {"role": "stop", "mtype": "node", "ref": 1}
    assert r["members"][1]["mtype"] == "way" and r["members"][1]["ref"] == 100


def test_o5m_negative_and_large_deltas():
    els = [
        {"id": 10, "kind": "node", "tags": {}, "lat_1e7": 899999999, "lon_1e7": -1799999999},
        {"id": 9, "kind": "node", "tags": {}, "lat_1e7": -899999999, "lon_1e7": 1799999999},
    ]
    got = parse_o5m(encode_o5m(els))
    assert [g["id"] for g in got] == [10, 9]
    assert got[1]["lat"] == to_map_unit_1e7(-899999999)


def test_read_o5m_spark(spark, tmp_path):
    import os

    d = str(tmp_path / "o5m")
    os.makedirs(d)
    open(f"{d}/a.o5m", "wb").write(encode_o5m(_elements()))
    df = read_o5m(spark, d)
    rows = {(r["kind"], r["id"]): r for r in df.collect()}
    assert len(rows) == 8
    assert rows[("node", 3)]["tags"]["name"] == "n3"
    assert rows[("way", 100)]["refs"] == [1, 2, 3]
    assert rows[("relation", 200)]["members"][1]["ref"] == 100

    ways = resolve_way_coords(df)
    w = {r["id"]: r for r in ways.collect()}
    assert len(w[100]["lats"]) == 3
    # order preserved: way 101 = nodes 3,4,5
    n = {r["id"]: (r["lat"], r["lon"]) for r in df.filter("kind = 'node'").collect()}
    assert w[101]["lats"] == [n[3][0], n[4][0], n[5][0]]
    assert w[101]["lons"] == [n[3][1], n[4][1], n[5][1]]


def test_resolve_way_coords_clipped_extract(spark):
    """Ways losing node refs at the extract boundary are flagged
    incomplete (OsmHandler.java:152-169), and is_complete() compiles to
    that flag instead of constant true."""
    from mkgmap_spark.rules.compiler import compile_rules
    from mkgmap_spark.rules.parser import parse_rules

    els = spark.createDataFrame(
        [
            (1, "node", {}, 100, 200, None),
            (2, "node", {}, 110, 210, None),
            (3, "node", {}, 120, 220, None),
            # complete way
            (10, "way", {"highway": "primary"}, None, None, [1, 2, 3]),
            # clipped: ref 99 outside the extract
            (11, "way", {"highway": "primary"}, None, None, [1, 2, 99]),
            # closed-in-OSM but clipped: first==last ref, middle lost
            (12, "way", {"highway": "primary"}, None, None, [1, 99, 2, 1]),
            # fully outside: dropped
            (13, "way", {"highway": "primary"}, None, None, [98, 99]),
        ],
        "id long, kind string, tags map<string,string>, lat int, lon int, refs array<long>",
    )
    ways = resolve_way_coords(els)
    w = {r["id"]: r for r in ways.collect()}
    assert set(w) == {10, 11, 12}
    assert w[10]["complete"] is True
    assert w[11]["complete"] is False
    assert w[12]["complete"] is False
    assert w[12]["closed_in_osm"] is True
    assert w[11]["closed_in_osm"] is False
    assert len(w[11]["lats"]) == 2  # lost position dropped, order kept

    rules = parse_rules(
        "highway=* & is_complete()=false { set mkgmap:clipped=yes } [0x01 resolution 24]\n"
        "highway=* [0x02 resolution 24]\n"
    )
    out = compile_rules(rules, ways).collect()
    got = {r["id"]: (r["tags_out"].get("mkgmap:clipped"), r["results"][0]["type_code"]) for r in out}
    assert got[10] == (None, 0x02)
    assert got[11] == ("yes", 0x01)
    assert got[12] == ("yes", 0x01)
