"""PBF source: protobuf wire round-trip + Spark read, cross-checked
against the o5m reader on the same elements."""

from __future__ import annotations

from mkgmap_spark.sources.pbf import encode_pbf, parse_pbf, read_pbf, to_map_unit_nano


def _els():
    els = [
        {"id": i, "kind": "node", "tags": ({"amenity": "pub"} if i == 2 else {}),
         "lat_nano": 50_000_000_000 + i * 100_000, "lon_nano": -8_000_000_000 + i * 200_000}
        for i in range(1, 5)
    ]
    els.append({"id": 40, "kind": "way", "tags": {"highway": "primary", "name": "Main"},
                "refs": [1, 2, 3, 4]})
    els.append({"id": 50, "kind": "relation", "tags": {"type": "route"},
                "members": [{"role": "stop", "mtype": "node", "ref": 2},
                            {"role": "", "mtype": "way", "ref": 40}]})
    return els


def test_pbf_roundtrip():
    els = _els()
    data = encode_pbf(els)
    got = parse_pbf(data)
    assert len(got) == 6
    n2 = got[1]
    assert n2["id"] == 2 and n2["tags"] == {"amenity": "pub"}
    assert n2["lat"] == to_map_unit_nano(50_000_000_000 + 2 * 100_000)
    w = got[4]
    assert w["id"] == 40 and w["refs"] == [1, 2, 3, 4] and w["tags"]["name"] == "Main"
    r = got[5]
    assert r["members"] == [
        {"role": "stop", "mtype": "node", "ref": 2},
        {"role": "", "mtype": "way", "ref": 40},
    ]


def test_pbf_matches_o5m(spark, tmp_path):
    """The same elements through BOTH binary formats produce the same
    element table."""
    import os

    from mkgmap_spark.sources.o5m import encode_o5m, read_o5m

    els = _els()
    d1 = str(tmp_path / "pbf"); os.makedirs(d1)
    open(f"{d1}/a.osm.pbf", "wb").write(encode_pbf(els))
    d2 = str(tmp_path / "o5m"); os.makedirs(d2)
    o5m_els = []
    for e in els:
        e2 = dict(e)
        if e["kind"] == "node":
            e2["lat_1e7"] = e["lat_nano"] // 100
            e2["lon_1e7"] = e["lon_nano"] // 100
        o5m_els.append(e2)
    open(f"{d2}/a.o5m", "wb").write(encode_o5m(o5m_els))

    a = {(r["kind"], r["id"]): r for r in read_pbf(spark, d1).collect()}
    b = {(r["kind"], r["id"]): r for r in read_o5m(spark, d2).collect()}
    assert set(a) == set(b)
    for k in a:
        assert dict(a[k]["tags"] or {}) == dict(b[k]["tags"] or {}), k
        assert a[k]["lat"] == b[k]["lat"] and a[k]["lon"] == b[k]["lon"], k
        assert a[k]["refs"] == b[k]["refs"], k
