"""Polish .mp source: grammar round-trip + Spark read path."""

from __future__ import annotations

from mkgmap_spark.sources.polish import parse_mp, read_polish, to_map_unit, write_mp_fixture


def test_parse_mp_grammar():
    text = """
; a comment
[IMG ID]
ID=1
Level0=24
Level1=22
Level2=18
[END-IMG ID]

[POI]
Type=0x2c
SubType=0x01
Label=Cafe
Data0=(10.5,20.25)
[END]

[POLYLINE]
Type=0x06
Label=Main St
EndLevel=2
Data1=(0.0,0.0),(0.001,0.002),(0.002,0.004)
[END]

[POLYGON]
Type=0x50
Data0=(1.0,1.0),(1.0,1.1),(1.1,1.1),(1.1,1.0),(1.0,1.0)
[END]
"""
    feats = parse_mp(text)
    assert len(feats) == 3
    poi, line, poly = feats
    assert poi["kind"] == "node" and poi["type_code"] == (0x2C << 8 | 0x01)
    assert poi["label"] == "Cafe"
    assert poi["lats"] == [to_map_unit(10.5)] and poi["lons"] == [to_map_unit(20.25)]
    assert poi["min_res"] == poi["max_res"] == 24  # Data0 -> level 0 -> 24
    assert line["kind"] == "way" and len(line["lats"]) == 3
    assert line["max_res"] == 22  # Data1 -> level 1
    assert line["min_res"] == 18  # EndLevel=2 -> level 2 bits (from IMG ID)
    assert poly["type_code"] == 0x50 and len(poly["lats"]) == 5


def test_mp_fixture_roundtrip(tmp_path):
    feats = [
        {"sec": "node", "type": "0x2a", "label": "P", "pts": [(100000, 200000)]},
        {"sec": "line", "type": "0x06", "label": "L", "end_level": 2,
         "data_level": 0, "pts": [(0, 0), (5000, 5000), (9000, 12000)]},
        {"sec": "shape", "type": "0x50",
         "pts": [(0, 0), (0, 8000), (8000, 8000), (8000, 0), (0, 0)]},
    ]
    p = str(tmp_path / "fixture.mp")
    write_mp_fixture(p, feats)
    got = parse_mp(open(p).read())
    assert [f["kind"] for f in got] == ["node", "way", "way"]
    # coordinates survive the degrees round-trip within 1 map unit
    assert abs(got[0]["lats"][0] - 100000) <= 1
    assert abs(got[1]["lons"][2] - 12000) <= 1
    assert got[1]["min_res"] == 18 and got[1]["max_res"] == 24


def test_read_polish_spark(spark, tmp_path):
    import os

    d = str(tmp_path / "mp")
    os.makedirs(d)
    for k in range(3):
        feats = [
            {"sec": "node", "type": "0x2a", "label": f"P{k}", "pts": [(1000 * k, 2000 * k)]},
            {"sec": "line", "type": "0x06", "pts": [(0, 0), (500 + k, 700 + k)]},
        ]
        write_mp_fixture(f"{d}/tile{k}.mp", feats)
    df = read_polish(spark, d)
    rows = df.collect()
    assert len(rows) == 6
    kinds = sorted(r["kind"] for r in rows)
    assert kinds == ["node"] * 3 + ["way"] * 3
    # deterministic across reads
    again = read_polish(spark, d).collect()
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again)
    # ids unique
    assert len({r["id"] for r in rows}) == 6
