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
    feats, restr = parse_mp(text)
    assert len(feats) == 3 and restr == []
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
    got, _ = parse_mp(open(p).read())
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


def test_parse_mp_full_sections():
    """Routing block, address attributes, restrictions, contour feet
    conversion, multiple Data concatenation (the full section set)."""
    text = """
[IMG ID]
ID=1
Elevation=M
Level0=24
Level1=22
[END-IMG ID]

[POLYLINE]
Type=0x06
Label=Ring
Label2=Second
RoadID=4711
RouteParam=3,2,1,0,0,0,1,0,0,0,0,0
Nod1=0,100,0
Nod2=2,101,1
Numbers1=0,O,1,9,E,2,10
CityName=Hafen
ZipCode=12345
StreetDesc=Ringstrasse
Data0=(0.0,0.0),(0.001,0.001)
Data0=(0.002,0.002)
[END]

[POLYLINE]
Type=0x21
Label=100
Data0=(0.1,0.1),(0.2,0.2)
[END]

[POI]
Type=0x2a
Label=Cafe
Phone=555-1
CountryName=DE
is_in=Hamburg,Germany
Data0=(1.0,1.0)
[END]

[Restrict]
TraffPoints=16968,25008,25009
TraffRoads=520763,532674
[END-Restrict]

[Restrict]
TraffPoints=1,2,3,4
TraffRoads=5,6
[END-Restrict]
"""
    feats, restr = parse_mp(text)
    road, contour, poi = feats
    assert road["road_id"] == 4711
    assert road["road_speed"] == 3 and road["road_class"] == 2
    assert road["oneway"] is True and road["toll"] is False
    # denied car (bit 2) -> allowed mask clears it
    assert road["access_allowed"] == (~(1 << 2)) & 0xFF
    assert road["nodes"] == [
        {"index": 0, "node_id": 100, "boundary": False},
        {"index": 2, "node_id": 101, "boundary": True},
    ]
    assert road["numbers"] == ["0,O,1,9,E,2,10"]
    assert road["attrs"]["city"] == "Hafen" and road["attrs"]["zip"] == "12345"
    assert road["attrs"]["street"] == "Ringstrasse"
    assert road["attrs"]["label2"] == "Second"
    # multiple Data lines concatenate
    assert len(road["lats"]) == 3
    # contour type 0x21 with Elevation=m: label 100 m -> 328 ft
    assert contour["label"] == "328"
    assert poi["attrs"]["phone"] == "555-1" and poi["attrs"]["country"] == "DE"
    assert poi["attrs"]["is_in"] == "Hamburg,Germany"
    # only the 3-node restriction form is kept
    assert len(restr) == 1
    r = restr[0]
    assert (r["from_node"], r["via_node"], r["to_node"]) == (16968, 25008, 25009)
    assert (r["from_road"], r["to_road"]) == (520763, 532674)


def test_read_polish_restrictions_spark(spark, tmp_path):
    import os

    from mkgmap_spark.sources.polish import read_polish_restrictions

    d = str(tmp_path / "mp")
    os.makedirs(d)
    with open(f"{d}/t.mp", "w") as f:
        f.write(
            "[IMG ID]\nID=1\n[END-IMG ID]\n"
            "[Restrict]\nTraffPoints=1,2,3\nTraffRoads=10,11\n[END-Restrict]\n"
        )
    rows = read_polish_restrictions(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["via_node"] == 2 and rows[0]["to_road"] == 11


def test_read_polish_gz(spark, tmp_path):
    """.mp.gz inputs decompress transparently (the reference's
    isFileSupported accepts .mp.gz)."""
    import gzip
    import os

    d = tmp_path / "mp"
    os.makedirs(d)
    with gzip.open(d / "t.mp.gz", "wt") as f:
        f.write(
            "[IMG ID]\nID=1\n[END-IMG ID]\n"
            "[POI]\nType=0x2a\nLabel=Z\nData0=(1.0,2.0)\n[END]\n"
        )
    rows = read_polish(spark, str(d)).collect()
    assert len(rows) == 1 and rows[0]["label"] == "Z"
