"""OSM XML source: fixture round-trip + Spark read + the end-to-end
hop into way->node resolution and the style engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.sources.o5m import resolve_way_coords
from mkgmap_spark.sources.osm_xml import (
    parse_osm_xml,
    read_osm_xml,
    to_map_unit,
    write_osm_xml_fixture,
)


def _els():
    els = [
        {"id": i, "kind": "node", "tags": ({"name": f"n{i}"} if i == 1 else {}),
         "lat_deg": 50.0 + i * 0.001, "lon_deg": 8.0 + i * 0.002}
        for i in range(1, 5)
    ]
    els.append({"id": 10, "kind": "way", "tags": {"highway": "primary", "ref": "B3"},
                "refs": [1, 2, 3, 4]})
    els.append({"id": 20, "kind": "relation", "tags": {"type": "route", "route": "bus", "ref": "7"},
                "members": [{"role": "stop", "mtype": "node", "ref": 1},
                            {"role": "", "mtype": "way", "ref": 10}]})
    return els


def test_parse_roundtrip(tmp_path):
    p = str(tmp_path / "f.osm")
    write_osm_xml_fixture(p, _els())
    got = parse_osm_xml(open(p).read())
    assert [g["kind"] for g in got] == ["node"] * 4 + ["way", "relation"]
    assert got[0]["lat"] == to_map_unit(50.001)
    assert got[4]["refs"] == [1, 2, 3, 4]
    assert got[5]["members"][0] == {"role": "stop", "mtype": "node", "ref": 1}


def test_osm_xml_to_style_engine(spark, tmp_path):
    """The full front door: .osm file -> element table -> way->node
    resolution -> rule engine emission."""
    import os

    from mkgmap_spark.rules import compile_rules, parse_rules

    d = str(tmp_path / "osm")
    os.makedirs(d)
    write_osm_xml_fixture(f"{d}/a.osm", _els())
    elements = read_osm_xml(spark, d)
    assert elements.count() == 6
    ways = resolve_way_coords(elements)
    w = ways.collect()[0]
    assert len(w["lats"]) == 4 and dict(w["tags"])["highway"] == "primary"

    rules = parse_rules("highway=primary & length() > 0 { name '${ref}' } [0x02 resolution 18]")
    out = compile_rules(rules, ways.withColumnRenamed("tags", "tags_in"), tags_col="tags_in").collect()[0]
    assert [r["type_code"] for r in out["results"]] == [2]
    assert dict(out["tags_out"])["mkgmap:label:1"] == "B3"


def test_full_front_door_to_tiles(spark, tmp_path):
    """The complete user path: .osm file -> elements -> rule engine ->
    features -> quadtree tiles + membership."""
    import os
    import random

    from mkgmap_spark.operators import tiling
    from mkgmap_spark.plans.pipeline import elements_to_features
    from mkgmap_spark.rules import parse_rules

    rng = random.Random(3)
    els = []
    for i in range(1, 200):
        els.append({"id": i, "kind": "node",
                    "tags": {"amenity": "pub"} if i % 7 == 0 else {},
                    "lat_deg": rng.uniform(-10, 10), "lon_deg": rng.uniform(-10, 10)})
    for w in range(300, 320):
        refs = rng.sample(range(1, 200), 4)
        els.append({"id": w, "kind": "way", "tags": {"highway": "residential"}, "refs": refs})
    d = str(tmp_path / "osm"); os.makedirs(d)
    write_osm_xml_fixture(f"{d}/a.osm", els)

    elements = read_osm_xml(spark, d)
    rules = parse_rules(
        """
        amenity=pub [0x2d resolution 22]
        highway=residential [0x06 resolution 20]
        """
    )
    feats = elements_to_features(elements, rules=rules)
    n_feats = feats.count()
    assert n_feats == 200 // 7 + 20  # only styled elements survive
    res = {r["kind"]: r["min_res"] for r in feats.select("kind", "min_res").distinct().collect()}
    assert res == {"node": 22, "way": 20}

    prepared = tiling.prepare_features(feats).select(
        "id", "kind_i", "ay", "ax", "size_bytes", "min_res"
    )
    provider = tiling.SparkHistogramProvider(prepared)
    result = tiling.split_level(provider, shift=0)
    members = tiling.assign_tiles(prepared, result.index, resolution=24, level=0)
    assert members.count() == n_feats


def test_read_osm_gz(spark, tmp_path):
    """.osm.gz inputs decompress transparently (the reference reads
    .osm.gz/.bz2, OsmMapDataSource; Spark's text source handles the
    codec by extension)."""
    import gzip

    from mkgmap_spark.sources.osm_xml import read_osm_xml

    with gzip.open(tmp_path / "t.osm.gz", "wt") as f:
        f.write(
            "<osm><node id='1' lat='1.0' lon='2.0'>"
            "<tag k='amenity' v='cafe'/></node></osm>"
        )
    rows = read_osm_xml(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0]["tags"]["amenity"] == "cafe"


def test_raw_tag_squash_all_readers(spark, tmp_path):
    """Element.addTagFromRawOSM (reader/osm/Element.java:54-74): every
    OSM reader Java-trims raw tag values, collapses whitespace RUNS to
    one space (single interior tabs survive — Label.squashSpaces only
    matches \\s\\s+), and strips DEL (0x7f)."""
    from mkgmap_spark.sources.o5m import encode_o5m, read_o5m, squash_raw_tag
    from mkgmap_spark.sources.pbf import encode_pbf, read_pbf

    raw = {"name": "  Main   St\x7freet ", "ref": "a\tb", "note": " \t "}
    want = {"name": "Main Street", "ref": "a\tb", "note": ""}
    assert {k: squash_raw_tag(v) for k, v in raw.items()} == want

    els = [{"id": 1, "kind": "node", "tags": raw, "lat_deg": 1.0, "lon_deg": 2.0}]
    d_xml = tmp_path / "xml"; d_xml.mkdir()
    write_osm_xml_fixture(str(d_xml / "a.osm"), els)
    d_o5m = tmp_path / "o5m"; d_o5m.mkdir()
    (d_o5m / "a.o5m").write_bytes(
        encode_o5m([{"id": 1, "kind": "node", "tags": raw,
                     "lat_1e7": 100, "lon_1e7": 200}]))
    d_pbf = tmp_path / "pbf"; d_pbf.mkdir()
    (d_pbf / "a.osm.pbf").write_bytes(
        encode_pbf([{"id": 1, "kind": "node", "tags": raw,
                     "lat_nano": 100, "lon_nano": 200}]))

    for df in (read_osm_xml(spark, str(d_xml)), read_o5m(spark, str(d_o5m)),
               read_pbf(spark, str(d_pbf))):
        [row] = df.collect()
        assert dict(row["tags"]) == want


def test_add_tag_from_raw_osm_cases():
    """ElementTest.testaddTagFromRawOSM's exact value table."""
    from mkgmap_spark.sources.o5m import squash_raw_tag

    cases = {
        "1": "1", "1 ": "1", " 1": "1", "1  2": "1 2",
        "1  2  3": "1 2 3", "   1  2  3 4  ": "1 2 3 4",
        " ": "", "   ": "",
    }
    for raw, want in cases.items():
        assert squash_raw_tag(raw) == want, (raw, want)
