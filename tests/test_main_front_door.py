"""The Main-equivalent front door (plans/main.py): a real mkgmap-style
command line over .osm fixtures through style resolution, tile build,
and the combiner manifests — the func/ArgsTest flow minus the binary
.img outputs."""

from __future__ import annotations

import os
import random

from mkgmap_spark.plans.main import list_styles, run_from_args
from mkgmap_spark.sources.osm_xml import write_osm_xml_fixture

TESTSTYLES = "/root/reference/test/resources/teststyles"


def _write_osm(path: str, seed: int = 7, n_nodes: int = 150, n_ways: int = 25):
    rng = random.Random(seed)
    els = []
    for i in range(1, n_nodes + 1):
        els.append(
            {"id": i, "kind": "node",
             "tags": {"amenity": "pub"} if i % 5 == 0 else {},
             "lat_deg": rng.uniform(-5, 5), "lon_deg": rng.uniform(-5, 5)}
        )
    for w in range(1000, 1000 + n_ways):
        refs = rng.sample(range(1, n_nodes + 1), 4)
        tags = {"highway": "primary"} if w % 2 else {"highway": "primary", "x": "y"}
        els.append({"id": w, "kind": "way", "tags": tags, "refs": refs})
    write_osm_xml_fixture(path, els)


def test_list_styles():
    """ArgsTest.testListStyles: every teststyle shows up with its
    version + summary."""
    styles = dict((n, (v, s)) for n, v, s in list_styles(TESTSTYLES))
    for expect in ("empty", "main", "simple", "derived"):
        assert expect in styles
    assert styles["simple"] == ("2.2", "A simple test style with just one example of most things")


def test_run_single_file_with_style(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_osm(str(d / "map1.osm"))
    res = run_from_args(
        spark,
        [f"--style-file={TESTSTYLES}", "--style=main", str(d / "map1.osm")],
    )
    [b] = res.builds
    assert b.args.mapname == "63240001"
    n = b.features.count()
    assert n > 0
    # every feature landed in a tile at the finest level
    m = b.tiles.membership.filter("level = 0").count()
    assert m >= n
    assert res.tdb is None


def test_run_two_files_with_combiners(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_osm(str(d / "11110001.osm"), seed=1)
    _write_osm(str(d / "11110002.osm"), seed=2)
    res = run_from_args(
        spark,
        [
            f"--style-file={TESTSTYLES}", "--style=main",
            "--tdbfile", "--gmapsupp",
            str(d / "11110001.osm"), str(d / "11110002.osm"),
        ],
    )
    assert [b.args.mapname for b in res.builds] == ["11110001", "11110002"]
    assert res.tdb is not None and res.tdb.count() > 0
    assert res.gmapsupp is not None and res.gmapsupp.count() > 0


def test_run_respects_option_order(spark, tmp_path):
    """Options take effect at their position: the second file gets the
    overridden levels spec."""
    d = tmp_path / "in"
    d.mkdir()
    _write_osm(str(d / "a.osm"), seed=3)
    _write_osm(str(d / "b.osm"), seed=4)
    res = run_from_args(
        spark,
        [
            f"--style-file={TESTSTYLES}", "--style=main",
            str(d / "a.osm"),
            "--levels=0:24 1:20",
            str(d / "b.osm"),
        ],
    )
    a, b = res.builds
    assert a.args.get("levels") is None
    assert b.args.get("levels") == "0:24 1:20"
    lv_a = sorted(r[0] for r in a.tiles.tiles.select("level").distinct().collect())
    lv_b = sorted(r[0] for r in b.tiles.tiles.select("level").distinct().collect())
    assert lv_b == [0, 1]
    # main teststyle declares 5 levels; coarse ones may be empty when
    # no styled feature reaches their resolution, but more than the
    # override's two must appear
    assert len(lv_a) > 2 and lv_a[:2] == [0, 1]


def test_used_tags_prune_invariant(spark, tmp_path):
    """Pruning unread tags before the style fold changes NOTHING in
    the styled output (RuleSet.getUsedTags semantics), while the tag
    maps shrink."""
    from pyspark.sql import functions as F

    from mkgmap_spark.plans.main import styled_features
    from mkgmap_spark.rules.style import load_style
    from mkgmap_spark.sources.osm_xml import read_osm_xml, write_osm_xml_fixture

    rng = random.Random(11)
    els = []
    for i in range(1, 120):
        tags = {"junk%d" % (i % 9): "x", "note": "irrelevant"}
        if i % 4 == 0:
            tags["highway"] = "primary"
        if i % 8 == 0:
            tags["x"] = "y"
        els.append({"id": i, "kind": "node", "tags": tags,
                    "lat_deg": rng.uniform(-5, 5), "lon_deg": rng.uniform(-5, 5)})
    for w in range(500, 520):
        refs = rng.sample(range(1, 120), 4)
        els.append({"id": w, "kind": "way",
                    "tags": {"highway": "primary", "junk1": "z", "x": "y"},
                    "refs": refs})
    d = tmp_path / "osm"
    d.mkdir()
    write_osm_xml_fixture(str(d / "a.osm"), els)

    style = load_style(f"{TESTSTYLES}/main")
    elements = read_osm_xml(spark, str(d))

    def key(df):
        return sorted(
            (r["id"], r["min_res"]) for r in df.select("id", "min_res").collect()
        )

    pruned = styled_features(elements, style, prune=True)
    full = styled_features(elements, style, prune=False)
    assert key(pruned) == key(full)

    # the junk tags are gone from the pruned plan's input maps
    from mkgmap_spark.operators.decode import prune_unused_tags
    from mkgmap_spark.plans.pipeline import elements_to_features
    from mkgmap_spark.rules import used_tags

    keep = set(style.extra_used_tags)
    for rl in style.rules.values():
        keep |= used_tags(rl)
    narrowed = prune_unused_tags(elements_to_features(elements), keep)
    ks = narrowed.select(F.explode(F.map_keys("tags")).alias("k")).distinct().collect()
    assert not any(r["k"].startswith("junk") for r in ks)


def test_test_map_sources(spark):
    """TestSourceTest: test-map:all-elements and test-map:test-points
    generate their deterministic grids (reader/test/AllElements.java,
    TestPoints.java) and build tiles through the front door."""
    from pyspark.sql import functions as F

    from mkgmap_spark.sources.test_source import all_elements, test_points

    ae = all_elements(spark)
    # per pass: 1 + 127*33 points, 4*16 lines, 8*16 shapes; two passes
    # plus the background shape
    per_map = (1 + 127 * 33) + 4 * 16 + 8 * 16
    assert ae.count() == 2 * per_map + 1
    kinds = {r["kind"]: r["count"] for r in ae.groupBy("kind").count().collect()}
    assert kinds["node"] == 2 * (1 + 127 * 33)
    # point 0x23 appears (as type 0x23 with subtype -1) AND as 0x2300
    codes = {r["type_code"] for r in ae.filter("kind='node'").select("type_code").distinct().collect()}
    assert 0x23 in codes and 0x2300 in codes
    # GType.formatType names: plain pass names subtype>=0 points
    named = ae.filter(F.col("name") == "0x2300").count()
    assert named == 1
    assert ae.filter(F.col("name") == "background").count() == 1

    tp = test_points(spark, npoints=10)
    assert tp.count() == 200
    res = {r["min_res"] for r in tp.filter("kind='node'").select("min_res").distinct().collect()}
    assert res == set(range(17, 25))  # 24 - (x & 7)

    res = run_from_args(spark, ["test-map:all-elements"])
    [b] = res.builds
    assert b.tiles.membership.count() >= 2 * per_map + 1


def test_name_tag_list_and_style_option(spark):
    """--name-tag-list (NameFinder.setNameWithNameTagList) and
    --style-option (StyledConverter.parseStyleOption) tag injection."""
    from mkgmap_spark.plans.main import apply_name_tag_list, style_option_tags

    df = spark.createDataFrame(
        [
            (1, {"name": "local", "name:en": "english", "int_name": "intl"}),
            (2, {"int_name": "intl only"}),
            (3, {"name": "only local"}),
            (4, {}),
        ],
        "id long, tags map<string,string>",
    )
    out = {
        r["id"]: dict(r["tags"])
        for r in apply_name_tag_list(df, ["name:en", "int_name", "name"]).collect()
    }
    assert out[1]["name"] == "english"       # first of the list wins
    assert out[2]["name"] == "intl only"     # fallback down the list
    assert out[3]["name"] == "only local"    # name itself in the list
    assert "name" not in out[4]

    # name-tag-list 'name' alone is the identity (NameFinder returns
    # null compiled list)
    out1 = {r["id"]: dict(r["tags"]) for r in apply_name_tag_list(df, ["name"]).collect()}
    assert out1[1]["name"] == "local"

    assert style_option_tags("car;farms=more;admin5=10") == {
        "mkgmap:option:car": "true",
        "mkgmap:option:farms": "more",
        "mkgmap:option:admin5": "10",
    }


def test_relation_rules_push_to_members(spark, tmp_path):
    """StyledConverter.convertRelation runs BEFORE way conversion:
    relation-rule ``apply`` pushes mutate member tags, and the way
    rules then match on the pushed tags (the route=bicycle pattern
    from the reference's style manual)."""
    from mkgmap_spark.plans.main import styled_features
    from mkgmap_spark.rules.style import load_style
    from mkgmap_spark.sources.osm_xml import read_osm_xml

    sd = tmp_path / "styles" / "rel"
    sd.mkdir(parents=True)
    (sd / "version").write_text("0\n")
    (sd / "relations").write_text(
        "type=route & route=bicycle"
        " { apply { set cycleroute=yes; add rref='${ref}'; } }\n"
    )
    (sd / "lines").write_text(
        "cycleroute=yes [0x11 resolution 18]\n"
        "highway=path [0x16 resolution 24]\n"
    )
    style = load_style(str(sd))

    els = []
    for i in range(1, 9):
        els.append({"id": i, "kind": "node", "tags": {},
                    "lat_deg": float(i) / 10, "lon_deg": float(i) / 7})
    # ways 100/101 are members of the route; 102 is not
    for w, refs in ((100, [1, 2, 3]), (101, [3, 4, 5]), (102, [5, 6, 7])):
        els.append({"id": w, "kind": "way",
                    "tags": {"highway": "path"}, "refs": refs})
    els.append({
        "id": 500, "kind": "relation",
        "tags": {"type": "route", "route": "bicycle", "ref": "R66"},
        "members": [
            {"mtype": "way", "ref": 100, "role": ""},
            {"mtype": "way", "ref": 101, "role": ""},
        ],
    })
    d = tmp_path / "osm"
    d.mkdir()
    write_osm_xml_fixture(str(d / "r.osm"), els)
    elements = read_osm_xml(spark, str(d))

    out = {
        r["id"]: (r["min_res"], dict(r["tags"]))
        for r in styled_features(elements, style).collect()
    }
    # member ways matched the pushed cycleroute tag -> resolution 18
    # beats the highway=path 24; the relation's ref is substituted in
    assert out[100][0] == 18 and out[101][0] == 18
    assert out[100][1].get("rref") == "R66"
    # the non-member way only matches highway=path
    assert out[102][0] == 24
    assert "cycleroute" not in out[102][1]


def test_run_with_dem(spark, tmp_path):
    """--dem/--dem-dists: the front door builds encoded elevation
    sections next to the map tiles (DEMFile.calc flow)."""
    import numpy as np

    from mkgmap_spark.functions.dem_codec import decode_tile
    from mkgmap_spark.sources.hgt import write_hgt

    rng = random.Random(13)
    d = tmp_path / "demmaps"
    d.mkdir()
    els = []
    for i in range(1, 60):
        els.append({"id": i, "kind": "node",
                    "tags": {"amenity": "pub"} if i % 3 == 0 else {},
                    "lat_deg": rng.uniform(9.4, 9.6),
                    "lon_deg": rng.uniform(19.3, 19.6)})
    for w in range(1000, 1012):
        els.append({"id": w, "kind": "way", "tags": {"highway": "primary"},
                    "refs": rng.sample(range(1, 60), 4)})
    write_osm_xml_fixture(str(d / "dem1.osm"), els)

    hgt_dir = tmp_path / "hgt"
    hgt_dir.mkdir()
    res = 64
    # north-first rows on disk, as real .hgt files are
    grid = np.zeros((res + 1, res + 1), dtype=np.int16)
    for y in range(res + 1):
        for x in range(res + 1):
            grid[y, x] = 100 + ((x * 13 + y * 7) % 37)
    write_hgt(str(hgt_dir / "N09E019.hgt"), grid)

    res_run = run_from_args(
        spark,
        [f"--style-file={TESTSTYLES}", "--style=main",
         f"--dem={hgt_dir}", "--dem-dists=26496,52992",
         str(d / "dem1.osm")],
    )
    b = res_run.builds[0]
    assert b.dem_tiles is not None and b.dem_sections is not None
    secs = {r.zoom: r for r in b.dem_sections.collect()}
    assert set(secs) == {0, 1}
    tiles = b.dem_tiles.collect()
    assert len(tiles) >= 2
    # every tile with data decodes to in-range heights around 100..137
    saw_data = False
    for t in tiles:
        if not t.has_data:
            continue
        saw_data = True
        decoded = decode_tile(bytes(t.stream), t.base, t.max_delta,
                              t.enc_type, t.tile_width, t.tile_height)
        vals = [v for v in decoded if v != -32768]
        assert vals and min(vals) >= 99 and max(vals) <= 138, (t.zoom,)
    assert saw_data
