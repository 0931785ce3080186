"""Style DIRECTORY loading + overlay expansion vs the reference's own
teststyles (test/resources/teststyles) and its shipped default style."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.rules.compiler import compile_rules
from mkgmap_spark.rules.style import (
    apply_line_overlays,
    load_style,
    parse_level_spec,
    parse_options,
    parse_overlays,
)

TESTSTYLES = "/root/reference/test/resources/teststyles"
DEFAULT = "/root/reference/resources/styles/default"


def test_parse_level_spec():
    assert parse_level_spec("0:24, 1:22, 2:20") == [(0, 24), (1, 22), (2, 20)]
    assert parse_level_spec("0=24 1=20") == [(0, 24), (1, 20)]


def test_parse_options_forms():
    opts = parse_options("levels = 0:24, 1:20\n# c\nfoo {\n a\n b\n}\nk: v\n")
    assert opts["levels"] == "0:24, 1:20"
    assert opts["foo"] == "a b"
    assert opts["k"] == "v"


def test_parse_overlays():
    ov = parse_overlays("# c\n0x142: 0x1, 0x2, 0x3\n7: 9\n")
    assert ov == {0x142: [1, 2, 3], 7: [9]}


def test_load_simple_teststyle():
    s = load_style(f"{TESTSTYLES}/simple")
    assert s.levels == [(0, 24), (1, 20)]  # braces form in options
    assert s.overlays == {0x142: [1, 2, 3]}
    assert "lines" in s.rules


def test_load_main_teststyle():
    s = load_style(f"{TESTSTYLES}/main")
    assert s.levels == [(0, 24), (1, 22), (2, 20), (3, 18), (4, 16)]
    assert set(s.rules) == {"relations", "points", "lines", "polygons"}
    assert s.info.get("version") == "1.0"
    assert s.info.get("summary") == "The default test style"


def test_load_default_style():
    """The reference's complete shipped style loads through the one
    public entry point: all four rule files, merged overview levels."""
    s = load_style(DEFAULT)
    assert s.levels == [(0, 24), (1, 22), (2, 20), (3, 18)]
    assert s.overview_levels and s.overview_levels[0] == (4, 17)
    assert len(s.rules["lines"]) > 200
    assert len(s.rules["points"]) > 300
    assert len(s.rules["polygons"]) > 150
    assert len(s.rules["relations"]) > 5


def test_overlay_expansion(spark):
    """OverlayReader.addLine: the overlaid type becomes one line per
    replacement; only the first keeps road attributes."""
    s = load_style(f"{TESTSTYLES}/simple")
    df = spark.createDataFrame(
        [(1, {"highway": "overlaid"}), (2, {"highway": "plain"})],
        "id long, tags map<string,string>",
    )
    from mkgmap_spark.rules.parser import parse_rules

    rules = parse_rules(
        "highway=overlaid [0x142 road_class=2 road_speed=3 resolution 24]\n"
        "highway=plain [0x5 road_class=1 road_speed=1 resolution 24]\n"
    )
    out = apply_line_overlays(compile_rules(rules, df), s.overlays)
    rows = {r["id"]: r["results"] for r in out.collect()}
    got = [(x["type_code"], x["road_class"], x["road_speed"]) for x in rows[1]]
    assert got == [(1, 2, 3), (2, None, None), (3, None, None)]
    assert [(x["type_code"], x["road_class"]) for x in rows[2]] == [(5, 1)]


def test_compile_teststyles_end_to_end(spark):
    """Both reference teststyles compile and emit through the loaded
    bundle: main's 0x02 primary rule (with the action-only highway=*
    naming rule before it), simple's first-match x=y discrimination."""
    s = load_style(f"{TESTSTYLES}/main")
    df = spark.createDataFrame(
        [(1, {"highway": "primary", "ref": "A1"}), (2, {"highway": "cycleway"})],
        "id long, tags map<string,string>",
    )
    out = {r["id"]: r for r in compile_rules(s.rules["lines"], df).collect()}
    assert out[1]["results"][0]["type_code"] == 0x02
    assert out[1]["results"][0]["road_class"] == 3
    assert out[2]["results"][0]["type_code"] == 0x16

    simple = load_style(f"{TESTSTYLES}/simple")
    df2 = spark.createDataFrame(
        [(1, {"highway": "primary", "x": "y"}), (2, {"highway": "primary"})],
        "id long, tags map<string,string>",
    )
    out2 = {r["id"]: r["results"] for r in compile_rules(simple.rules["lines"], df2).collect()}
    assert out2[1][0]["type_code"] == 0x2  # highway=primary & x=y wins first
    assert out2[2][0]["type_code"] == 0x3


def test_parse_overlays_integer_decode():
    from mkgmap_spark.rules.style import _decode_int, parse_overlays

    # Java Integer.decode: leading zero = octal, 0x = hex
    assert _decode_int("010") == 8
    assert _decode_int("#1f") == 31
    assert _decode_int("0x142") == 0x142
    assert _decode_int("-07") == -7
    ov = parse_overlays("010: 0x1, 07\n")
    assert ov == {8: [1, 7]}


def test_load_style_rejects_non_style_dir(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="version"):
        load_style(str(tmp_path))


def test_styleimpl_simple_info():
    """StyleImplTest.testGetInfo/testGetOption on teststyles/simple."""
    s = load_style(f"{TESTSTYLES}/simple")
    assert s.info.get("version") == "2.2"
    assert s.info.get("summary") == "A simple test style with just one example of most things"
    assert s.info.get("description", "").strip() == "This style is used for testing."
    # option levels: the braces form preserves both lines
    assert s.levels == [(0, 24), (1, 20)]


def test_styleimpl_empty_style():
    """StyleImplTest.testEmptyFiles: an empty style loads fine."""
    s = load_style(f"{TESTSTYLES}/empty")
    assert s is not None


def test_styleimpl_bad_style_name():
    """StyleImplTest.testBadStyleName/testBadStyleFileOnFilesystem."""
    import pytest

    with pytest.raises(Exception):
        load_style(f"{TESTSTYLES}/no-such-style")
    with pytest.raises(Exception):
        load_style("/no-such-place/hopefully")


def test_value_with_unit_cases():
    """Port of ValueWithUnitTest (osmstyle/eval): numeric extraction
    validity and ordering, incl. the two-decimal-points regression
    ('de.08315102.reistenhofweg' used to throw)."""
    from mkgmap_spark.rules.interpreter import extract_number

    assert extract_number("23") == 23.0
    assert extract_number("abc") is None
    assert extract_number("23") < extract_number("24")
    assert extract_number("23.3") == 23.3
    assert extract_number("23.5") > extract_number("23")
    assert extract_number("23.45") < extract_number("23.46")
    assert extract_number("23") == extract_number("23.0")
    assert extract_number("de.08315102.reistenhofweg") is None  # no crash
