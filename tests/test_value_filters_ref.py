"""Ports of the reference's remaining value-filter JUnit suites
(test/uk/me/parabola/mkgmap/osmstyle/actions/): ConvertFilterTest,
CountryISOFilterTest, HighwaySymbolFilterTest, SubstringFilterTest,
NotContainedFilterTest — run against BOTH engines (interpreter
apply_filter and the compiled SQL twin) where the case is
engine-expressible."""

from __future__ import annotations

import pytest

from mkgmap_spark.rules.interpreter import apply_filter

CONVERT_CASES = [
    # (conv-spec, input, expected) — ConvertFilterTest.simpleTests
    ("kmh=>mph", "100", "62"),
    ("km/h=>mph", "100", "62"),
    ("mph=>km/h", "60", "97"),
    ("m=>ft", "10", "33"),
    ("km=>ft", "10", "32808"),
    ("ft=>m", "100", "30"),
    ("mi=>km", "100", "161"),
    ("knots=>mph", "20", "23"),
    # unit on the input value
    ("m=>ft", "100m", "328"),   # same as default
    ("m=>ft", "100ft", "100"),  # same as target: passthrough sans unit
    ("km=>ft", "10m", "33"),    # different unit overrides the default
    ("m=>ft", " 10 ", "33"),    # spaces around a bare number
    ("km/h=>mph", " 10 km/h ", "6"),
    # fall-through cases
    ("kk=>ft", "10m", "10m"),   # unknown source unit: unchanged
    ("km=>m", "x10m", "x10m"),  # not a number: unchanged
    ("m=>ft", "10abc", "10abc"),  # unknown unit on value: unchanged
    ("m=>mph", "10m", "10m"),   # incompatible unit types: unchanged
]


@pytest.mark.parametrize("spec,value,want", CONVERT_CASES)
def test_convert_filter(spec, value, want):
    assert apply_filter("conv", spec, value, {}) == want


def test_convert_unrecognisable_spec():
    """ConvertFilterTest.testUnrecognisable: no '=>' in the spec is a
    SyntaxException at construction."""
    with pytest.raises(Exception):
        apply_filter("conv", "fjdkfjdk", "10", {})


COUNTRY_CASES = [
    ("Germany", "DEU"),
    ("Deutschland", "DEU"),
    ("United Kingdom", "GBR"),
    ("UNITED KINGDOM", "GBR"),
    ("united kingdom", "GBR"),
    ("UK", "GBR"),
    ("xyz", "xyz"),
    ("Ελλάδα", "GRC"),
    ("  germany ", "DEU"),
]


@pytest.mark.parametrize("value,want", COUNTRY_CASES)
def test_country_iso_filter(value, want):
    assert apply_filter("country-ISO", "", value, {}) == want


HIGHWAY_CASES = [
    ("A101", "A101"),
    ("A 101", "A101"),
    ("A 1 01", "A101"),  # all spaces removed
    ("AN1", "AN1"),      # mostly-alpha treated the same
]


@pytest.mark.parametrize("value,want", HIGHWAY_CASES)
def test_highway_symbol_filter(value, want):
    assert apply_filter("highway-symbol", "shield", value, {}) == want


def test_substring_one_arg():
    assert apply_filter("substring", "2", "abcd", {}) == "cd"


def test_substring_two_args():
    assert apply_filter("substring", "2:4", "abcdefg", {}) == "cd"


def test_substring_range_larger_than_input():
    assert apply_filter("substring", "2:30", "abcdef", {}) == "cdef"


def test_substring_start_larger_than_input():
    assert apply_filter("substring", "10", "abcdef", {}) is None


@pytest.mark.parametrize("arg", ["6:4", "", "1:2:3"])
def test_substring_bad_args(arg):
    with pytest.raises(Exception):
        apply_filter("substring", arg, "abc", {})


STD_TAGS = {"ref": "x;y;z"}


def test_not_contained_2nd_arg_not_contained():
    assert apply_filter("not-contained", ";:ref", "aa", STD_TAGS) == "aa"


def test_not_contained_2nd_arg_contained():
    # empty separator defaults to ';'
    assert apply_filter("not-contained", ":ref", "x", STD_TAGS) is None


def test_not_contained_non_default_delimiter_not_contained():
    assert apply_filter("not-contained", "#:ref", "x", STD_TAGS) == "x"


def test_not_contained_non_default_delimiter_contained():
    tags = {**STD_TAGS, "test": "Aa#Bb#Cc#Dd"}
    assert apply_filter("not-contained", "#:test", "Cc", tags) is None


def test_not_contained_missing_tag():
    assert apply_filter("not-contained", ":sometag", "x", STD_TAGS) == "x"


@pytest.mark.parametrize("arg", ["", ";", ":"])
def test_not_contained_bad_args(arg):
    with pytest.raises(Exception):
        apply_filter("not-contained", arg, "x", STD_TAGS)


def test_filters_compiled_parity(spark):
    """The same cases through the COMPILED engine: one rule per filter
    over a tag column, compared against apply_filter."""
    from mkgmap_spark.rules import compile_rules, parse_rules

    cases = [
        ("conv:m=>ft", "10m", {}),
        ("conv:km/h=>mph", " 10 km/h ", {}),
        ("country-ISO", "Ελλάδα", {}),
        ("country-ISO", "  germany ", {}),
        ("country-ISO", "xyz", {}),
        ("highway-symbol:shield", "A 1 01", {}),
        ("substring:2:4", "abcdefg", {}),
        ("not-contained:;:ref", "aa", {"ref": "x;y;z"}),
        ("not-contained:;:ref", "x", {"ref": "x;y;z"}),
    ]
    rows = []
    rules_srcs = []
    for i, (filt, value, tags) in enumerate(cases):
        rules_srcs.append(
            f"idx={i} {{ set out='${{val|{filt}}}' }} idx={i} [0x1]"
        )
        rows.append({"id": i, "tags": {"idx": str(i), "val": value, **tags}})

    src = "\n".join(rules_srcs)
    df = spark.createDataFrame(rows, "id long, tags map<string,string>")
    out = compile_rules(parse_rules(src), df).select("id", "tags_out").collect()
    got = {r["id"]: r["tags_out"].get("out") for r in out}

    for i, (filt, value, tags) in enumerate(cases):
        cmd, _, arg = filt.partition(":")
        want = apply_filter(cmd, arg, value, dict(tags))
        assert got.get(i) == want, (i, filt, value, got.get(i), want)
