"""Port of the reference's RuleFileReaderTest
(test/uk/me/parabola/mkgmap/osmstyle/RuleFileReaderTest.java) against
the interpreter rule engine.

The reference harness (TestUtils.makeRuleSet) parses a `lines` file
with levels "0:24 1:20 2:18 3:16 4:14" and resolves one element at a
time; `getFirstType` returns the first emitted GType.  Level specs are
converted to resolutions at parse time (TypeReader.setLevel), so the
level assertions here check the equivalent resolutions.
"""

from __future__ import annotations

import pytest

from mkgmap_spark.mapunits import to_map_unit
from mkgmap_spark.rules import parse_rules, used_tags
from mkgmap_spark.rules.interpreter import interpret

# TestUtils.makeRuleSet: LevelInfo.createFromString("0:24 1:20 2:18 3:16 4:14")
LEVELS = [(0, 24), (1, 20), (2, 18), (3, 16), (4, 14)]


def resolve(src, tags, geom=None, el=None, resolver=None):
    rules = parse_rules(src, resolver=resolver, levels=LEVELS)
    types, out = interpret(
        rules, dict(tags), geom=geom, el=el if el is not None else {"id": 1, "kind": "way"}
    )
    return types, out


def first_type(src, tags, geom=None, el=None, resolver=None):
    types, _ = resolve(src, tags, geom=geom, el=el, resolver=resolver)
    return types[0] if types else None


def test_load():
    src = (
        "highway=footway & type=rough [0x2 level 2]\n"
        "highway=footway | highway = path\n"
        "  [0x3]\n# comment here\n"
        "foo=\nbar & bar=two [0x4]\n"
        "highway=* & oneway=true [0x6 level 1]\n"
    )
    t = first_type(src, {"highway": "footway"})
    assert t is not None and t.type_code == 0x3 and (t.min_res, t.max_res) == (24, 24)
    t = first_type(src, {"highway": "footway", "type": "rough"})
    assert t is not None and t.type_code == 0x2
    # level 2 -> resolution 18 (single level: that res up to 24)
    assert (t.min_res, t.max_res) == (18, 24)


def test_level_range():
    t = first_type("highway=primary [0x1 level 1-3]", {"highway": "primary"})
    assert t is not None
    # levels 1..3 -> resolutions 16..20
    assert (t.min_res, t.max_res) == (16, 20)


def test_complex_expressions():
    src = "a=b & (c=d | e=f) & x>10 [0x1]\n"
    base = {"a": "b", "c": "d"}
    assert first_type(src, {**base, "x": "11"}).type_code == 1
    assert first_type(src, {**base, "x": "9"}) is None
    assert first_type(src, {**base, "x": "10"}) is None
    assert first_type(src, {**base, "x": "100", "e": "f"}).type_code == 1
    assert first_type(src, {"a": "b", "c": "", "e": "", "x": "100"}) is None
    assert first_type(src, {"a": "b", "c": "", "e": "f", "x": "100"}).type_code == 1


def test_comparasons():
    src = (
        "highway=null_null & layer<0  [0x01 resolution 10]\n"
        "highway=null_null & layer=0  [0x02 resolution 10]\n"
        "highway=null_null & layer>0  [0x03 resolution 10]\n"
        "highway=null_null & layer='-1'  [0x04 resolution 10]\n"
        "highway=null_null & layer='0'  [0x05 resolution 10]\n"
        "highway=null_null & layer='1'  [0x06 resolution 10]\n"
        "highway=null_null & layer='+1'  [0x07 resolution 10]\n"
        "highway=null_null   [0x08 resolution 10]"
    )
    hw = {"highway": "null_null"}
    assert first_type(src, {**hw, "layer": "-1"}).type_code == 0x1
    assert first_type(src, {**hw, "layer": "0"}).type_code == 0x2
    assert first_type(src, hw).type_code == 0x8
    assert first_type(src, {**hw, "layer": "1"}).type_code == 0x3
    assert first_type(src, {**hw, "layer": "+1"}).type_code == 0x3


def test_multiple_actions():
    src = "highway=footway {add access = no; add foot = yes} [0x16 road_class=0 road_speed=0 resolution 23]"
    _, tags = resolve(src, {"highway": "footway"})
    assert tags.get("access") == "no"
    assert tags.get("foot") == "yes"


def test_wildcard_top():
    types, tags = resolve("highway=* {set a=fred} [0x1]\n", {"highway": "secondary"})
    assert types and types[0].type_code == 1
    assert tags.get("a") == "fred"


def test_left_side_or():
    src = "(a = b | a = c | a=d) & e!=* [0x2]" "a=c & e!=* [0x1]"
    assert first_type(src, {"a": "c"}).type_code == 2
    assert first_type(src, {"a": "d"}).type_code == 2
    assert first_type(src, {"a": "b"}).type_code == 2


def test_wildcard2():
    src = "highway=* & z=* {set a=square} [0x1]\n"
    assert first_type(src, {"highway": "secondary"}) is None
    types, tags = resolve(src, {"highway": "secondary", "z": "1"})
    assert types and types[0].type_code == 1
    assert tags.get("a") == "square"


def test_gtype_attrs():
    t = first_type(
        "highway=motorway [0x1 road_class=4 road_speed=7 default_name='motor way']\n",
        {"highway": "motorway"},
    )
    assert t is not None
    assert t.road_class == 4
    assert t.road_speed == 7
    assert t.default_name == "motor way"


def test_regexp():
    src = "highway=* & name ~ 'blue.*' [0x2]\n"
    assert first_type(src, {"highway": "secondary", "name": "blue sq"}).type_code == 2
    assert first_type(src, {"highway": "secondary", "name": "yellow"}) is None


def test_regex2():
    src = (
        "a=b & (smoothness ~ '.*(bad|horrible|impassable)' | sac_scale ~ '.*(mountain|alpine)_hiking') [0x1]"
        "a = '>=' & b = '>' [0x2]"
    )
    assert first_type(src, {"a": "b", "smoothness": "zzzbad"}).type_code == 1
    assert first_type(src, {"a": "b", "sac_scale": "zzz alpine_hiking"}) is not None
    assert first_type(src, {"a": "b", "sac_scale": "zzz alp_hiking"}) is None
    assert first_type(src, {"a": ">=", "b": ">"}).type_code == 2


def test_regex_at_top():
    t = first_type("QUOTA ~ ' [05]00\\.0+' [0x2]", {"QUOTA": " 500.0"})
    assert t is not None and t.type_code == 2


def test_ne_at_top_with_re():
    t = first_type("a != 'fred' &  a ~ '.*' [0x2]", {"a": "tom"})
    assert t is not None and t.type_code == 2


def test_number_op_at_top():
    t = first_type("QUOTA > 10 [0x1] QUOTA < 6 [0x2]", {"QUOTA": "2"})
    assert t is not None and t.type_code == 2


def test_optimize_with_or():
    src = (
        "highway ~ '(secondary|tertiary|unclassified|residential|minor|living_street|service)' "
        "& oneway=* "
        "& (cycleway=opposite | cycleway=opposite_lane | cycleway=opposite_track )"
        "[0x2 ]"
    )
    base = {"highway": "tertiary", "oneway": "1"}
    assert first_type(src, {**base, "cycleway": "opposite_track"}).type_code == 2
    assert first_type(src, {**base, "cycleway": "fred"}) is None
    assert first_type(src, {**base, "cycleway": "opposite"}) is not None
    assert first_type(src, {**base, "cycleway": "opposite_lane"}) is not None
    assert first_type(src, {"highway": "fred", "oneway": "1", "cycleway": "opposite_lane"}) is None


def test_optimize_with_or2():
    src = "highway=*" "& tunnel!=*" "& (layer!=* | layer=0)" " [0x02]\n"
    assert first_type(src, {"highway": "primary"}).type_code == 2
    assert first_type(src, {"highway": "primary", "layer": "0"}).type_code == 2
    assert first_type(src, {"highway": "primary", "layer": "1"}) is None


def test_optimize_with_or3():
    src = (
        "highway=* &  bridge!=* & "
        "   (mtb:scale>0 | mtb:scale='0+' | tracktype ~ 'grade[2-6]' |"
        "   sac_scale ~ '.*(mountain|alpine)_hiking' |"
        "   sport=via_ferrata) [0x3]"
    )
    assert first_type(src, {"highway": "primary", "mtb:scale": "0+"}) is not None


def test_self_reference_no_hang():
    resolve("iii=* { set iii=no }", {"foot": "yes", "iii": "xyz"})


def test_not():
    src = "tunnel=yes & !(route=mtb | route=bicycle) [0x1]"
    assert first_type(src, {"tunnel": "yes", "route": "abc"}) is not None
    assert first_type(src, {"tunnel": "yes", "route": "mtb"}) is None


def test_gtr():
    src = "z=0 & a >= 10 [0x1]"
    assert first_type(src, {"z": "0", "a": "9"}) is None
    assert first_type(src, {"z": "0", "a": "10"}).type_code == 1
    assert first_type(src, {"z": "0", "a": "11"}).type_code == 1


def test_lte():
    src = "z=0 & a <= 10 [0x1]"
    assert first_type(src, {"z": "0", "a": "9"}).type_code == 1
    assert first_type(src, {"z": "0", "a": "10"}).type_code == 1
    assert first_type(src, {"z": "0", "a": "11"}) is None


def test_ne():
    src = "z=0 & a != 10 [0x1]"
    assert first_type(src, {"z": "0", "a": "9"}) is not None
    assert first_type(src, {"z": "0", "a": "10"}) is None


def test_decimal_values():
    src = "z=yes & a < 3.5 [0x1]"
    assert first_type(src, {"z": "yes", "a": "2"}) is not None
    assert first_type(src, {"z": "yes", "a": "4"}) is None


def test_decimal_and_decimal_compare():
    src = "z=yes & a < 3.5 [0x1]"
    assert first_type(src, {"z": "yes", "a": "3.49"}) is not None
    assert first_type(src, {"z": "yes", "a": "3.55"}) is None


def test_mtb_rules():
    src = (
        "(mtb:scale=*  | mtb:scale:uphill=*) & route=mtb"
        "{ name 'mtbrt${mtb:scale|def:.}${mtb:scale:uphill|def:.} ${name}' "
        "       | 'mtbrt${mtb:scale|def:.}${mtb:scale:uphill|def:.}' }"
        " (mtb:scale=* | mtb:scale:uphill=*) & route!=mtb "
        "{ name 'mtb${mtb:scale|def:.}${mtb:scale:uphill|def:.} ${name}' "
        "       | 'mtb${mtb:scale|def:.}${mtb:scale:uphill|def:.}' }"
    )
    _, tags = resolve(src, {"route": "mtb", "mtb:scale": "2"})
    assert tags.get("mkgmap:label:1") == "mtbrt2."
    _, tags = resolve(src, {"route": "mtb", "mtb:scale:uphill": "3"})
    assert tags.get("mkgmap:label:1") == "mtbrt.3"
    _, tags = resolve(src, {"name": "myname", "route": "mtb", "mtb:scale:uphill": "3"})
    assert tags.get("mkgmap:label:1") == "mtbrt.3 myname"
    _, tags = resolve(src, {"mtb:scale:uphill": "3"})
    assert tags.get("mkgmap:label:1") == "mtb.3"


def test_tag_append():
    src = (
        "highway=*{set fullname='${ref}';"
        "set fullname='${fullname} ${name}';"
        "set fullname='${fullname} ${name1}';"
        "set fullname='${fullname} ${name2}';"
        "name '${fullname}'}"
    )
    _, tags = resolve(
        src,
        {"highway": "road", "ref": "A1", "name": "long lane", "name1": "foo", "name2": "bar"},
    )
    assert tags.get("mkgmap:label:1") == "A1 long lane foo bar"


def test_exists():
    src = (
        "highway=* & maxspeed=40 {set mcssl=40}"
        "highway=primary & mcssl=40 [0x2 ]"
        "highway=* & mcssl=40 [0x3]"
    )
    t = first_type(
        src, {"ref": "A123", "name": "Long Lane", "highway": "primary", "maxspeed": "40"}
    )
    assert t is not None and t.type_code == 2


def test_continue():
    src = (
        "highway=primary [0x1 continue]"
        "highway=primary [0x2 continue]"
        "highway=primary [0x3]"
        "highway=primary [0x4]"
    )
    types, _ = resolve(src, {"highway": "primary"})
    assert [t.type_code for t in types] == [1, 2, 3]


def test_continue_repeat():
    src = (
        "highway=primary [0x1 continue]"
        "highway=primary [0x2 continue]"
        "highway=primary [0x3]"
        "highway=primary [0x4]"
    )
    for _ in range(3):
        t = first_type(src, {"highway": "primary"})
        assert t is not None and t.type_code == 1


def test_complex_regex():
    src = (
        "a~b & c=d  [0x1]"
        "a~b & c~d & e=f   [0x2]"
        "(a~b | c~d) & e=f  [0x3]"
        "(a~b | c~d) & e=f & g=h  [0x4]"
        "((a~b | c~d) & e=f) & g=h [0x5]"
        "e=f & g=h & (a~b | c~'d.*')  [0x6]"
        "(e=f & g=h) & (a~b | c~'d.*')  [0x7]"
        "a=* & b=* & c=d [0x8]"
        "a=* & (b=* | c=d) [0x9]"
    )
    assert first_type(src, {"c": "df", "g": "h", "e": "f"}) is not None


def test_tags_used():
    rules = parse_rules(
        "highway=primary & surface=good [0x1]" "A=B | C=D & E~'f.*' & G!=9 & K=* & L!=* [0x2]",
        levels=LEVELS,
    )
    tags = used_tags(rules)
    assert tags == {"highway", "surface", "A", "C", "E", "G", "K", "L"}


def test_tags_used_in_actions():
    rules = parse_rules(
        "A=B { set t='${C}'; add t='${D} p ${E}'; name '${F} ${G}'; rename K L }",
        levels=LEVELS,
    )
    tags = used_tags(rules)
    for t in "ACDEFGK":
        assert t in tags


def test_include_as_tag_name():
    assert first_type("include=yes [0x2]", {"include": "yes"}).type_code == 2
    assert first_type("include = yes [0x2]", {"include": "yes"}).type_code == 2


def test_include_file():
    files = {"incfile": "highway=secondary [0x3]"}
    t = first_type(
        "include incfile;", {"highway": "secondary"}, resolver=lambda p: files[p]
    )
    assert t is not None and t.type_code == 3


def test_include_file_quoted():
    files = {"inc file": "highway=secondary [0x3]"}
    t = first_type(
        "include \n 'inc file' \n;", {"highway": "secondary"}, resolver=lambda p: files[p]
    )
    assert t is not None and t.type_code == 3


def test_nested_includes():
    files = {
        "first": "b=1 [0x1] include 'second'; b=2 [0x2 ]",
        "second": "c=1 [0x1] c=2 [0x2 ]",
    }
    src = "a=1 [0x1] include 'first'; a=2 [0x2]"
    r = lambda p: files[p]
    assert first_type(src, {"a": "2"}, resolver=r).type_code == 2
    assert first_type(src, {"c": "1"}, resolver=r).type_code == 1
    assert first_type(src, {"c": "2"}, resolver=r).type_code == 2


def test_nested_include_and_immediate_include():
    files = {
        "first": "include 'second'; b=2 [0x2 ]",
        "second": "c=1 [0x1] c=2 [0x2 ]",
    }
    src = "a=1 [0x1] include 'first'; a=2 [0x2]"
    r = lambda p: files[p]
    assert first_type(src, {"a": "2"}, resolver=r).type_code == 2
    assert first_type(src, {"c": "1"}, resolver=r).type_code == 1
    assert first_type(src, {"c": "2"}, resolver=r).type_code == 2


def test_include_from():
    """``include 'lines' from default;`` — pulls the reference default
    style's lines file (RuleFileReader:176-189)."""

    def resolver(path, from_style=None):
        base = "/root/reference/resources/styles"
        style = from_style or "default"
        with open(f"{base}/{style}/{path}") as fh:
            return fh.read()

    t = first_type(
        "include 'lines' from default;\n", {"highway": "motorway"}, resolver=resolver
    )
    assert t is not None and t.type_code == 1


# ----------------------------------------------------- style functions

def _way_with_length():
    """getWayWithLength: ~91m segment, coordinates in degrees."""
    pts = [
        (51.6124376, -0.1777185),
        (51.6127816, -0.1775029),
        (51.6132048, -0.1772467),
    ]
    return {
        "lats": [to_map_unit(a) for a, _ in pts],
        "lons": [to_map_unit(b) for _, b in pts],
    }


def test_length_function():
    t = first_type("A=B & length() < 92 [0x5]", {"A": "B"}, geom=_way_with_length())
    assert t is not None and t.type_code == 5


def test_length_function2():
    t = first_type("A=B & length() > 91 [0x5]", {"A": "B"}, geom=_way_with_length())
    assert t is not None and t.type_code == 5


def test_function_with_spaces():
    t = first_type(
        "A=B & length ( \n) > 91 & length\n()\n < 92 [0x5]", {"A": "B"}, geom=_way_with_length()
    )
    assert t is not None


def _closed_complete_way(closed: bool, complete: bool):
    lats = [1000, 1000, 2000, 2000]
    lons = [1000, 2000, 2000, 1000]
    if closed:
        lats.append(lats[0])
        lons.append(lons[0])
    return {"lats": lats, "lons": lons, "complete": complete}


def test_is_closed_function():
    t = first_type(
        "A=B & is_closed() = true [0x5]", {"A": "B"}, geom=_closed_complete_way(True, True)
    )
    assert t is not None and t.type_code == 5
    t = first_type(
        "A=B & is_closed() = false [0x5]", {"A": "B"}, geom=_closed_complete_way(False, True)
    )
    assert t is not None and t.type_code == 5


def test_is_complete_function():
    t = first_type(
        "A=B & is_complete() = true [0x5]", {"A": "B"}, geom=_closed_complete_way(False, True)
    )
    assert t is not None and t.type_code == 5
    t = first_type(
        "A=B & is_complete() = false [0x5]", {"A": "B"}, geom=_closed_complete_way(False, False)
    )
    assert t is not None and t.type_code == 5


# ------------------------------------------------- $tag value references

def test_get_tag_value_equality():
    src = "a=b & a=$c [0x5] a=b [0x6]"
    assert first_type(src, {"a": "b", "c": "b"}).type_code == 5
    assert first_type(src, {"a": "b", "c": "x"}).type_code == 6


def test_get_tag_value_not_found():
    src = "a=b & b<$c [0x5] a=b [0x6]"
    assert first_type(src, {"a": "b", "b": "50"}).type_code == 6


def test_get_tag_value_alone():
    src = "a<$b [0x5] a=b [0x6]"
    assert first_type(src, {"a": "1", "b": "2"}).type_code == 5


def test_value_tag_value():
    t = first_type("a=$b [0x5]", {"a": "2", "b": "2"})
    assert t is not None and t.type_code == 5


def test_x3not_error():
    src = "(a=1 | b=2) & !(c=1) & d!=3 [0x8]"
    assert first_type(src, {"b": "1"}) is None
    assert first_type(src, {"b": "2"}) is not None
    assert first_type(src, {"b": "2", "d": "3"}) is None
    assert first_type(src, {"b": "2", "d": "2"}) is not None


def test_bug_or_with_and_on_left():
    assert first_type("((a=1&b=2) | a=2) & c!=4 [0x2]", {"a": "2"}) is not None


def test_bug_or_with_and_on_left2():
    t = first_type("(((a=1 | a=5)&b=2) | a=2) & c!=4 [0x2]", {"a": "2"})
    assert t is not None and t.type_code == 2


def test_bug_or_maxspeed():
    src = (
        "maxspeed=*\n"
        "  & ( maxspeedkmh()>120 | maxspeed = none )\n"
        "  & ( highway = motorway | highway = trunk )\n"
        "[0x4]\n"
    )
    assert first_type(src, {"highway": "trunk", "maxspeed": "122"}) is not None


# ----------------------------------------------------- syntax rejections

def test_function_with_parameters_rejected():
    with pytest.raises(Exception):
        parse_rules("A=B & length(a) > 91 [0x5]", levels=LEVELS)


def test_function_does_not_exist():
    with pytest.raises(Exception):
        parse_rules("A=B & non_existing_function() > 10 [0x5]", levels=LEVELS)


def test_with_non_value():
    with pytest.raises(Exception):
        parse_rules("c=b & a=!* [0x5]", levels=LEVELS)


def test_less_than_with_non_value():
    with pytest.raises(Exception):
        parse_rules("c=b & a<!* [0x5]", levels=LEVELS)


def test_length_in_points_rejected():
    """RuleFileReaderTest.testLengthInPoints: geometry functions are
    illegal in a POINT rule file (StyleFunction.supportsNode)."""
    with pytest.raises(Exception):
        parse_rules("A=B & length() < 100 [0x5]", levels=LEVELS, kind="point")
    # fine in a line file
    parse_rules("A=B & length() < 100 [0x5]", levels=LEVELS, kind="line")
    # osmid()/type() are legal on points
    parse_rules("A=B & osmid() = 5 [0x5]", levels=LEVELS, kind="point")


def test_indexability_relaxation_documented():
    """The reference REJECTS rules whose top-level expression cannot be
    indexed (testNEAtTop: ``QUOTA != 'fred' [0x2]`` alone raises
    SyntaxException because its rule index needs one positive term).
    This engine evaluates rules as Spark Column programs with no index
    prerequisite, so such rules are accepted and evaluated with the
    obvious semantics — a deliberate superset of accepted inputs."""
    t = first_type("QUOTA != 'fred' [0x2]", {"QUOTA": "tom"})
    assert t is not None and t.type_code == 2
