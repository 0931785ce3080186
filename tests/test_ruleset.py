"""Port of the reference's RuleSetTest
(test/uk/me/parabola/mkgmap/osmstyle/RuleSetTest.java): declaration-
order matching, action-variable chains, continue propagate /
no_propagate / with_actions, and tag-value substitution.  The BitSet
candidate-index assertion of testIndexWithOddOrder is skipped — it
checks the reference's internal rule index, which this engine does not
need — but its resolution result is kept."""

from __future__ import annotations

from mkgmap_spark.rules import parse_rules
from mkgmap_spark.rules.interpreter import interpret

LEVELS = [(0, 24), (1, 20), (2, 18), (3, 16), (4, 14)]

MAXSPEED_EXAMPLE = (
    "highway=* & maxspeed=40mph {set mcssl=40}"
    "highway=primary & mcssl=40 [0x01]"
    "highway=* & mcssl=40 [0x02]"
    "highway=primary [0x3]"
)


def resolve(src, tags):
    rules = parse_rules(src, levels=LEVELS)
    return interpret(rules, dict(tags), el={"id": 1, "kind": "way"})


def first_code(src, tags):
    types, _ = resolve(src, tags)
    return types[0].type_code if types else None


def test_first_match1():
    src = "c=d & a=b [0x1]" "a=b & c=d [0x2]" "a=b [0x3]"
    assert first_code(src, {"a": "b", "c": "d"}) == 1


def test_first_match2():
    src = "a=b & c=d [0x1]" "c=d & a=b [0x2]" "a=b [0x3]"
    assert first_code(src, {"a": "b", "c": "d"}) == 1


def test_action_var_set_on_exists_rule1():
    tags = {"highway": "primary", "maxspeed": "40mph", "ref": "A123", "name": "Long Lane"}
    assert first_code(MAXSPEED_EXAMPLE, tags) == 1


def test_action_var_set_on_exists_rule2():
    tags = {"highway": "unclassified", "maxspeed": "40mph", "ref": "A123", "name": "Long Lane"}
    assert first_code(MAXSPEED_EXAMPLE, tags) == 2


def test_action_order():
    src = "b=c {add fred=1}" "a=b {add fred=2}" "c=d {add fred=3}" "a=b [0x1]"
    _, tags = resolve(src, {"a": "b", "b": "c", "c": "d"})
    assert tags["fred"] == "1"


def test_match_on_set_tag():
    src = "highway=yes {set abcxyz = 1}" "abcxyz=1 [0x1]"
    assert first_code(src, {"highway": "yes"}) == 1


def test_order_chain():
    src = (
        "z=1 {add fred=1;}"
        "fred=1 {add abba=1}"
        "z=1 & abba=1 {add destiny=1}"
        "destiny=1 [0x1]"
        "z=1 [0x2]"
    )
    assert first_code(src, {"z": "1"}) == 1


def test_order_chain2():
    src = (
        "z=1 {add fred=1;}"
        "fred=1 {add abba=1}"
        "abba=1 {add destiny=1}"
        "destiny=1 [0x1]"
    )
    assert first_code(src, {"z": "1"}) == 1


def test_append_in_order():
    src = (
        "highway=primary {set R='${R} a'}"
        "ref=A1 {set R='${R} b'}"
        "z=1 {set R='${R} c'}"
        "a=1 {set R='${R} d'}"
    )
    _, tags = resolve(
        src, {"R": "init", "highway": "primary", "ref": "A1", "z": "1", "a": "1"}
    )
    assert tags["R"] == "init a b c d"


def test_rule_evaluated_once():
    src = (
        "highway=primary "
        "  {set highway=primary; set result='${result} 1';}"
        "highway='primary' {set result='${result} 2'}"
    )
    _, tags = resolve(src, {"highway": "primary", "result": "0"})
    assert tags["result"] == "0 1 2"


def test_checkin_example():
    src = (
        "highway=motorway  {set blue=true;}\n"
        "blue=true  [0x1 ]\n"
        "highway=motorway [0x2]"
    )
    assert first_code(src, {"highway": "motorway"}) == 1


def test_actions_mixed_with_types():
    src = (
        "highway=primary {set marker=1}"
        "marker=2 [0x1]"
        "highway=primary {set marker=2}"
        "marker=2 [0x2]"
    )
    assert first_code(src, {"highway": "primary"}) == 2


CONTINUE_BASE = "surface=good [0x20]" "surface=bad [0x30]"


def test_continue_default():
    src = "highway=footway {set surface=good;} [0x1 continue]" + CONTINUE_BASE
    types, tags = resolve(src, {"highway": "footway", "surface": "bad"})
    assert len(types) == 2
    assert tags["surface"] == "bad"  # not propagated by default
    assert types[1].type_code == 0x30


def test_continue_propagate():
    src = "highway=footway {set surface=good;} [0x1 continue propagate]" + CONTINUE_BASE
    types, tags = resolve(src, {"highway": "footway", "surface": "bad"})
    assert len(types) == 2
    assert tags["surface"] == "good"
    assert types[1].type_code == 0x20


def test_continue_no_propagate():
    src = "highway=footway {set surface=good;} [0x1 continue no_propagate]" + CONTINUE_BASE
    types, tags = resolve(src, {"highway": "footway", "surface": "bad"})
    assert len(types) == 2
    assert tags["surface"] == "bad"
    assert types[1].type_code == 0x30


def test_continue_with_actions():
    src = "highway=footway {set surface=good;} [0x1 continue with_actions]" + CONTINUE_BASE
    types, tags = resolve(src, {"highway": "footway", "surface": "bad"})
    assert len(types) == 2
    assert tags["surface"] == "good"
    assert types[1].type_code == 0x20


def test_continue_changes_tag():
    src = (
        "highway=crossing & crossing=zebra_crossing"
        "    {set highway=deleted_crossing} [0x10404 resolution 24 continue propagate]"
        "highway=crossing [0x1010f resolution 24 continue]"
        "highway=deleted_crossing [0x6 resolution 24 continue]"
    )
    types, _ = resolve(src, {"highway": "crossing", "crossing": "zebra_crossing"})
    assert types[0].type_code == 0x10404
    assert types[1].type_code == 0x6


def test_set_with_tag_value():
    src = "a=* {set b='${a}'}" "b=1 [0x10404 resolution 24]"
    types, _ = resolve(src, {"a": "1"})
    assert types[0].type_code == 0x10404


def test_simulate_if():
    src = (
        "boundary=administrative { set mkgmap:if:0001=1 }"
        "admin_level<3 & mkgmap:if:0001=1  [0x1e resolution 12]"
        "mkgmap:if:0001!=1 & admin_level<3 [0x1f resolution 14]"
    )
    types, _ = resolve(src, {"boundary": "xyz", "admin_level": "2"})
    assert len(types) == 1
    assert types[0].type_code == 0x1f


def test_index_with_odd_order():
    src = (
        "a=* {set b=1}"
        "b=1 {set c=1}"
        "d=2 {set c=2}"
        "c=* {set a=2}"
        "c=1 {set d=2}"
        "c=2 {set d=1}"
        "d=1 [0x10401 resolution 24]"
        "d=2 [0x10402 resolution 24]"
    )
    types, _ = resolve(src, {"a": "1"})
    assert types[0].type_code == 0x10402
