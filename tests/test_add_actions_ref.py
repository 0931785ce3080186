"""Ports of the reference's AddTagActionTest and AddAccessActionTest
(test/uk/me/parabola/mkgmap/osmstyle/actions/) through the rule-file
surface: substitution, defaults, unit conversion, highway symbols,
alternatives, and the add-vs-set overwrite matrix for the eight
access tags."""

from __future__ import annotations

import pytest

from mkgmap_spark.rules.interpreter import perform_actions
from mkgmap_spark.rules.parser import ACCESS_TAG_KEYS, parse_rule


def run(src: str, tags: dict) -> dict:
    return perform_actions(parse_rule(src).actions, dict(tags))


STD = {"ref": "A11", "name:cy": "Trefriw", "x": "1"}


# ------------------------------------------------- AddTagActionTest
def test_no_sub():
    assert run("x=* { add a='fred' }", STD)["a"] == "fred"


def test_bare_subst():
    assert run("x=* { add a='${ref}' }", STD)["a"] == "A11"


def test_many_subs():
    assert (
        run("x=* { add a='Road ${ref}, name ${name:cy}' }", STD)["a"]
        == "Road A11, name Trefriw"
    )


def test_no_value():
    """A failed substitution leaves the tag unchanged, even for set."""
    t = run("x=* { set a='Road ${noexist}, name ${name:cy}' }",
            {**STD, "a": "before"})
    assert t["a"] == "before"


def test_number_with_unit():
    t = run("x=* { add result='${ele|conv:m=>ft}' }", {**STD, "ele": "100"})
    assert t["result"] == "328"


def test_subst_with_default():
    src = "x=* { set result='${ref|def:default-ref}' }"
    assert run(src, STD)["result"] == "A11"
    no_ref = {k: v for k, v in STD.items() if k != "ref"}
    assert run(src, no_ref)["result"] == "default-ref"


def test_highway_symbol():
    t = run("x=* { add a='${ref|highway-symbol:hbox}' }", STD)
    assert t["a"] == "\u0004A11"


def test_no_matching_alternatives():
    t = run("x=* { add a='${notset}' | '${hello}' | '${world}' }", STD)
    assert "a" not in t


def test_first_alternative_matches():
    t = run("x=* { add a='${val}' | '${hello}' | '${world}' }",
            {**STD, "val": "has value", "hello": "hello"})
    assert t["a"] == "has value"


def test_second_alternative_matches():
    t = run("x=* { add a='${val}' | '${hello}' | '${world}' }",
            {**STD, "hello": "hello", "world": "world"})
    assert t["a"] == "hello"


# ---------------------------------------------- AddAccessActionTest
ASTD = {"access": "no", "bicycle": "yes", "foot": "private",
        "highway": "track"}


def test_access_literal_rejected_at_parse():
    """AddAccessActionTest.testNoSub constructs the Action directly
    with value 'fred'; through the rule-file surface the reference's
    ActionReader.readAccessValue (ActionReader.java:213-214) rejects
    any non-yes/no literal without a '$' — so does our parser."""
    with pytest.raises(Exception):
        parse_rule("highway=* { addaccess 'fred' }")


def test_access_bare_subst():
    t = run("highway=* { addaccess '${access}' }", ASTD)
    assert all(t[k] == "no" for k in ACCESS_TAG_KEYS)


def test_access_no_value():
    t = run("highway=* { setaccess '${noexist}' }",
            {**ASTD, "mkgmap:bicycle": "before"})
    assert t["mkgmap:bicycle"] == "before"


def test_access_no_overwrite():
    """addaccess only fills per-tag gaps; existing values survive."""
    t = run("highway=* { addaccess '${access}' }",
            {**ASTD, "mkgmap:bicycle": "yes"})
    assert t["mkgmap:bicycle"] == "yes"
    assert all(t[k] == "no" for k in ACCESS_TAG_KEYS
               if k != "mkgmap:bicycle")


def test_access_overwrite():
    """setaccess overwrites every access tag."""
    t = run("highway=* { setaccess '${access}' }",
            {**ASTD, "mkgmap:bicycle": "yes"})
    assert all(t[k] == "no" for k in ACCESS_TAG_KEYS)


def test_access_no_matching_alternatives():
    t = run("highway=* { addaccess '${notset}' | '${hello}' | '${world}' }",
            ASTD)
    assert all(k not in t for k in ACCESS_TAG_KEYS)


def test_access_first_alternative_matches():
    t = run("highway=* { addaccess '${access}' | '${hello}' | '${world}' }",
            {**ASTD, "hello": "hello"})
    assert all(t[k] == "no" for k in ACCESS_TAG_KEYS)


def test_access_second_alternative_matches():
    t = run("highway=* { addaccess '${hello}' | '${access}' | '${world}' }",
            {**ASTD, "world": "world"})
    assert all(t[k] == "no" for k in ACCESS_TAG_KEYS)
