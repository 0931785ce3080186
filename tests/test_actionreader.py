"""Port of the reference's ActionReaderTest
(test/uk/me/parabola/mkgmap/osmstyle/ActionReaderTest.java): action
block parsing + execution semantics (set/add/rename/name alternatives,
apply with role filters and relation-context substitution, error
cases).  Driven through parse_rules + interpret — the action list is
attached to an always-matching predicate like ActionRule(null, ...)."""

from __future__ import annotations

import pytest

from mkgmap_spark.rules import parse_rules
from mkgmap_spark.rules.interpreter import apply_sub_to_member, interpret


def run_actions(block: str, tags: dict, el=None):
    """ActionRule(null, actions).resolveType equivalent: an
    unconditional action rule over one element's tags."""
    rules = parse_rules(f"test=* {block}")
    _, out = interpret(rules, dict(tags), el=el if el is not None else {"id": 0, "kind": "way"})
    return rules[0].actions, out


def std_tags():
    return {"park": "no", "test": "1"}


def test_simple_set():
    actions, tags = run_actions("{set park=yes}", std_tags())
    assert len(actions) == 1
    assert tags["park"] == "yes"


def test_simple_add():
    actions, tags = run_actions("{add park=yes}", std_tags())
    assert len(actions) == 1
    assert tags["park"] == "no"  # add does not overwrite


def test_rename():
    actions, tags = run_actions("{rename park landarea}", std_tags())
    assert len(actions) == 1
    assert "park" not in tags or tags.get("park") is None
    assert tags["landarea"] == "no"


def test_free_form():
    actions, tags = run_actions(
        " { set web='world wide';" "set \nribbon = 'yellow' \n# a comment \n} ", std_tags()
    )
    assert len(actions) == 2
    assert tags["park"] == "no"
    assert tags["web"] == "world wide"
    assert tags["ribbon"] == "yellow"


def test_multiple_commands():
    actions, tags = run_actions(
        "{set park=yes; add fred=other;" "set pooh=bear}", std_tags()
    )
    assert len(actions) == 3
    assert tags["park"] == "yes"
    assert tags["fred"] == "other"
    assert tags["pooh"] == "bear"


def test_name_action():
    _, tags = run_actions(
        "{name '${name} (${ref})' |" "  '${ref}' | '${name}' ; }",
        {**std_tags(), "name": "Main St"},
    )
    assert tags["mkgmap:label:1"] == "Main St"


def test_double_name():
    block = (
        "{name '${name} (${ref})' |"
        "  '${ref}' | '${name}' ; "
        " name 'fred';}"
    )
    _, tags = run_actions(block, std_tags())
    assert tags["mkgmap:label:1"] == "fred"
    _, tags = run_actions(block, {**std_tags(), "ref": "A1"})
    assert tags["mkgmap:label:1"] == "A1"
    _, tags = run_actions(block, {**std_tags(), "ref": "A1", "name": "Main St"})
    assert tags["mkgmap:label:1"] == "Main St (A1)"


def _run_relation(block: str, rel_tags: dict, members: list[tuple[str, dict]]):
    """Run an unconditional action rule on a relation, then push the
    collected apply blocks to each member (role filter included)."""
    rules = parse_rules(f"test=* {block}")
    el = {"id": 23, "kind": "relation", "pushed": []}
    _, out_rel = interpret(rules, dict(rel_tags), el=el)
    out_members = []
    for role, mtags in members:
        cur = dict(mtags)
        for sub, ctx in el["pushed"]:
            if sub.role is not None and sub.role != role:
                continue
            cur, _ = apply_sub_to_member(sub, ctx, cur)
        out_members.append(cur)
    return out_rel, out_members


def test_apply_action():
    rel, (m1, m2) = _run_relation(
        "{apply {" "add route=bike;" "set foo=bar; }" "}\n",
        {"test": "1"},
        [("bar", std_tags()), ("foo", std_tags())],
    )
    assert rel.get("route") is None  # not set on the relation itself
    assert m1["route"] == "bike" and m1["foo"] == "bar"
    assert m2["route"] == "bike" and m2["foo"] == "bar"


def test_apply_with_role():
    _, (m1, m2) = _run_relation(
        "{apply role=bar {" "add route=bike;" "set foo=bar; }}",
        {"test": "1"},
        [("bar", std_tags()), ("foo", std_tags())],
    )
    assert m1["route"] == "bike" and m1["foo"] == "bar"
    assert m2.get("route") is None and m2.get("foo") is None


def test_apply_with_subst():
    """${..} in apply sub-actions reads the RELATION's tags, not the
    member's."""
    _, (m1,) = _run_relation(
        "{apply {" "add route='${route_no}';" "}}",
        {"test": "1", "route_no": "66"},
        [("bar", {**std_tags(), "route_no": "42"})],
    )
    assert m1["route"] == "66"


def test_empty_action_list():
    actions, _ = run_actions("{}", std_tags())
    assert actions == []


def test_alternatives():
    _, tags = run_actions("{set fred = '${park}' | 'default value'}", std_tags())
    assert tags["fred"] == "no"


def test_second_alternative():
    _, tags = run_actions(
        "{set fred = '${notset}' | 'default value'}", {**std_tags(), "fred": "origvalue"}
    )
    assert tags["fred"] == "default value"


def test_multiple_no_separators():
    actions, tags = run_actions(
        "{" "set park='${notset}' | yes " "add fred=other " "set pooh=bear}", std_tags()
    )
    assert len(actions) == 3
    assert tags["park"] == "yes"
    assert tags["fred"] == "other"
    assert tags["pooh"] == "bear"


@pytest.mark.parametrize(
    "block",
    [
        "{bad }",
        "{set park= }",
        "{set park=yes some other junk }",
        "{set park='${notset}' | }",
        "{set park=yes 'some' other junk }",
    ],
)
def test_syntax_errors(block):
    with pytest.raises(Exception):
        parse_rules(f"test=* {block}")
