"""Rule engine: hand-written semantic cases + seeded random
differential test (compiled Column program vs naive interpreter —
the RulesTest pattern, test/main/RulesTest.java:74-160)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mkgmap_spark.rules import compile_rules, interpret, parse_rules
from mkgmap_spark.rules.parser import parse_rule


# ------------------------------------------------------------- parser
def test_parse_basics():
    r = parse_rule("highway=primary [0x02 resolution 18-24]")
    assert r.gtype.type_code == 2 and (r.gtype.min_res, r.gtype.max_res) == (18, 24)
    r = parse_rule("highway=* & ref~'A[0-9]+' { set shield='${ref}' } [0x03 resolution 20-24 continue with_actions]")
    assert r.cont and r.with_actions and r.actions[0].kind == "set"
    r = parse_rule("a=1 | b=2 & !c=3 [0x01]")
    # precedence: ! > & > |
    from mkgmap_spark.rules.parser import Or

    assert isinstance(r.pred, Or)


# ------------------------------------------------- semantic hand cases
CASES = [
    # first-match wins
    (
        """
        highway=primary [0x01]
        highway=* [0x02]
        """,
        {"highway": "primary"},
        [1],
    ),
    # continue: both emitted
    (
        """
        highway=primary [0x01 continue]
        highway=* [0x02]
        """,
        {"highway": "primary"},
        [1, 2],
    ),
    # action-only rule mutates tags for later rules
    (
        """
        highway=track { set surface=dirt }
        surface=dirt [0x07]
        """,
        {"highway": "track"},
        [7],
    ),
    # add does not overwrite
    (
        """
        highway=* { add surface=paved }
        surface=dirt [0x08]
        surface=paved [0x09]
        """,
        {"highway": "x", "surface": "dirt"},
        [8],
    ),
    # plain continue does NOT persist actions; with_actions does
    (
        """
        highway=a { set marker=yes } [0x01 continue]
        marker=yes [0x02]
        highway=a [0x03]
        """,
        {"highway": "a"},
        [1, 3],
    ),
    (
        """
        highway=a { set marker=yes } [0x01 continue with_actions]
        marker=yes [0x02]
        """,
        {"highway": "a"},
        [1, 2],
    ),
    # != matches missing tag (NotEqualOp)
    ("oneway!=yes [0x04]", {"highway": "x"}, [4]),
    # numeric with non-numeric value never matches
    ("maxspeed>50 [0x05]", {"maxspeed": "fast"}, []),
    ("maxspeed>50 [0x05]", {"maxspeed": "80"}, [5]),
    # regex full-match
    ("ref~'A[0-9]+' [0x06]", {"ref": "A12"}, [6]),
    ("ref~'A[0-9]+' [0x06]", {"ref": "xA12y"}, []),
    # substitution referencing missing tag -> action skipped
    (
        """
        highway=* { set nm='${name} road' }
        nm=* [0x0a]
        highway=* [0x0b]
        """,
        {"highway": "x"},
        [11],
    ),
]


@pytest.mark.parametrize("src,tags,want", CASES)
def test_interpreter_semantics(src, tags, want):
    rules = parse_rules(src)
    got, _ = interpret(rules, tags)
    assert [g.type_code for g in got] == want


@pytest.mark.parametrize("src,tags,want", CASES)
def test_compiled_matches_interpreter_cases(spark, src, tags, want):
    rules = parse_rules(src)
    df = spark.createDataFrame([(1, tags)], "id long, tags map<string,string>")
    out = compile_rules(rules, df).collect()[0]
    assert [r["type_code"] for r in out["results"]] == want
    _, want_tags = interpret(rules, tags)
    assert dict(out["tags_out"]) == want_tags


# ------------------------------------------------------ differential
def _random_ruleset(rng: random.Random, n_rules: int) -> str:
    keys = ["highway", "surface", "ref", "maxspeed", "name", "oneway"]
    vals = ["primary", "secondary", "dirt", "paved", "yes", "no", "40", "80"]

    def pred(depth=0):
        c = rng.random()
        if depth < 2 and c < 0.2:
            return f"({pred(depth+1)} & {pred(depth+1)})"
        if depth < 2 and c < 0.35:
            return f"({pred(depth+1)} | {pred(depth+1)})"
        if depth < 2 and c < 0.45:
            return f"!({pred(depth+1)})"
        if depth < 2 and c < 0.5:
            # double-not: the shape behind the reference's n989225
            # random-failure reduction (ExpressionArrangerTest)
            return f"!!({pred(depth+1)})"
        k = rng.choice(keys)
        op = rng.choice(["=", "!=", "=*", "!=*", ">", "<", "~", "=$"])
        if op == "=$":
            # tag-value reference compare (testEqualTagValue shape)
            return f"{k}={'$'}{rng.choice(keys)}"
        if op in ("=*", "!=*"):
            return f"{k}{op}"
        if op == "~":
            return f"{k}~'{rng.choice(['p.*', '[ab]+', '.*y', 'no|yes'])}'"
        if op in (">", "<"):
            return f"{k}{op}{rng.choice(['30', '50', '70'])}"
        return f"{k}{op}{rng.choice(vals)}"

    lines = []
    for i in range(n_rules):
        acts = ""
        if rng.random() < 0.4:
            a = rng.choice(
                [
                    f"set {rng.choice(keys)}={rng.choice(vals)}",
                    f"add {rng.choice(keys)}={rng.choice(vals)}",
                    f"delete {rng.choice(keys)}",
                    "set label='${name}-x'",
                ]
            )
            acts = " { " + a + " }"
        gt = ""
        if rng.random() < 0.8:
            cont = rng.random()
            suffix = " continue with_actions" if cont < 0.15 else (" continue" if cont < 0.3 else "")
            gt = f" [0x{i + 1:02x} resolution 18-24{suffix}]"
        if not gt and not acts:
            acts = " { add x=1 }"
        lines.append(pred() + acts + gt)
    return "\n".join(lines)


def _random_tags(rng: random.Random) -> dict[str, str]:
    keys = ["highway", "surface", "ref", "maxspeed", "name", "oneway"]
    vals = ["primary", "secondary", "dirt", "paved", "yes", "no", "40", "80", "A12"]
    return {k: rng.choice(vals) for k in rng.sample(keys, rng.randint(1, 4))}


def test_differential_random(spark):
    """Seeded random rules + random tag sets: compiled == interpreted.
    (Seed fixed like the reference's default 8799543.)"""
    rng = random.Random(8799543)
    for round_i in range(3):
        rules = parse_rules(_random_ruleset(rng, 12))
        tag_sets = [_random_tags(rng) for _ in range(40)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(tag_sets)], "id long, tags map<string,string>"
        )
        got = {
            r["id"]: ([x["type_code"] for x in r["results"]], dict(r["tags_out"]))
            for r in compile_rules(rules, df).collect()
        }
        for i, tags in enumerate(tag_sets):
            types, out_tags = interpret(rules, tags)
            assert got[i][0] == [g.type_code for g in types], (round_i, i, tags)
            assert got[i][1] == out_tags, (round_i, i, tags)


def test_style_functions_length_is_closed(spark):
    """length() and is_closed() atoms: compiled vs interpreter over
    geometry-bearing rows (thresholds chosen away from float
    boundaries so JVM/libm ulp differences cannot flip results)."""
    src = """
    is_closed()=true [0x20]
    length()>50000 [0x21]
    highway=* [0x22]
    """
    rules = parse_rules(src)
    rows = [
        # closed triangle
        (1, {"highway": "x"}, [0, 0, 500, 0], [0, 500, 500, 0]),
        # long open way (~0.5 deg of longitude at equator ~ 55 km)
        (2, {"highway": "x"}, [0, 0], [0, 23301]),
        # short open way
        (3, {"highway": "x"}, [0, 10], [0, 10]),
    ]
    df = spark.createDataFrame(
        rows, "id long, tags map<string,string>, lats array<int>, lons array<int>"
    )
    out = {r["id"]: [x["type_code"] for x in r["results"]] for r in compile_rules(rules, df).collect()}
    assert out == {1: [0x20], 2: [0x21], 3: [0x22]}

    from mkgmap_spark.rules.interpreter import interpret as interp

    for rid, tags, la, lo in rows:
        types, _ = interp(rules, tags, geom={"lats": la, "lons": lo})
        assert [g.type_code for g in types] == out[rid], rid


def test_finalize_section_and_include(spark):
    """finalize rules run once, actions-only, on matched elements;
    parse_rule_files concatenates included rulesets at lower priority."""
    from mkgmap_spark.rules.parser import parse_rule_files

    src_main = """
    highway=primary [0x01]
    <finalize>
    highway=* { set done=yes }
    """
    rules = parse_rules(src_main)
    # matched element gets the finalize action
    types, tags = interpret(rules, {"highway": "primary"})
    assert [g.type_code for g in types] == [1] and tags.get("done") == "yes"
    # unmatched element does not
    types2, tags2 = interpret(rules, {"waterway": "river"})
    assert types2 == [] and "done" not in tags2

    df = spark.createDataFrame(
        [(1, {"highway": "primary"}), (2, {"waterway": "river"})],
        "id long, tags map<string,string>",
    )
    out = {r["id"]: (len(r["results"]), dict(r["tags_out"])) for r in compile_rules(rules, df).collect()}
    assert out[1][0] == 1 and out[1][1].get("done") == "yes"
    assert out[2][0] == 0 and "done" not in out[2][1]

    merged = parse_rule_files(["highway=primary [0x01]", "highway=* [0x02]"])
    types3, _ = interpret(merged, {"highway": "track"})
    assert [g.type_code for g in types3] == [2]
