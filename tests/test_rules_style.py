"""Full style-DSL surface: value filters, the complete action set,
style functions, unit numerics, if/then, apply — unit oracles plus a
compiled-vs-interpreter differential over the reference's DEFAULT
style (resources/styles/default/lines with all includes)."""

from __future__ import annotations

import random

import pytest

from mkgmap_spark.rules import compile_rules, interpret, parse_rules
from mkgmap_spark.rules.interpreter import (
    apply_filter,
    apply_sub_to_member,
    eval_template,
    perform_actions,
)
from mkgmap_spark.rules.parser import parse_rule, parse_template

STYLE_BASE = "/root/reference/resources/styles/default"


def _resolver(path: str) -> str:
    with open(f"{STYLE_BASE}/{path}") as f:
        return f.read()


# ---------------------------------------------------------- filters
FILTER_CASES = [
    # (cmd, arg, value, local_tags, expected)
    ("def", "unknown", None, {}, "unknown"),
    ("def", "unknown", "", {}, "unknown"),
    ("def", "unknown", "x", {}, "x"),
    ("conv", "m=>ft", "100", {}, "328"),  # 100 / 0.3048 = 328.08 -> round
    ("conv", "m=>ft", "30 m", {}, "98"),
    ("conv", "m=>ft", "2 km", {}, "6562"),
    ("conv", "m=>ft", "nonsense", {}, "nonsense"),
    ("conv", "m=>ft", "5 bananas", {}, "5 bananas"),
    ("conv", "km/h=>mph", "100", {}, "62"),
    ("subst", "ab=>xy", "abcab", {}, "xycxy"),
    ("subst", ";=> ", "a;b;c", {}, "a b c"),
    ("subst", "^(Doctor|Dokter) ~>Dr ", "Doctor Who", {}, "Dr Who"),
    ("subst", "needle", "needle in hay", {}, " in hay"),
    ("prefix", "box", "5", {}, "" + "5"),
    ("prefix", "1f", "x", {}, "x"),
    ("prefix", "QQ", "x", {}, "QQx"),
    ("highway-symbol", "box", "A 66", {}, "A66"),
    ("highway-symbol", "box", "A 66;B 1", {}, "A66/B1"),
    ("highway-symbol", "box:2:2", "A66", {}, "A66"),  # too long -> unchanged
    ("height", "", "100", {}, "328"),
    ("not-equal", "name", "x", {"name": "x"}, None),
    ("not-equal", "name", "x", {"name": "y"}, "x"),
    ("not-equal", "name", "x", {}, "x"),
    ("substring", "2", "abcdef", {}, "cdef"),
    ("substring", "1:3", "abcdef", {}, "bc"),
    ("substring", "9", "abc", {}, None),
    ("substring", "1:9", "abc", {}, "bc"),
    ("part", ";:1", "a;b;c", {}, "a"),
    ("part", ";:2", "a;b;c", {}, "b"),
    ("part", ";:-1", "a;b;c", {}, "c"),
    ("part", ";:9", "a;b;c", {}, None),
    ("part", ";>1", "a;b;c", {}, "b;c;"),
    ("part", ";<3", "a;b;c", {}, "a;b;"),
    # PartFilterTest.java goldens
    ("part", "", "x;y;z", {}, "x"),  # testNoArg: default ';' sep, first
    ("part", ";", "x;y;z", {}, "x"),  # testOneArg
    ("part", ":3", "Aa;Bb;Cc;Dd;Ee", {}, "Cc"),  # test2ndArg
    ("part", "#:-2", "Aa#Bb#Cc#Dd#Ee", {}, "Dd"),  # test2ndLastPart
    ("part", "#>1", "Aa#Bb#Cc#Dd#Ee", {}, "Bb#Cc#Dd#Ee#"),  # testRestAfter1
    ("part", "#<-1", "Aa#Bb#Cc#Dd#Ee", {}, "Aa#Bb#Cc#Dd#"),  # testBeforeLast
    ("part", "#<5", "Aa#Bb#Cc#Dd#Ee", {}, "Aa#Bb#Cc#Dd#"),  # testBeforeFifth
    ("part", "#:1", "xyz", {}, "xyz"),  # no separator: part 1 = whole
    ("part", "#:-1", "xyz", {}, "xyz"),
    ("part", "#:2", "xyz", {}, None),
    ("part", "--->1", "abc---def---ghi", {}, "def---ghi---"),  # multi-char sep
    ("ascii", "", "Zürich-Øst", {}, "Zurich-Ost"),
    ("country-ISO", "", "Germany", {}, "DEU"),
    ("country-ISO", "", "Atlantis", {}, "Atlantis"),
    ("not-contained", ";:route_ref", "66", {"route_ref": "22;66"}, None),
    ("not-contained", ";:route_ref", "66", {"route_ref": "22;67"}, "66"),
    ("not-contained", ";:route_ref", "66", {}, "66"),
]


@pytest.mark.parametrize("cmd,arg,value,lt,want", FILTER_CASES)
def test_filter_python(cmd, arg, value, lt, want):
    assert apply_filter(cmd, arg, value, lt) == want


def test_filters_compiled_match_interpreter(spark):
    """Every filter case through the compiled path: a one-rule style
    ``x=* { set out='${x|cmd:arg}' }`` over rows carrying the value and
    the local tags."""
    rows = []
    rules_srcs = []
    for i, (cmd, arg, value, lt, want) in enumerate(FILTER_CASES):
        tags = dict(lt)
        if value is not None:
            tags["x"] = value
        rows.append((i, tags, want))
    # one ruleset per distinct (cmd,arg): apply to all rows.  Args
    # containing '|' must be quoted (quoted_var.test form).
    def arg_src(arg: str) -> str:
        return f'"{arg}"' if "|" in arg else arg

    for i, (cmd, arg, value, lt, want) in enumerate(FILTER_CASES):
        rules_srcs.append(f"rowid={i} {{ set out='${{x|{cmd}:{arg_src(arg)}}}' }}")
    rules = parse_rules("\n".join(rules_srcs))
    df = spark.createDataFrame(
        [(i, {**t, "rowid": str(i)}) for i, t, _ in rows],
        "id long, tags map<string,string>",
    )
    got = {r["id"]: dict(r["tags_out"]).get("out") for r in compile_rules(rules, df).collect()}
    for i, tags, want in rows:
        # def rescues a missing x; all other filters propagate null ->
        # substitution fails -> set skipped -> out missing
        cmd = FILTER_CASES[i][0]
        expect = want
        assert got[i] == expect, (i, FILTER_CASES[i], got[i])
        # cross-check interpreter on the same template
        t = parse_template(f"${{x|{cmd}:{arg_src(FILTER_CASES[i][1])}}}")
        full = {**tags, "rowid": str(i)}
        assert eval_template(t, full, full) == expect, (i, FILTER_CASES[i])


# ----------------------------------------------------------- actions
def test_action_set_alternatives():
    rules = parse_rules("a=* { set out='${missing} x' | '${a}!' | 'fallback' }")
    _, tags = interpret(rules, {"a": "v"})
    assert tags["out"] == "v!"


def test_addlabel_slots_and_dup():
    acts = parse_rule("x=* { addlabel '${a}' }").actions
    t = perform_actions(acts, {"a": "L", "x": "1"})
    assert t["mkgmap:label:1"] == "L"
    t2 = perform_actions(acts, t)  # same value again -> dup, not added
    assert "mkgmap:label:2" not in t2
    t3 = perform_actions(parse_rule("x=* { addlabel 'M' }").actions, t)
    assert t3["mkgmap:label:2"] == "M"


def test_setaccess_addaccess():
    acts = parse_rule("x=* { addaccess no }").actions
    t = perform_actions(acts, {"x": "1", "mkgmap:foot": "yes"})
    assert t["mkgmap:foot"] == "yes" and t["mkgmap:car"] == "no" and t["mkgmap:truck"] == "no"
    acts2 = parse_rule("x=* { setaccess yes }").actions
    t2 = perform_actions(acts2, t)
    assert t2["mkgmap:foot"] == "yes" and t2["mkgmap:car"] == "yes"


def test_rename_deletealltags():
    acts = parse_rule("x=* { rename a b; }").actions
    assert perform_actions(acts, {"a": "1", "x": "y"}) == {"b": "1", "x": "y"}
    assert perform_actions(acts, {"b": "2", "x": "y"}) == {"b": "2", "x": "y"}
    acts2 = parse_rule("x=* { deletealltags }").actions
    assert perform_actions(acts2, {"a": "1", "x": "y"}) == {}


def test_maxspeed_function():
    rules = parse_rules("maxspeedkmh() >= 99 [0x1]\nmaxspeed=* [0x2]")
    types, _ = interpret(rules, {"maxspeed": "70 mph"})  # 112.7 kmh
    assert [g.type_code for g in types] == [1]
    types, _ = interpret(rules, {"maxspeed": "50"})
    assert [g.type_code for g in types] == [2]
    types, _ = interpret(rules, {"maxspeed": "60 km/h"})
    assert [g.type_code for g in types] == [2]


def test_unit_suffix_numeric_compare():
    # ValueWithUnit: units parsed but NOT converted — '30 mph' is 30
    rules = parse_rules("maxspeed>25 [0x1]\nmaxspeed=* [0x2]")
    types, _ = interpret(rules, {"maxspeed": "30 mph"})
    assert [g.type_code for g in types] == [1]
    types, _ = interpret(rules, {"maxspeed": "20 mph"})
    assert [g.type_code for g in types] == [2]


def test_not_regex_missing_tag():
    rules = parse_rules("ref!~'A.*' [0x1]")
    assert [g.type_code for g in interpret(rules, {})[0]] == [1]
    assert [g.type_code for g in interpret(rules, {"ref": "B1"})[0]] == [1]
    assert interpret(rules, {"ref": "A1"})[0] == []


def test_area_size_and_type(spark):
    rules = parse_rules("area_size() > 100000 [0x1]\ntype()=way [0x2]")
    geom_big = {"lats": [0, 0, 1000, 1000, 0], "lons": [0, 1000, 1000, 0, 0]}
    types, _ = interpret(rules, {}, geom=geom_big, el={"id": 1, "kind": "way"})
    assert [g.type_code for g in types] == [1]
    geom_open = {"lats": [0, 1000], "lons": [0, 1000]}
    types, _ = interpret(rules, {}, geom=geom_open, el={"id": 1, "kind": "way"})
    assert [g.type_code for g in types] == [2]
    df = spark.createDataFrame(
        [(1, {}, geom_big["lats"], geom_big["lons"]), (2, {}, geom_open["lats"], geom_open["lons"])],
        "id long, tags map<string,string>, lats array<int>, lons array<int>",
    )
    # type() requires a kind column
    with pytest.raises(ValueError):
        compile_rules(rules, df, id_col="id", kind_col=None)
    import pyspark.sql.functions as F

    df2 = df.withColumn("kind", F.lit("way"))
    out2 = {r["id"]: [x["type_code"] for x in r["results"]]
            for r in compile_rules(rules, df2, id_col="id", kind_col="kind").collect()}
    assert out2 == {1: [1], 2: [2]}


# -------------------------------------------------------------- apply
def test_apply_pushes_and_member_execution():
    src = """
    type=route & route=bus & ref=* {
      apply { set route_ref='$(route_ref);${ref|not-contained:;:route_ref}' | '$(route_ref)' | '${ref}'; }
    }
    """
    rules = parse_rules(src)
    el = {"id": 7, "kind": "relation"}
    types, tags = interpret(rules, {"type": "route", "route": "bus", "ref": "66"}, el=el)
    assert len(el["pushed"]) == 1
    sub, ctx = el["pushed"][0]
    assert ctx["ref"] == "66"
    # member without route_ref -> gets the relation ref
    m1, nested = apply_sub_to_member(sub, ctx, {"name": "stop A"})
    assert m1["route_ref"] == "66" and nested == []
    # member with other refs -> appended
    m2, _ = apply_sub_to_member(sub, ctx, {"route_ref": "22"})
    assert m2["route_ref"] == "22;66"
    # member already containing it -> unchanged (not-contained kills
    # alt 1, alt 2 keeps existing)
    m3, _ = apply_sub_to_member(sub, ctx, {"route_ref": "66"})
    assert m3["route_ref"] == "66"


def test_apply_role_and_once_flags():
    r = parse_rule("type=route { apply_once role=stop { add marker=yes } }")
    a = r.actions[0]
    assert a.kind == "apply" and a.once and a.role == "stop"
    assert a.sub[0].kind == "add"


def test_compiled_pushed_column(spark):
    src = "type=route { set seen=yes; apply { add m=1 } }"
    rules = parse_rules(src)
    df = spark.createDataFrame(
        [(1, {"type": "route"}), (2, {"type": "multipolygon"})],
        "id long, tags map<string,string>",
    )
    out = {
        r["id"]: [(p["sub_idx"], dict(p["ctx"])) for p in r["pushed"]]
        for r in compile_rules(rules, df, is_relation=True, with_pushed=True).collect()
    }
    assert out[2] == []
    assert len(out[1]) == 1
    sub_idx, ctx = out[1][0]
    assert sub_idx == 0 and ctx.get("seen") == "yes"  # snapshot mid-action-list


def test_apply_pushed_to_members_end_to_end(spark):
    """DataFrame wiring of apply: a route relation pushes route_ref to
    its members; a nested apply role=passengers pushes to a member
    sub-relation's members (the default relations style's bus-route
    pattern)."""
    from mkgmap_spark.operators.relations import apply_pushed_to_members

    src = """
    type=route & route=bus & ref=* {
      apply {
        set route_ref='$(route_ref);${ref|not-contained:;:route_ref}' | '$(route_ref)' | '${ref}';
        set mkgmap:relref='${ref}';
        apply role=passengers {
          set route_ref='$(route_ref),${mkgmap:relref}' | '${mkgmap:relref}';
        }
        delete mkgmap:relref;
      }
    }
    """
    rules = parse_rules(src)
    rels = spark.createDataFrame(
        [
            (100, {"type": "route", "route": "bus", "ref": "66"},
             [("stop", "node", 1), ("", "relation", 200)]),
            (200, {"type": "stop_area"}, [("passengers", "node", 2)]),
        ],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    feats = spark.createDataFrame(
        [
            ("node", 1, {"name": "stop A", "route_ref": "22"}),
            ("node", 2, {"name": "wait area"}),
            ("relation", 200, {"type": "stop_area"}),
        ],
        "kind string, id long, tags map<string,string>",
    )
    out = compile_rules(rules, rels, is_relation=True, with_pushed=True)
    updated = apply_pushed_to_members(rels, feats, rules, relations_out=out)
    got = {(r["kind"], r["id"]): dict(r["tags"]) for r in updated.collect()}
    assert got[("node", 1)]["route_ref"] == "22;66"
    # nested apply: member relation 200's passengers member got relref
    assert got[("node", 2)]["route_ref"] == "66"
    # the member relation itself ran the outer sub-actions too (no role
    # filter on the outer apply), then relref was deleted
    assert got[("relation", 200)].get("route_ref") == "66"
    assert "mkgmap:relref" not in got[("relation", 200)]


# ------------------------------------------- default style differential
HW = ["motorway", "trunk", "primary", "secondary", "residential", "footway",
      "path", "track", "cycleway", "proposed", "service", "steps"]
KV = {
    "name": ["Acacia Avenue", "High St"], "ref": ["M1", "A66;B12", "I 80"],
    "maxspeed": ["30 mph", "50", "RU:urban", "walk", "none"],
    "surface": ["asphalt", "gravel", "cobblestone"],
    "access": ["yes", "no", "private", "destination", "agricultural"],
    "foot": ["yes", "no"], "bicycle": ["yes", "designated"], "toll": ["yes"],
    "oneway": ["yes", "-1"], "junction": ["roundabout"],
    "tracktype": ["grade1", "grade3"], "addr:housenumber": ["12"],
    "tunnel": ["yes"], "int_ref": ["E 45"], "network": ["e-road", "US:I"],
    "abandoned:highway": ["yes"], "mtb:scale": ["3"],
    "sac_scale": ["alpine_hiking"], "addr:country": ["Germany"],
    "is_in:country": ["France"],
}


def test_default_style_differential(spark):
    """The reference's shipped default style (lines + includes, 266
    rules incl. the finalize address/access/roadspeed blocks):
    compiled == interpreted on randomized realistic elements."""
    rules = parse_rules(open(f"{STYLE_BASE}/lines").read(), resolver=_resolver)
    rng = random.Random(8799543)
    rows = []
    for i in range(120):
        tags = {"highway": rng.choice(HW)}
        for k in rng.sample(list(KV), rng.randint(0, 6)):
            tags[k] = rng.choice(KV[k])
        la = [rng.randint(-4_000_000, 4_000_000) for _ in range(rng.randint(2, 5))]
        lo = [rng.randint(-8_000_000, 8_000_000) for _ in range(len(la))]
        if rng.random() < 0.3 and len(la) >= 3:
            la.append(la[0])
            lo.append(lo[0])
        rows.append((i, tags, la, lo))
    df = spark.createDataFrame(
        rows, "id long, tags map<string,string>, lats array<int>, lons array<int>"
    )
    got = {
        r["id"]: (
            [(x["type_code"], x["min_res"], x["max_res"], x["road_class"], x["road_speed"]) for x in r["results"]],
            dict(r["tags_out"]),
        )
        for r in compile_rules(rules, df, id_col="id").collect()
    }
    for i, tags, la, lo in rows:
        types, want_tags = interpret(
            rules, tags, geom={"lats": la, "lons": lo}, el={"id": i, "kind": "way"}
        )
        want = (
            [(g.type_code, g.min_res, g.max_res, g.road_class, g.road_speed) for g in types],
            want_tags,
        )
        assert got[i] == want, (i, tags, got[i], want)


def test_default_style_all_files_parse():
    for f, min_rules in (("lines", 200), ("points", 200), ("polygons", 100), ("relations", 10)):
        rules = parse_rules(open(f"{STYLE_BASE}/{f}").read(), resolver=_resolver)
        assert len(rules) >= min_rules, (f, len(rules))


def test_default_points_polygons_differential(spark):
    """The default points + polygons styles (different construct mix:
    area_size gates, addaccess, country-ISO in finalize) compiled ==
    interpreted."""
    import random as _r

    for fname, kv in (
        ("points", {
            "place": ["city", "town", "village", "hamlet"],
            "amenity": ["pub", "fuel", "parking", "hospital", "place_of_worship"],
            "highway": ["traffic_signals", "crossing"],
            "name": ["Eagle", "Lion Inn"],
            "religion": ["christian", "muslim"],
            "addr:housenumber": ["7"],
            "barrier": ["gate", "bollard"],
            "ele": ["120", "3000"],
            "natural": ["peak", "tree"],
        }),
        ("polygons", {
            "landuse": ["residential", "forest", "farm", "industrial"],
            "natural": ["water", "wood"],
            "building": ["yes", "house"],
            "leisure": ["park", "pitch"],
            "amenity": ["school", "parking"],
            "name": ["Green Park"],
            "aeroway": ["aerodrome"],
        }),
    ):
        rules = parse_rules(open(f"{STYLE_BASE}/{fname}").read(), resolver=_resolver)
        rng = _r.Random(1234)
        rows = []
        for i in range(80):
            tags = {}
            for k in rng.sample(list(kv), rng.randint(1, 4)):
                tags[k] = rng.choice(kv[k])
            la = [rng.randint(-4_000_000, 4_000_000) for _ in range(rng.randint(1, 5))]
            lo = [rng.randint(-8_000_000, 8_000_000) for _ in range(len(la))]
            if fname == "polygons" and len(la) >= 3:
                la.append(la[0])
                lo.append(lo[0])
            rows.append((i, tags, la, lo))
        df = spark.createDataFrame(
            rows, "id long, tags map<string,string>, lats array<int>, lons array<int>"
        )
        got = {
            r["id"]: ([(x["type_code"], x["min_res"]) for x in r["results"]], dict(r["tags_out"]))
            for r in compile_rules(rules, df, id_col="id").collect()
        }
        for i, tags, la, lo in rows:
            types, want_tags = interpret(
                rules, tags, geom={"lats": la, "lons": lo}, el={"id": i, "kind": "node" if fname == "points" else "way"}
            )
            want = ([(g.type_code, g.min_res) for g in types], want_tags)
            assert got[i] == want, (fname, i, tags, got[i], want)


def test_default_relations_style_end_to_end(spark):
    """The REAL default relations style: a bus-route relation pushes
    route_ref to stop members (incl. the nested role=passengers apply),
    via the compiled pushed column + the member executor."""
    from mkgmap_spark.operators.relations import apply_pushed_to_members

    rules = parse_rules(open(f"{STYLE_BASE}/relations").read(), resolver=_resolver)
    rels = spark.createDataFrame(
        [
            (1, {"type": "route", "route": "bus", "ref": "42", "name": "Line 42"},
             [("stop", "node", 10), ("platform", "node", 11), ("", "way", 20)]),
            (2, {"type": "multipolygon", "landuse": "forest"}, [("outer", "way", 21)]),
        ],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    feats = spark.createDataFrame(
        [
            ("node", 10, {"highway": "bus_stop", "route_ref": "7"}),
            ("node", 11, {"name": "platform"}),
            ("way", 20, {"highway": "residential"}),
            ("way", 21, {"natural": "wood"}),
        ],
        "kind string, id long, tags map<string,string>",
    )
    out = compile_rules(rules, rels, is_relation=True, with_pushed=True)
    pushed = {r["id"]: r["pushed"] for r in out.collect()}
    assert len(pushed[1]) >= 1  # the route rule pushed
    assert pushed[2] == []  # multipolygon branch pushes nothing here

    updated = apply_pushed_to_members(rels, feats, rules, relations_out=out)
    got = {(r["kind"], r["id"]): dict(r["tags"]) for r in updated.collect()}
    # stop node: ref appended via not-contained template
    assert got[("node", 10)]["route_ref"] == "7;42"
    assert got[("node", 11)]["route_ref"] == "42"
    assert got[("way", 20)]["route_ref"] == "42"
    # the interpreter agrees member-for-member
    from mkgmap_spark.rules.interpreter import apply_sub_to_member

    el = {"id": 1, "kind": "relation"}
    interpret(rules, {"type": "route", "route": "bus", "ref": "42", "name": "Line 42"}, el=el)
    assert len(el["pushed"]) == len(pushed[1])
    tags10 = {"highway": "bus_stop", "route_ref": "7"}
    for sub, ctx in el["pushed"]:
        tags10, _ = apply_sub_to_member(sub, ctx, tags10)
    assert tags10["route_ref"] == got[("node", 10)]["route_ref"]


def test_differential_random_full_dsl(spark):
    """Seeded random rulesets over the FULL round-2 DSL surface
    (filters, $refs, setaccess/addlabel/rename/deletealltags, !~,
    maxspeedkmh, multiple type-defs, finalize): compiled ==
    interpreted on random tag sets.  The RulesTest pattern widened."""
    import random as _r

    rng = _r.Random(8799543)
    keys = ["highway", "surface", "ref", "maxspeed", "name", "oneway", "route_ref", "access"]
    vals = ["primary", "secondary", "dirt", "paved", "yes", "no", "40", "80", "A12;B4", "30 mph", "x me"]

    def pred(depth=0):
        c = rng.random()
        if depth < 2 and c < 0.18:
            return f"({pred(depth+1)} & {pred(depth+1)})"
        if depth < 2 and c < 0.32:
            return f"({pred(depth+1)} | {pred(depth+1)})"
        if depth < 2 and c < 0.40:
            return f"!({pred(depth+1)})"
        if c < 0.44:
            return f"maxspeedkmh() {rng.choice(['>', '<'])} {rng.choice(['40', '90'])}"
        k = rng.choice(keys)
        op = rng.choice(["=", "!=", "=*", "!=*", ">", "<", "~", "!~", "="])
        if op in ("=*", "!=*"):
            return f"{k}{op}"
        if op in ("~", "!~"):
            return f"{k}{op}'{rng.choice(['p.*', '[ab]+', '.*y', 'no|yes', '.*mph'])}'"
        if op in (">", "<"):
            return f"{k}{op}{rng.choice(['30', '50', '70'])}"
        if rng.random() < 0.2:
            return f"{k}{op}${rng.choice(keys)}"  # value-side tag ref
        return f"{k}{op}{rng.choice(vals[:8])}"

    def template():
        c = rng.random()
        k = rng.choice(keys)
        if c < 0.25:
            return f"'${{{k}}}'"
        if c < 0.45:
            f = rng.choice(
                ["def:zz", "subst:a=>o", "substring:1", "part:;:1", "prefix:R",
                 "not-equal:name", "conv:m=>ft", "highway-symbol:box"]
            )
            return f"'${{{k}|{f}}}'"
        if c < 0.6:
            return f"'${{{rng.choice(keys)}}}-${{{rng.choice(keys)}}}'"
        return f"'{rng.choice(vals)}'"

    def action():
        c = rng.random()
        k = rng.choice(keys)
        if c < 0.3:
            alts = " | ".join(template() for _ in range(rng.randint(1, 3)))
            return f"set {k}={alts}"
        if c < 0.45:
            return f"add {k}={template()}"
        if c < 0.55:
            return f"delete {rng.choice(keys)}"
        if c < 0.65:
            return f"name {template()}"
        if c < 0.75:
            return f"addlabel {template()}"
        if c < 0.82:
            return f"rename {rng.choice(keys)} {rng.choice(keys)}"
        if c < 0.9:
            return f"{rng.choice(['setaccess', 'addaccess'])} {rng.choice(['yes', 'no'])}"
        return "deletealltags"

    def ruleset(n):
        lines = []
        for i in range(n):
            acts = ""
            if rng.random() < 0.55:
                acts = " { " + "; ".join(action() for _ in range(rng.randint(1, 3))) + " }"
            gt = ""
            if rng.random() < 0.7:
                cont = rng.random()
                suffix = " continue with_actions" if cont < 0.15 else (" continue" if cont < 0.3 else "")
                extra = " road_class=2 road_speed=3" if rng.random() < 0.2 else ""
                gt = f" [0x{i + 1:02x} resolution 18-24{extra}{suffix}]"
                if rng.random() < 0.1:
                    gt += f" [0x{i + 101:02x} resolution 16]"
            if not gt and not acts:
                acts = " { add x=1 }"
            lines.append(pred() + acts + gt)
        if rng.random() < 0.5:
            lines.append("<finalize>")
            for _ in range(rng.randint(1, 3)):
                lines.append(pred() + " { " + action().replace("deletealltags", "add fz=1") + " }")
        return "\n".join(lines)

    def tagset():
        return {k: rng.choice(vals) for k in rng.sample(keys, rng.randint(1, 5))}

    for round_i in range(4):
        rules = parse_rules(ruleset(14))
        tag_sets = [tagset() for _ in range(30)]
        # sprinkle the finalize-fallback trigger
        for t in tag_sets[:5]:
            t["mkgmap:execute_finalize_rules"] = "true"
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(tag_sets)], "id long, tags map<string,string>"
        )
        got = {
            r["id"]: (
                [(x["type_code"], x["road_class"], x["road_speed"]) for x in r["results"]],
                dict(r["tags_out"]),
            )
            for r in compile_rules(rules, df).collect()
        }
        for i, tags in enumerate(tag_sets):
            types, out_tags = interpret(rules, tags)
            want = ([(g.type_code, g.road_class, g.road_speed) for g in types], out_tags)
            assert got[i] == want, (round_i, i, tags, got[i], want)


# ValueBuilderTest.java goldens: template parsing incl. quoted filter
# args containing pipes, spaced pipes, and chained subst+def
VALUE_BUILDER_CASES = [
    ("${name} road", {"name": "abc abc"}, "abc abc road"),
    ("init ${name|subst:abc=>xyz} final", {"name": "abc road abc"},
     "init xyz road xyz final"),
    ("${name|subst:abc=>xyz|subst:def=>www|def:unset}", {}, "unset"),
    ("${name|subst:abc=>xyz|subst:def=>www|def:unset}", {"name": "abc def"},
     "xyz www"),
    ("${name|subst:abc=>x y z }!", {"name": "Tabc"}, "Tx y z !"),
    ("${name|subst:'abc=>x y z '}!", {"name": "Tabc"}, "Tx y z !"),
    ('${name|subst:"abc=>x y z "}!', {"name": "Tabc"}, "Tx y z !"),
    ("${name|subst:'abc=>x|y'|subst:'defg=>w|w\"w'|def:'unset string' }", {},
     "unset string"),
    ("${name|subst:'abc=>x|y'|subst:'defg=>w|w\"w'|def:'unset string' }",
     {"name": "abc defg"}, 'x|y w|w"w'),
    ("${name | subst:'abc=>x|y' | subst:'defg=>w|w' | def:'unset string' }",
     {}, "unset string"),
    ("${name | subst:'abc=>x|y' | subst:'defg=>w|w' | def:'unset string' }",
     {"name": "abc defg"}, "x|y w|w"),
]


@pytest.mark.parametrize("src,tags,want", VALUE_BUILDER_CASES)
def test_value_builder_goldens(src, tags, want):
    from mkgmap_spark.rules.interpreter import eval_template
    from mkgmap_spark.rules.parser import parse_template

    assert eval_template(parse_template(src), tags) == want
