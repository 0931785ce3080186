"""Ports of the reference's ValueBuilderTest and PartFilterTest
(test/uk/me/parabola/mkgmap/osmstyle/actions/ValueBuilderTest.java,
PartFilterTest.java): template substitution with quoted / spaced /
multi-line filter args, and the full part-filter argument grammar —
run against the interpreter engine, with the style-manual phone
example also checked through the compiled SQL twin."""

from __future__ import annotations

import pytest

from mkgmap_spark.rules.interpreter import apply_filter, eval_template
from mkgmap_spark.rules.parser import parse_template

# (template, element tags, expected) — ValueBuilderTest order
VALUE_BUILDER_CASES = [
    # testVariable
    ("${name} road", {"name": "abc abc"}, "abc abc road"),
    # testSimpleSubst
    ("init ${name|subst:abc=>xyz} final", {"name": "abc road abc"},
     "init xyz road xyz final"),
    # testMultiSubst: unset -> default, set -> both substitutions
    ("${name|subst:abc=>xyz|subst:def=>www|def:unset}", {}, "unset"),
    ("${name|subst:abc=>xyz|subst:def=>www|def:unset}", {"name": "abc def"},
     "xyz www"),
    # testSubstWithSpace / testQuotedArg / testDQuotedArg
    ("${name|subst:abc=>x y z }!", {"name": "Tabc"}, "Tx y z !"),
    ("${name|subst:'abc=>x y z '}!", {"name": "Tabc"}, "Tx y z !"),
    ('${name|subst:"abc=>x y z "}!', {"name": "Tabc"}, "Tx y z !"),
    # testQuotedArgs: quoted args may contain the pipe separator
    ("${name|subst:'abc=>x|y'|subst:'defg=>w|w\"w'|def:'unset string' }",
     {}, "unset string"),
    ("${name|subst:'abc=>x|y'|subst:'defg=>w|w\"w'|def:'unset string' }",
     {"name": "abc defg"}, 'x|y w|w"w'),
    # testSpacedQuotedArgs: spaces around the pipes
    ("${name | subst:'abc=>x|y' | subst:'defg=>w|w' | def:'unset string' }",
     {}, "unset string"),
    ("${name | subst:'abc=>x|y' | subst:'defg=>w|w' | def:'unset string' }",
     {"name": "abc defg"}, "x|y w|w"),
    # testSpacedArgsOldSyntax: unquoted arg, space before the pipe
    ("{ name '${rcnname | substring:1:14}' }",
     {"rcnname": "1234567890123456789"}, "{ name '2345678901234' }"),
    # testQuotedSplitLines: the style-manual phone normalization — a
    # NEWLINE inside the [...] class and a quantified anchor ^+3530
    # (legal Java regex; needs the interpreter's _java_re_compat shim)
    ("${cs:phone|subst:^00~>+|subst:[-\n()]~>|subst:^0~>+353"
     "|subst:^+3530~>+353}",
     {"mkgmap:country": "IRL", "cs:phone": "00(22)5554-444"}, "+225554444"),
    # testExample: regex alternation + trailing space in quoted arg
    ("${name|subst:'^(Doctor|Dokter) ~>Dr '}", {"name": "Doctor Who"},
     "Dr Who"),
    # testEmptyArg / testEmptyQuotedArg
    ("${name|def:}", {}, ""),
    ("${name|def:''}", {}, ""),
    # testTranslitAscii / testTranslitLatin1
    ("${name|ascii}", {"name": "frêd"}, "fred"),
    ("${name|latin1}", {"name": "frêdş"}, "frêds"),
]


@pytest.mark.parametrize("src,tags,want", VALUE_BUILDER_CASES)
def test_value_builder(src, tags, want):
    assert eval_template(parse_template(src), tags) == want


def test_used_tags():
    """ValueBuilderTest.testUsedTags: only the referenced tag counts."""
    t = parse_template("${name}")
    assert {it.tag for it in t.items if it.tag} == {"name"}


# (part arg, input value, expected) — PartFilterTest order
PART_CASES = [
    ("", "x;y;z", "x"),            # testNoArg: default sep ';', part 1
    (";", "x;y;z", "x"),           # testOneArg
    (":3", "Aa;Bb;Cc;Dd;Ee", "Cc"),  # test2ndArg
    ("#:1", "Aa#Bb#Cc#Dd#Ee", "Aa"),   # testFirstPart
    ("#:-1", "Aa#Bb#Cc#Dd#Ee", "Ee"),  # testLastPart
    ("#:2", "Aa#Bb#Cc#Dd#Ee", "Bb"),   # test2ndPart
    ("#:-2", "Aa#Bb#Cc#Dd#Ee", "Dd"),  # test2ndLastPart
    # '>'/'<' keep the trailing separator
    ("#>1", "Aa#Bb#Cc#Dd#Ee", "Bb#Cc#Dd#Ee#"),   # testRestAfter1
    ("#<-1", "Aa#Bb#Cc#Dd#Ee", "Aa#Bb#Cc#Dd#"),  # testBeforeLast
    ("#<5", "Aa#Bb#Cc#Dd#Ee", "Aa#Bb#Cc#Dd#"),   # testBeforeFifth
    # separator absent from the value
    ("#:1", "xyz", "xyz"),
    ("#:-1", "xyz", "xyz"),
    ("#:2", "xyz", None),
    # multi-char separator
    ("--->1", "abc---def---ghi", "def---ghi---"),  # testLong1stArg
]


@pytest.mark.parametrize("arg,value,want", PART_CASES)
def test_part_filter(arg, value, want):
    assert apply_filter("part", arg, value, {}) == want


@pytest.mark.parametrize("arg", ["#<-x", "#<-0", "#>-0"])
def test_part_filter_bad_args(arg):
    """Non-numeric or zero part specs are syntax errors."""
    with pytest.raises(Exception):
        apply_filter("part", arg, "abc", {})


def test_phone_subst_compiled_parity(spark):
    """The quantified-anchor phone template through the COMPILED
    engine (Spark regexp_replace runs Java regex natively)."""
    from mkgmap_spark.rules import compile_rules, parse_rules

    src = (
        "phone=* { set out='${phone|subst:^00~>+|subst:[-()]~>"
        "|subst:^0~>+353|subst:^+3530~>+353}' } phone=* [0x1]"
    )
    df = spark.createDataFrame(
        [{"id": 1, "tags": {"phone": "00(22)5554-444"}}],
        "id long, tags map<string,string>",
    )
    out = compile_rules(parse_rules(src), df).select("tags_out").collect()
    assert out[0]["tags_out"].get("out") == "+225554444"


@pytest.mark.parametrize("arg,value", [(a, v) for a, v, _ in PART_CASES])
def test_part_filter_compiled_parity(spark, arg, value):
    """Every PartFilter case agrees between the two engines."""
    from mkgmap_spark.rules import compile_rules, parse_rules

    # quote the arg so '>' / '<' / ':' survive rule tokenization
    src = f"v=* {{ set out='${{v|part:\"{arg}\"}}' }} v=* [0x1]"
    df = spark.createDataFrame(
        [{"id": 1, "tags": {"v": value}}], "id long, tags map<string,string>"
    )
    out = compile_rules(parse_rules(src), df).select("tags_out").collect()
    want = apply_filter("part", arg, value, {})
    assert out[0]["tags_out"].get("out") == want
