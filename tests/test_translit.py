"""Transliteration parity with the reference's TableTransliterator
(imgfmt/app/labelenc/TableTransliterator.java) over the complete
shipped tables — replaces round-2's best-effort accent map tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.functions.translit import (
    SQL_INLINE_LIMIT,
    merged_table,
    sql_translit_expr,
    transliterate,
    transliterate_inline,
)

# hand-checked entries straight out of the reference rows files
KNOWN_ASCII = {
    "æ": "ae",     # æ  row00
    "ß": "ss",     # ß  row00
    "Ё": "Io",     # Ё  row04
    "Ђ": "Dj",     # Ђ  row04
    "中": "Zhong",  # 中 row4e (CJK — full kernel only)
    "£": "PS",     # £  row00
}
KNOWN_LATIN1 = {
    "Ά": "Á",  # Ά -> Á (latin1 row03 overrides ascii 'A')
}


def test_full_kernel_matches_reference_merge_semantics():
    """Re-derive the lookup from the shipped TSVs with the reference's
    merge rules and compare the kernel char-by-char on every table
    entry (ascii: table or '?', latin1: latin1-first fallback)."""
    for charset, limit in (("ascii", 0x7F), ("latin1", 0xFF)):
        table = merged_table(charset)
        # spot the whole table through the public kernel
        sample = list(table.items())[::97]  # every 97th entry, ~700 checks
        for cp, want in sample:
            if cp <= limit:
                continue
            assert transliterate(chr(cp), charset) == want, hex(cp)
        # chars with no entry -> '?'
        assert transliterate("͸", charset) == "?"
        # pass-through below the charset limit
        assert transliterate("abc", charset) == "abc"


def test_known_entries():
    for ch, want in KNOWN_ASCII.items():
        assert transliterate(ch, "ascii") == want
    for ch, want in KNOWN_LATIN1.items():
        assert transliterate(ch, "latin1") == want
    # latin1 passes 0x80-0xff through
    assert transliterate("æß", "latin1") == "æß"


def test_inline_twin_full_table():
    """Since round 4 the inline limit sits beyond Unicode: the twin
    equals the full-table kernel everywhere (CJK pinyin included)."""
    assert SQL_INLINE_LIMIT > 0x10FFFF
    table = merged_table("ascii")
    for cp, want in list(table.items())[::211]:
        got = transliterate_inline(chr(cp), "ascii")
        if cp <= 0x7F:
            continue
        assert got == want, hex(cp)
    assert transliterate_inline("北京") == transliterate("北京") == "BeiJing"


def test_sql_expr_matches_python_twin(spark):
    """The constant-folded SQL form must agree with transliterate_inline
    on a broad sample of table entries plus mixed strings."""
    table = merged_table("ascii")
    samples = [chr(cp) for cp in list(table)[::151]]
    samples += [
        "Ёlka æther Straße",
        "中国",  # CJK -> ?? inline
        "plain ascii",
        "",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "v string")
    for charset in ("ascii", "latin1"):
        got = [r["t"] for r in df.select(F.expr(sql_translit_expr("v", charset)).alias("t")).collect()]
        want = [transliterate_inline(s, charset) for s in samples]
        assert got == want, charset


def test_style_filter_uses_full_tables(spark):
    """${name|ascii} through the compiled rule engine yields the real
    table translations (round 2's accent map had no Ё or æ)."""
    from mkgmap_spark.rules.compiler import compile_rules
    from mkgmap_spark.rules.parser import parse_rules

    df = spark.createDataFrame(
        [
            (1, {"highway": "primary", "name": "Ёлка"}),
            (2, {"highway": "primary", "name": "Æther"}),
        ],
        "id long, tags map<string,string>",
    )
    rules = parse_rules(
        "highway=* { set out='${name|ascii}' } [0x02 resolution 24]"
    )
    out = {r["id"]: r["tags_out"]["out"] for r in compile_rules(rules, df).collect()}
    assert out[1] == "Iolka"
    assert out[2] == "AEther"


def test_transliterate_labels_operator(spark):
    """Arrow-batched full-table operator keeps CJK pinyin fidelity."""
    from mkgmap_spark.operators.text import transliterate_labels

    df = spark.createDataFrame(
        [(1, "中国"), (2, "Straße"), (3, None)],
        "id long, name string",
    )
    got = {
        r["id"]: r["name"]
        for r in transliterate_labels(df, ["name"], "ascii").collect()
    }
    assert got[1] == "ZhongGuo"
    assert got[2] == "Strasse"
    assert got[3] is None
