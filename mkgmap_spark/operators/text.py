"""Text-analysis operators (training-data pipeline ops).

- language id: stopword-hit heuristic over small per-language lexicons
  (deterministic, JVM-side array intersection — no model downloads);
- quality score: length / punctuation / stopword / repetition ratios
  (the standard pre-training heuristics, all Column arithmetic);
- token counting: whitespace tokens + a BPE-ish subword estimate
  (chars/3.3 blended with word count — deterministic arithmetic);
- fingerprinting: 64-bit rolling-hash document fingerprint (xxhash64
  over normalized text) + shingle fingerprint array for overlap checks.

String ops mirror the reference's label pipeline where applicable:
squashed whitespace (Element.java:59-66 Label.squashSpaces), prefix/
suffix handling (PrefixSuffixFilter.java) is rule-engine territory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "del", "las", "por"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predict language by stopword hits; ties broken by language code
    order (deterministic).  Output: (doc_id, pred_lang, hits)."""
    toks = _tokens(text_col)
    hit_cols = [
        F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in ws]))).alias(
            f"_h_{lang}"
        )
        for lang, ws in STOPWORDS.items()
    ]
    d = docs.select(F.col(id_col).alias("doc_id"), *hit_cols)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"_h_{lg}") for lg in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"_h_{lg}") == best, F.lit(lg)) for lg in langs]
    )
    return d.select(
        "doc_id",
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
        best.alias("hits"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pre-training quality heuristics as exact integer/ratio columns."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    toks = _tokens(text_col)
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(toks))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    # ratios stay unrounded: both operands are exact integers, so the
    # IEEE quotient is bit-identical across engines (a round() here
    # would re-introduce HALF_UP-vs-HALF_EVEN oracle skew)
    mean_word_len = F.when(n_tokens > 0, (F.length(F.regexp_replace(t, r"\s+", "")) / n_tokens)).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_alpha.cast("long").alias("n_alpha"),
        n_digit.cast("long").alias("n_digit"),
        n_punct.cast("long").alias("n_punct"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        mean_word_len.alias("mean_word_len"),
        F.when(n_tokens > 0, n_distinct / n_tokens).otherwise(F.lit(0.0)).alias(
            "distinct_ratio"
        ),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + deterministic BPE-ish subword estimate:
    max(words, ceil(chars / 3.3)) — a standard budgeting proxy."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(_tokens(text_col)))
    est_subwords = F.greatest(
        n_tokens.cast("long"), F.ceil(F.length(t) / F.lit(3.3)).cast("long")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_words"),
        est_subwords.alias("est_subword_tokens"),
    )


def document_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash: str = "xxhash64",
) -> DataFrame:
    """Normalized 64-bit fingerprint + squashed-space normal form
    (Label.squashSpaces semantics: collapse runs of whitespace).

    ``hash='md5'`` switches to the deterministic 60-bit md5-prefix hash
    (same family the minhash/simhash oracles use) so plain SQL engines
    reproduce the fingerprint bit-for-bit; xxhash64 is the fast
    JVM-side default."""
    squashed = F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    if hash == "md5":
        # 60-bit md5 prefix (dedup.MD5_PREFIX_SQL_* family)
        fp = F.conv(F.substring(F.md5(F.lower(squashed)), 1, 15), 16, 10).cast("long")
    else:
        fp = F.xxhash64(F.lower(squashed))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("fingerprint"),
        F.length(squashed).cast("long").alias("norm_len"),
    )


# ---------------------------------------------------------------------
# PrefixSuffixFilter (osmstyle/PrefixSuffixFilter.java): split well
# known road-name prefixes/suffixes with the Garmin separator codes so
# search ignores them ("Rue de la X" -> "Rue de la"+0x1e+"X").
# ---------------------------------------------------------------------


def parse_road_name_config(text: str) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
    """Parse the --road-name-config format (readOptionFile:54-110 +
    genPrefix:183-196 + getSearchStrings:231-266): per-language
    prefix1 x (prefix2 + ' ') combinations and suffix lists, mapped to
    countries via lang:ISO lines; per-country lists are the union over
    its languages, longest first.  Returns (prefixes_by_country,
    suffixes_by_country)."""

    def strip_bq(s: str) -> str:
        s = s.strip()
        if len(s) >= 2 and s[0] in "'\"" and s[-1] == s[0]:
            return s[1:-1]
        return s

    p1: dict[str, list[str]] = {}
    p2: dict[str, list[str]] = {}
    suf: dict[str, list[str]] = {}
    langs_of: dict[str, list[str]] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=" not in line and ":" not in line:
            continue
        key, _, val = line.partition("=")
        if not val:
            key, _, val = line.partition(":")
            # 'prefix1:fr = ...' already handled by '='; here 'key:rest'
        key = key.strip()
        if ":" not in key:
            continue
        kind, lang = (x.strip() for x in key.split(":", 1))
        parts = [v for v in val.split(",")]
        if kind == "prefix1":
            p1[lang] = [strip_bq(v) for v in parts]
        elif kind == "prefix2":
            p2[lang] = [strip_bq(v) for v in parts]
        elif kind == "suffix":
            suf[lang] = sorted((strip_bq(v) for v in parts), key=len, reverse=True)
        elif kind == "lang":
            langs_of[lang] = [v.strip() for v in parts]
    lang_prefixes: dict[str, list[str]] = {}
    for lang, firsts in p1.items():
        out = []
        for a in firsts:
            for b in p2.get(lang, []):
                out.append(a + " " + b)
            out.append(a + " ")
        lang_prefixes[lang] = sorted(out, key=len, reverse=True)
    pref_by_country: dict[str, list[str]] = {}
    suf_by_country: dict[str, list[str]] = {}
    for iso, langs in langs_of.items():
        ps = sorted({p for lg in langs for p in lang_prefixes.get(lg, [])}, key=len, reverse=True)
        ss = sorted({s for lg in langs for s in suf.get(lg, [])}, key=len, reverse=True)
        if ps:
            pref_by_country[iso] = ps
        if ss:
            suf_by_country[iso] = ss
    return pref_by_country, suf_by_country


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def prefix_suffix_label(
    label: F.Column | str,
    country: F.Column | str,
    prefixes_by_country: dict[str, list[str]],
    suffixes_by_country: dict[str, list[str]],
) -> F.Column:
    """One label through the prefix/suffix marking (filter():208-258):
    first matching country prefix (case-insensitive, longest first,
    skipped when the label starts with a shield code < 0x07) is
    rewritten with 0x1e (blank-ending) / 0x1b, then the first matching
    suffix with 0x1f (blank-starting) / 0x1c.  Generated as one SQL
    CASE per country (string-built: the Column DSL would cost a py4j
    round trip per branch)."""
    lcol = label if isinstance(label, str) else None
    if lcol is None:
        raise ValueError("pass column NAMES (the expression is SQL-generated)")
    ccol = country

    def prefix_case(v: str) -> str:
        outer = []
        for iso, plist in prefixes_by_country.items():
            inner = []
            for p in plist:
                n = len(p)
                cond = f"lower(substring({v}, 1, {n})) = {_sql_quote(p.lower())}"
                if p.endswith(" "):
                    rep = f"concat({_sql_quote(p[:-1])}, '\\u001e', substring({v}, {n + 1}, 1073741824))"
                else:
                    rep = f"concat({_sql_quote(p)}, '\\u001b', substring({v}, {n + 1}, 1073741824))"
                inner.append(f"WHEN {cond} THEN {rep}")
            outer.append(f"WHEN {ccol} = {_sql_quote(iso)} THEN (CASE " + " ".join(inner) + f" ELSE {v} END)")
        return "(CASE " + " ".join(outer) + f" ELSE {v} END)" if outer else v

    def suffix_case(v: str) -> str:
        outer = []
        for iso, slist in suffixes_by_country.items():
            inner = []
            for s in slist:
                n = len(s)
                cond = f"lower(substring({v}, -{n}, {n})) = {_sql_quote(s.lower())}"
                keep = f"substring({v}, 1, length({v}) - {n})"
                if s.startswith(" "):
                    rep = f"concat({keep}, '\\u001f', {_sql_quote(s[1:])})"
                else:
                    rep = f"concat({keep}, '\\u001c', {_sql_quote(s)})"
                inner.append(f"WHEN length({v}) >= {n} AND {cond} THEN {rep}")
            outer.append(f"WHEN {ccol} = {_sql_quote(iso)} THEN (CASE " + " ".join(inner) + f" ELSE {v} END)")
        return "(CASE " + " ".join(outer) + f" ELSE {v} END)" if outer else v

    # shield-code guard: labels starting with a control char < 0x07
    # are never prefix-split
    pre = f"if({lcol} is null or length({lcol}) = 0 or ascii({lcol}) < 7, {lcol}, {prefix_case(lcol)})"
    # let-binding via a one-element transform: the suffix CASE
    # references its input once per branch — binding the (large)
    # prefix-pass expression to a lambda variable keeps the total size
    # additive instead of multiplicative
    return F.expr(f"transform(array({pre}), psv -> {suffix_case('psv')})[0]")


def prefix_suffix_filter(
    roads: DataFrame,
    config_text: str,
    label_cols: tuple[str, ...] = ("mkgmap:label:1",),
    tags_col: str = "tags",
    country_key: str = "mkgmap:country",
) -> DataFrame:
    """Apply the road-name prefix/suffix marking to the given label
    tags of every road, using the tag map's country code (the style
    sets mkgmap:country to the 3-letter ISO, per the config header)."""
    prefs, sufs = parse_road_name_config(config_text)
    df = roads.withColumn("_psf_country", F.col(tags_col).getItem(country_key))
    for lc in label_cols:
        df = df.withColumn("_psf_label", F.col(tags_col).getItem(lc))
        new = prefix_suffix_label("_psf_label", "_psf_country", prefs, sufs)
        df = df.withColumn(
            tags_col,
            F.when(
                new.isNotNull(),
                F.map_concat(F.col(tags_col), F.create_map(F.lit(lc), new)),
            ).otherwise(F.col(tags_col)),
        )
    return df.drop("_psf_country", "_psf_label")


def transliterate_labels(
    df: DataFrame, cols: list[str], charset: str = "ascii"
) -> DataFrame:
    """Full-table label transliteration (TableTransliterator semantics
    including the CJK pinyin rows) as one Arrow-batched pass.

    The style filter's inline SQL form (functions/translit.py) trades
    CJK fidelity for plan size; this operator is the label/MDR-path
    complement with complete parity — the table ships to executors in
    the UDF closure once (~1 MB), never per row."""
    from ..functions.translit import merged_table

    table = merged_table(charset)
    limit = 0xFF if charset == "latin1" else 0x7F

    def _tx(s):
        if s is None:
            return None
        return "".join(
            ch if ord(ch) <= limit else table.get(ord(ch), "?") for ch in s
        )

    @F.pandas_udf("string")
    def kernel(s: pd.Series) -> pd.Series:
        return s.map(_tx, na_action="ignore")

    for c in cols:
        df = df.withColumn(c, kernel(F.col(c)))
    return df


def name_from_tag_list(
    df: DataFrame, spec: str = "name", tags_col: str = "tags"
) -> DataFrame:
    """--name-tag-list (osmstyle/NameFinder.java): the first non-null
    tag in the comma/space-separated list becomes the ``name`` tag
    (setNameWithNameTagList:100-115 — default plain 'name' is a
    no-op).  One map_concat Column, no shuffle."""
    import re as _re

    keys = [k for k in _re.split(r"[,\s]+", spec.strip()) if k]
    # empty and default specs are both no-ops (NameFinder returns null
    # work for them; an empty coalesce() would be an analysis error)
    if not keys or keys == ["name"]:
        return df
    t = F.col(tags_col)
    picked = F.coalesce(*[t.getItem(k) for k in keys])
    new_tags = F.when(
        picked.isNotNull(),
        F.map_concat(
            F.expr(f"map_filter({tags_col}, (k, v) -> k != 'name')"),
            F.create_map(F.lit("name"), picked),
        ),
    ).otherwise(t)
    return df.withColumn(tags_col, new_tags)
