"""Compile an ordered rule list into a Spark Column program.

The compiled form is a fold over rules carrying three state columns:
``tags`` (map, persistent tag state), ``results`` (array of emitted
type structs) and ``_done`` (first-match termination flag).  Each rule
contributes pure Column expressions — whole-stage-codegen'd, no Python
in the row path.  First-match / ``continue`` / ``continue
with_actions`` semantics follow RuleSet.resolveType exactly (see
rules/__init__ and the interpreter twin).

Catalyst notes (SURVEY §4): the reference's RuleIndex/ExpressionArranger
optimizations (first-term indexing, DNF, selectivity reordering) are
unnecessary here — the fold is data-parallel and Catalyst
constant-folds and prunes the per-rule expressions; per-element
memoization corresponds to common-subexpression elimination in
codegen, which Spark performs on the repeated tag lookups.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parser import Action, And, Cond, Not, Or, Rule

_SUBST_RE = re.compile(r"\$\{([^}]+)\}")

RESULT_TYPE = "array<struct<type_code: int, min_res: int, max_res: int, rule_idx: int>>"


def _tag(tags: Column, key: str) -> Column:
    return tags.getItem(key)


_EARTH_R = 6378137.0
_MU = 2.0 * 3.141592653589793 / (1 << 24)


def _fn_numeric(key: str) -> Column:
    """Style functions over the feature's packed geometry columns
    (LengthFunction.java:48-62 equirectangular sum; requires the input
    DataFrame to carry lats/lons arrays)."""
    if key == "fn:length":
        return F.when(
            F.size("lats") >= 2,
            F.expr(
                f"aggregate(sequence(1, size(lats) - 1), 0D, (acc, i) -> acc + "
                f"{_EARTH_R!r} * sqrt(pow((lats[i] - lats[i - 1]) * {_MU!r}, 2) + "
                f"pow((lons[i] - lons[i - 1]) * {_MU!r} * "
                f"cos((cast(lats[i - 1] as double) * {_MU!r} + cast(lats[i] as double) * {_MU!r}) / 2), 2)))"
            ),
        ).otherwise(F.lit(0.0))
    raise ValueError(f"unsupported numeric style function {key!r}")


def compile_pred(pred, tags: Column) -> Column:
    if isinstance(pred, Cond):
        if pred.key.startswith("fn:"):
            if pred.key == "fn:is_closed":
                closed = (F.size("lats") >= 3) & F.expr(
                    "lats[0] = lats[size(lats) - 1] and lons[0] = lons[size(lons) - 1]"
                )
                want = F.lit(pred.value) == F.lit("true")
                if pred.op == "=":
                    return closed == want
                if pred.op == "!=":
                    return closed != want
                raise ValueError("is_closed() supports = / != only")
            num = _fn_numeric(pred.key)
            lit = F.lit(float(pred.value))
            return {"<": num < lit, "<=": num <= lit, ">": num > lit, ">=": num >= lit}[pred.op]
        v = _tag(tags, pred.key)
        if pred.op == "exists":
            return v.isNotNull()
        if pred.op == "not_exists":
            return v.isNull()
        if pred.op == "=":
            return v.eqNullSafe(F.lit(pred.value))
        if pred.op == "!=":
            # true when the tag is missing (NotEqualOp semantics)
            return ~v.eqNullSafe(F.lit(pred.value))
        if pred.op == "~":
            return v.isNotNull() & v.rlike(f"^(?:{pred.value})$")
        num = v.try_cast("double")
        lit = F.lit(float(pred.value))
        cmp = {"<": num < lit, "<=": num <= lit, ">": num > lit, ">=": num >= lit}[pred.op]
        return num.isNotNull() & cmp
    if isinstance(pred, Not):
        return ~compile_pred(pred.child, tags)
    if isinstance(pred, And):
        return compile_pred(pred.left, tags) & compile_pred(pred.right, tags)
    if isinstance(pred, Or):
        return compile_pred(pred.left, tags) | compile_pred(pred.right, tags)
    raise TypeError(type(pred))


def _subst_col(value: str, tags: Column) -> Column:
    """${tag} substitution as a Column; NULL when a referenced tag is
    missing (ValueBuilder: failed substitution -> skip the action)."""
    parts: list[Column] = []
    pos = 0
    refs: list[Column] = []
    for m in _SUBST_RE.finditer(value):
        if m.start() > pos:
            parts.append(F.lit(value[pos : m.start()]))
        ref = _tag(tags, m.group(1))
        refs.append(ref)
        parts.append(ref)
        pos = m.end()
    if pos < len(value):
        parts.append(F.lit(value[pos:]))
    if not parts:
        parts = [F.lit("")]
    out = F.concat(*parts)  # concat is null if any part is null
    return out


def apply_actions_col(actions: list[Action], tags: Column) -> Column:
    cur = tags
    for a in actions:
        if a.kind == "delete":
            cur = F.map_filter(cur, lambda k, v: k != F.lit(a.key))
        elif a.kind in ("set", "add"):
            val = _subst_col(a.value, cur)
            updated = F.map_concat(cur, F.create_map(F.lit(a.key), val))
            if a.kind == "add":
                cur = F.when(_tag(cur, a.key).isNotNull() | val.isNull(), cur).otherwise(updated)
            else:
                cur = F.when(val.isNull(), cur).otherwise(updated)
        elif a.kind == "name":
            key = "mkgmap:label:1"
            val = _subst_col(a.value, cur)
            updated = F.map_concat(cur, F.create_map(F.lit(key), val))
            cur = F.when(_tag(cur, key).isNotNull() | val.isNull(), cur).otherwise(updated)
    return cur


def compile_rules(rules: list[Rule], df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Apply the ordered ruleset to every row of ``df``.

    Adds: ``results`` (emitted gtypes in order) and ``tags_out`` (final
    persistent tag state).  The fold materializes each rule's state via
    withColumn so Catalyst can pipeline them in one projection.
    """
    main = [r for r in rules if not getattr(r, "finalize", False)]
    fin = [r for r in rules if getattr(r, "finalize", False)]

    tags = F.col(tags_col)
    df = (
        df.withColumn("_tags_s", tags)
        .withColumn("results", F.expr(f"cast(array() as {RESULT_TYPE})"))
        .withColumn("_done", F.lit(False))
    )

    for idx, r in enumerate(main):
        tags = F.col("_tags_s")
        match = compile_pred(r.pred, tags) & ~F.col("_done")
        acted = apply_actions_col(r.actions, tags) if r.actions else tags

        if r.gtype is None:
            df = df.withColumn("_tags_s", F.when(match, acted).otherwise(tags))
            continue

        res_entry = F.struct(
            F.lit(r.gtype.type_code).cast("int").alias("type_code"),
            F.lit(r.gtype.min_res).cast("int").alias("min_res"),
            F.lit(r.gtype.max_res).cast("int").alias("max_res"),
            F.lit(idx).cast("int").alias("rule_idx"),
        )
        df = df.withColumn(
            "results", F.when(match, F.array_append(F.col("results"), res_entry)).otherwise(F.col("results"))
        )
        persists = (not r.cont) or r.with_actions
        if persists and (r.actions or not r.cont):
            df = df.withColumn("_tags_s", F.when(match, acted).otherwise(tags))
        if not r.cont:
            df = df.withColumn("_done", F.col("_done") | match)

    # finalize section: actions-only rules applied once to elements
    # that emitted at least one type (RuleFileReader.java:380-439)
    matched = F.size("results") > 0
    for r in fin:
        tags = F.col("_tags_s")
        m = matched & compile_pred(r.pred, tags)
        acted = apply_actions_col(r.actions, tags) if r.actions else tags
        df = df.withColumn("_tags_s", F.when(m, acted).otherwise(tags))

    return df.withColumnRenamed("_tags_s", "tags_out").drop("_done")
