"""Compile an ordered rule list into ONE Spark expression.

Round-1 compiled each rule as its own ``withColumn`` referencing the
previous rule's mutated-tags expression; Catalyst's CollapseProject
re-inlined the entire history into every downstream predicate, so
expression size grew multiplicatively per action-bearing rule (a
6-rule set already produced a multi-page plan).  This version folds
the whole ruleset into a single ``aggregate`` over
``sequence(1, n_steps)`` with a struct accumulator

    (tags, results, done, fin, pushed)

where each step references the accumulator through a LAMBDA VARIABLE —
Catalyst cannot inline across a lambda boundary, so total expression
size is LINEAR in the ruleset (the reference's default style with all
its includes compiles and analyzes in seconds).  Step dispatch on the
sequence index is a balanced IF-tree: O(log n) integer compares per
step at run time instead of O(n).  The whole program is generated as
ONE SQL string and parsed once — building it op-by-op through the
Column DSL costs a py4j round-trip per node (measured ~30s for the
default style); string generation + one parse is ~100x cheaper.

Semantics preserved (RuleSet.resolveType:79-107 +
ActionRule.resolveType:80-110): declaration order, first terminating
TYPE-DEF wins, ``continue`` emits and keeps scanning, actions persist
unless continue-without-propagate (relations always persist —
elements are never copied for relations), per-emission finalize with
the terminating emission persisting its finalize pass, the
``mkgmap:execute_finalize_rules`` fallback, and ``default_name``
injection gated on a finalize section existing.

Tag-map updates rely on ``spark.sql.mapKeyDedupPolicy=LAST_WIN``
(set by mkgmap_spark.session.get_spark; asserted here), which makes
``set`` a single ``map_concat`` — mkgmap's Tags.put is last-wins too.

``apply``/``apply_once`` on relations append (sub_idx, tag-snapshot)
entries to the ``pushed`` accumulator field; the member-side executor
(operators/relations.apply_pushed_to_members) replays them against
member elements with the interpreter's Python action executor — exact
parity with the differential oracle by construction.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import interpreter as I
from .parser import (
    ACCESS_TAG_KEYS,
    Action,
    And,
    Cond,
    Not,
    Or,
    Rule,
    Template,
    TruePred,
)

RESULT_TYPE = (
    "array<struct<type_code: int, min_res: int, max_res: int, rule_idx: int, "
    "road_class: int, road_speed: int, default_name: string>>"
)
PUSHED_TYPE = "array<struct<sub_idx: int, ctx: map<string,string>>>"

_EXEC_TAG = "mkgmap:execute_finalize_rules"


# ------------------------------------------------------------ SQL helpers
def q(s: str) -> str:
    """SQL string literal (backslash escaping is ON by default)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


_LAMBDA_N = [0]


def _fresh(prefix: str) -> str:
    _LAMBDA_N[0] += 1
    return f"{prefix}{_LAMBDA_N[0]}"


def _tag(tags: str, key: str) -> str:
    return f"element_at({tags}, {q(key)})"


def _map_set(cur: str, key: str, val: str) -> str:
    # LAST_WIN dedup makes this an overwrite
    return f"map_concat({cur}, map({q(key)}, {val}))"


def _map_del(cur: str, key: str) -> str:
    k, v = _fresh("dk"), _fresh("dv")
    return f"map_filter({cur}, ({k}, {v}) -> {k} != {q(key)})"


def _iff(c: str, a: str, b: str) -> str:
    return f"if({c}, {a}, {b})"


def _trim(c: str) -> str:
    # Java String.trim (chars <= 0x20); mirrored in the interpreter
    return f"regexp_replace({c}, '^[ \\\\t\\\\r\\\\n]+|[ \\\\t\\\\r\\\\n]+$', '')"


# ---------------------------------------------------------------- filters
def _compile_filter(cmd: str, arg: str, v: str, lt: str) -> str:
    """One ValueFilter as a SQL expression.  ``lt`` is the local
    element's tags (filters that read tags use local_el —
    ValueItem.getValue)."""
    if cmd == "def":
        return f"if({v} is null or {v} = '', {q(arg)}, {v})"
    if cmd in ("conv", "height"):
        spec = arg if cmd == "conv" else (arg if arg else "m=>ft")
        valid, default_factor, utype, dst = I.conv_spec(spec)
        if not valid:
            out = v
        else:
            tbl = I.UNIT_TABLES[utype]
            unit_re = q(r"^\s*([\d.]+)\s*([\w/]*)\s*$")
            ends_digit = f"substring({v}, -1, 1) rlike '^[0-9]$'"
            full = f"{v} rlike {unit_re}"
            m_num = f"regexp_extract({v}, {unit_re}, 1)"
            m_unit = f"regexp_extract({v}, {unit_re}, 2)"
            cases = " ".join(
                f"WHEN {m_unit} = {q(u)} THEN cast({f_in / tbl[dst]!r} as double)"
                for u, f_in in tbl.items()
            )
            factor = (
                f"(CASE WHEN ({ends_digit}) or {m_unit} = '' THEN cast({default_factor!r} as double) "
                f"{cases} ELSE cast(null as double) END)"
            )
            number = _iff(ends_digit, v, f"nullif({m_num}, '')")
            d = f"try_cast({number} as double)"
            converted = f"cast(cast(floor({d} * {factor} + 0.5d) as bigint) as string)"
            out = (
                f"(CASE WHEN {v} is null THEN {v} "
                f"WHEN not ({ends_digit}) and not ({full}) THEN {v} "
                f"WHEN {factor} is null or {d} is null THEN {v} "
                f"ELSE {converted} END)"
            )
        if cmd == "height":
            out = f"if({out} is null, null, concat('\\u001f', {out}))"
        return out
    if cmd == "subst":
        i = arg.find("=>")
        is_re = False
        if i == -1:
            i = arg.find("~>")
            if i >= 0:
                is_re = True
        frm, to = (arg[:i], arg[i + 2 :]) if i >= 0 else (arg, "")
        if is_re:
            return f"if({v} is null, null, regexp_replace({v}, {q(frm)}, {q(to)}))"
        return f"if({v} is null, null, replace({v}, {q(frm)}, {q(to)}))"
    if cmd == "prefix":
        p = I.PREPEND_SYMBOLS.get(arg)
        if p is None:
            try:
                p = chr(int(arg, 16))
            except ValueError:
                p = arg
        return f"if({v} is null, null, concat({q(p)}, {v}))"
    if cmd == "highway-symbol":
        parts = arg.split(":")
        prefix = I.HWY_SYMBOLS.get(parts[0], "[" + parts[0] + "]")
        max_an = int(parts[1]) if len(parts) >= 2 else 8
        max_a = int(parts[2]) if len(parts) >= 3 else max_an if len(parts) == 2 else 8
        shield = f"replace(replace({v}, ' ', ''), ';', '/')"
        is_an = f"({shield} rlike '[0-9]')"
        keep = (
            f"(({is_an} and length({shield}) > {max_an}) or "
            f"(not {is_an} and length({shield}) > {max_a}))"
        )
        return f"(CASE WHEN {v} is null THEN {v} WHEN {keep} THEN {v} ELSE concat({q(prefix)}, {shield}) END)"
    if cmd == "not-equal":
        tv = _tag(lt, arg)
        return f"if({tv} is not null and {v} = {tv}, cast(null as string), {v})"
    if cmd == "substring":
        parts = arg.split(":")
        if not arg or len(parts) > 2:
            raise ValueError(f"substring filter needs 1 or 2 args, got {arg!r}")
        start = int(parts[0])
        end = int(parts[1]) if len(parts) == 2 else None
        if end is not None and start > end:
            raise ValueError(f"substring filter start > end: {arg!r}")
        rest = f"substring({v}, {start + 1}, {1 << 30})"
        if end is None:
            picked = rest
        else:
            picked = _iff(f"{end} > length({v})", rest, f"substring({v}, {start + 1}, {end - start})")
        return f"if({v} is null or {start} > length({v}), cast(null as string), {picked})"
    if cmd == "part":
        if ":" in arg:
            tmp, op = arg.split(":"), None
        elif ">" in arg:
            tmp, op = arg.split(">"), ">"
        elif "<" in arg:
            tmp, op = arg.split("<"), "<"
        else:
            tmp, op = [arg], None
        pn = int(tmp[1]) if len(tmp) > 1 else 1
        sep = tmp[0] if tmp[0] else ";"
        if pn == 0:
            raise ValueError(f"invalid part spec {arg!r}")
        pieces = f"split({v}, {q(_re.escape(sep))}, -1)"
        n = f"size({pieces})"
        idx = str(pn - 1) if pn > 0 else f"({n} + {pn})"  # 0-based
        if op is None:
            picked = _trim(f"element_at({pieces}, {idx} + 1)")
        elif op == "<":
            head = f"slice({pieces}, 1, {idx})"
            picked = _iff(
                f"{idx} > 0", f"concat(array_join({head}, {q(sep)}), {q(sep)})", "''"
            )
        else:  # '>'
            tail = f"slice({pieces}, {idx} + 2, greatest({n} - {idx} - 1, 0))"
            picked = _iff(
                f"{n} - {idx} - 1 > 0",
                f"concat(array_join({tail}, {q(sep)}), {q(sep)})",
                "''",
            )
        return f"if({v} is null or {n} < {abs(pn)}, cast(null as string), {picked})"
    if cmd in ("ascii", "latin1"):
        # COMPLETE reference tables incl. CJK pinyin (TableTransliterator
        # rows data, constant-folded str_to_map) —
        # divergence documented in functions/translit.py
        from ..functions.translit import sql_translit_expr

        return sql_translit_expr(v, cmd)
    if cmd == "country-ISO":
        key = f"upper({_trim(v)})"
        entries = ", ".join(f"{q(k)}, {q(val)}" for k, val in I.COUNTRY_ISO.items())
        return f"if({v} is null, null, coalesce(element_at(map({entries}), {key}), {v}))"
    if cmd == "not-contained":
        parts = arg.split(":", 1)
        if len(parts) < 2 or not parts[1]:
            raise ValueError(f"not-contained needs sep:tag, got {arg!r}")
        sep = parts[0] if parts[0] else ";"
        tv = _tag(lt, parts[1])
        return (
            f"(CASE WHEN {v} is null or {tv} is null THEN {v} "
            f"WHEN array_contains(split({tv}, {q(_re.escape(sep))}, -1), {v}) THEN cast(null as string) "
            f"ELSE {v} END)"
        )
    raise ValueError(f"unknown filter {cmd!r}")


# -------------------------------------------------------------- templates
def _compile_template(t: Template, el_tags: str, local_tags: str) -> str:
    """ValueBuilder.build: NULL if any tag item resolves to NULL after
    its filter chain (concat null-propagates)."""
    parts: list[str] = []
    for item in t.items:
        if item.tag is None:
            parts.append(q(item.text or ""))
            continue
        v = _tag(local_tags if item.local else el_tags, item.tag)
        for cmd, arg in item.filters:
            v = _compile_filter(cmd, arg, v, local_tags)
        parts.append(v)
    if len(parts) == 1:
        return parts[0]
    return f"concat({', '.join(parts)})"


def _compile_alternatives(templates: list[Template], el_tags: str, local_tags: str) -> str:
    cols = [_compile_template(t, el_tags, local_tags) for t in templates]
    if len(cols) == 1:
        return cols[0]
    return f"coalesce({', '.join(cols)})"


# ---------------------------------------------------------------- actions
def _compile_one_action(a: Action, cur: str) -> str | None:
    """ONE action over the tag map expression ``cur`` -> new map
    expression, or None for no tag change (echo/apply).

    Size discipline: ``cur`` is always the LAMBDA VARIABLE field
    ``a.tags`` (each action is its own fold step), so the bounded
    number of times an action references it costs nothing.  Chaining
    actions textually instead (each embedding the previous expression
    3-12 times) made expression size EXPONENTIAL in the action list —
    the default points style (addlabel chains) never finished
    compiling."""
    if a.kind == "delete":
        return _map_del(cur, a.key)
    if a.kind == "deletealltags":
        k, v = _fresh("zk"), _fresh("zv")
        return f"map_filter({cur}, ({k}, {v}) -> false)"
    if a.kind == "rename":
        fv = _tag(cur, a.key)
        return _iff(f"{fv} is null", cur, _map_del(_map_set(cur, a.to, fv), a.key))
    if a.kind in ("echo", "echotags", "apply"):
        return None
    if a.kind in ("set", "add"):
        val = _compile_alternatives(a.values, cur, cur)
        if a.kind == "add":
            return _iff(
                f"{_tag(cur, a.key)} is not null or ({val}) is null",
                cur,
                _map_set(cur, a.key, f"({val})"),
            )
        return _iff(f"({val}) is null", cur, _map_set(cur, a.key, f"({val})"))
    if a.kind in ("setaccess", "addaccess"):
        val = f"({_compile_alternatives(a.values, cur, cur)})"
        delta = "map(" + ", ".join(f"{q(k)}, {val}" for k in ACCESS_TAG_KEYS) + ")"
        if a.kind == "setaccess":
            updated = f"map_concat({cur}, {delta})"  # LAST_WIN: delta wins
        else:
            # addaccess: existing keys win -> put the delta FIRST
            updated = f"map_concat({delta}, {cur})"
        return _iff(f"{val} is null", cur, updated)
    if a.kind == "name":
        val = f"({_compile_alternatives(a.values, cur, cur)})"
        return _iff(
            f"{_tag(cur, 'mkgmap:label:1')} is null and {val} is not null",
            _map_set(cur, "mkgmap:label:1", val),
            cur,
        )
    if a.kind == "addlabel":
        val = f"({_compile_alternatives(a.values, cur, cur)})"
        labels = [f"mkgmap:label:{i}" for i in range(1, 5)]
        branches = [f"WHEN {val} is null THEN {cur}"]
        for i, lbl in enumerate(labels):
            dup = " or ".join(f"{val} <=> {_tag(cur, prev)}" for prev in labels[:i]) or "false"
            branches.append(
                f"WHEN {_tag(cur, lbl)} is null THEN "
                + _iff(f"({dup})", cur, _map_set(cur, lbl, val))
            )
        return "(CASE " + " ".join(branches) + f" ELSE {cur} END)"
    raise ValueError(f"unknown action kind {a.kind!r}")


# ------------------------------------------------------------- predicates
_NUMERIC_FN_COLS = {"fn:length": "_fn_length", "fn:area_size": "_fn_area_size"}
_STRING_FN_COLS = {
    "fn:is_closed": "_fn_is_closed",
    "fn:is_complete": "_fn_is_complete",
    "fn:type": "_fn_type",
    "fn:osmid": "_fn_osmid",
}


def _extract_number(v: str) -> str:
    """ValueWithUnit: first numeric substring as double (NULL = invalid)."""
    return f"try_cast(nullif(regexp_extract({v}, '(-?[0-9.]+)', 1), '') as double)"


def _maxspeed_sql(tags: str, target: str) -> str:
    """MaxSpeedFunction over the CURRENT tag state (the reference's
    per-element cache invalidates on actions, so the value tracks tag
    mutations)."""
    tv = _tag(tags, "maxspeed")
    s = _trim(f"lower({tv})")
    is_mph = f"({s} rlike '^.*mph$')"
    num = _iff(
        is_mph,
        f"regexp_replace({s}, '[ \\\\t]*mph', '')",
        f"regexp_replace({s}, '[ \\\\t]*km/?h', '')",
    )
    speed = f"if({num} rlike '^-?[0-9]+$', try_cast({num} as int), cast(null as int))"
    if target == "kmh":
        v = _iff(is_mph, f"{speed} * 1.61d", f"cast({speed} as double)")
    else:
        v = _iff(is_mph, f"cast({speed} as double)", f"{speed} / 1.61d")
    formatted = f"cast(floor(({v}) * 100 + 0.5d) / 100.0d as string)"
    return f"if({tv} is null or {speed} is null, cast(null as string), {formatted})"


def compile_pred(pred, tags: str) -> str:
    """Predicate AST -> boolean SQL over the current tag map.
    Geometry/meta functions read hidden precomputed columns (outer
    references are legal inside HOF lambdas)."""
    if isinstance(pred, TruePred):
        return "true"
    if isinstance(pred, Cond):
        numeric_fn = pred.key in _NUMERIC_FN_COLS
        if numeric_fn:
            v = _NUMERIC_FN_COLS[pred.key]
        elif pred.key in _STRING_FN_COLS:
            v = _STRING_FN_COLS[pred.key]
        elif pred.key == "fn:maxspeedkmh":
            v = _maxspeed_sql(tags, "kmh")
        elif pred.key == "fn:maxspeedmph":
            v = _maxspeed_sql(tags, "mph")
        elif pred.key.startswith("fn:"):
            raise ValueError(f"unsupported style function {pred.key!r}")
        else:
            v = _tag(tags, pred.key)
        if pred.op == "exists":
            return f"({v} is not null)"
        if pred.op == "not_exists":
            return f"({v} is null)"
        # RHS: another tag's value for $refs, else the literal
        rhs_expr = _tag(tags, pred.value_tag) if pred.value_tag is not None else None
        if pred.op in ("=", "!="):
            if numeric_fn:
                # divergence note: the reference compares the formatted
                # string; numeric equality is strictly more useful and
                # the formatted form is never produced by styles
                num = I.extract_number(pred.value) if pred.value_tag is None else None
                if pred.value_tag is not None:
                    eq = f"({v} <=> {_extract_number(rhs_expr)})"
                else:
                    eq = "false" if num is None else f"({v} <=> {num!r}d)"
            elif rhs_expr is not None:
                # EqualsOp: LHS null -> false even against a null RHS
                eq = f"({v} is not null and {v} <=> {rhs_expr})"
            else:
                eq = f"({v} <=> {q(pred.value)})"
            return eq if pred.op == "=" else f"(not {eq})"
        if pred.op == "~":
            return f"({v} is not null and {v} rlike {q('^(?:' + pred.value + ')$')})"
        if pred.op == "!~":
            # NotRegexOp: true when the tag is missing
            return f"(not ({v} is not null and {v} rlike {q('^(?:' + pred.value + ')$')}))"
        # numeric compare through ValueWithUnit on BOTH sides
        num = v if numeric_fn else _extract_number(v)
        op = pred.op
        if rhs_expr is not None:
            rhs_num = _extract_number(rhs_expr)
            return f"({num} is not null and {rhs_num} is not null and {num} {op} {rhs_num})"
        rhs = I.extract_number(pred.value)
        if rhs is None:
            return "false"
        return f"({num} is not null and {num} {op} {rhs!r}d)"
    if isinstance(pred, Not):
        return f"(not {compile_pred(pred.child, tags)})"
    if isinstance(pred, (And, Or)):
        # ExpressionArranger-style rewrite (osmstyle/ExpressionArranger
        # .java): collapse same-key =/!= chains into one IN — one map
        # lookup + set probe instead of N linear map scans.  Pure
        # predicates, so reordering within the chain is sound.
        is_or = isinstance(pred, Or)
        flat: list = []

        def flatten(p):
            if isinstance(p, type(pred)):
                flatten(p.left)
                flatten(p.right)
            else:
                flat.append(p)

        flatten(pred)
        groups: dict[str, list[str]] = {}
        rest: list = []
        op_wanted = "=" if is_or else "!="
        for p in flat:
            if (
                isinstance(p, Cond)
                and p.op == op_wanted
                and p.value_tag is None
                and not p.key.startswith("fn:")
            ):
                groups.setdefault(p.key, []).append(p.value)
            else:
                rest.append(p)
        parts: list[str] = []
        for key, vals in groups.items():
            v = _tag(tags, key)
            if len(vals) == 1:
                eq = f"({v} <=> {q(vals[0])})"
                parts.append(eq if is_or else f"(not {eq})")
            else:
                inset = f"({v} in ({', '.join(q(x) for x in vals)}))"
                if is_or:
                    # null membership -> null, caller coalesces to false
                    parts.append(f"coalesce({inset}, false)")
                else:
                    # conjunction of !=: true when the tag is missing
                    parts.append(f"coalesce(not {inset}, true)")
        parts.extend(compile_pred(p, tags) for p in rest)
        joiner = " or " if is_or else " and "
        return "(" + joiner.join(parts) + ")"
    raise TypeError(type(pred))


# ------------------------------------------------------- fn value columns
def _used_fn_keys(rules: list[Rule]) -> set[str]:
    used: set[str] = set()

    def walk(p):
        if isinstance(p, Cond):
            if p.key.startswith("fn:"):
                used.add(p.key)
        elif isinstance(p, Not):
            walk(p.child)
        elif isinstance(p, (And, Or)):
            walk(p.left)
            walk(p.right)

    for r in rules:
        walk(r.pred)
    return used


_EARTH_R = 6378137.0
_MU = 2.0 * 3.141592653589793 / (1 << 24)


def _add_fn_columns(
    df: DataFrame, used: set[str], id_col: str | None, kind_col: str | None
) -> DataFrame:
    closed_sql = (
        "size(lats) >= 3 and lats[0] = lats[size(lats) - 1] and lons[0] = lons[size(lons) - 1]"
    )
    if "fn:length" in used:
        df = df.withColumn(
            "_fn_length",
            F.expr(
                f"if(size(lats) >= 2, "
                f"aggregate(sequence(1, size(lats) - 1), 0D, (acc, i) -> acc + "
                f"{_EARTH_R!r} * sqrt(pow((lats[i] - lats[i - 1]) * {_MU!r}, 2) + "
                f"pow((lons[i] - lons[i - 1]) * {_MU!r} * "
                f"cos((cast(lats[i - 1] as double) * {_MU!r} + cast(lats[i] as double) * {_MU!r}) / 2), 2))), 0D)"
            ),
        )
    if "fn:area_size" in used:
        # AreaSizeFunction: 0 unless closed; |shoelace|/2 in map units^2
        df = df.withColumn(
            "_fn_area_size",
            F.expr(
                f"if({closed_sql}, "
                "cast(abs(aggregate(sequence(0, size(lats) - 2), 0L, (acc, i) -> "
                "acc + cast(lons[i] as bigint) * lats[i + 1] - cast(lons[i + 1] as bigint) * lats[i])) as double) / 2.0d, "
                "0.0d)"
            ),
        )
    if "fn:is_closed" in used:
        df = df.withColumn("_fn_is_closed", F.expr(f"if({closed_sql}, 'true', 'false')"))
    if "fn:is_complete" in used:
        # IsCompleteFunction: false for ways whose node refs fell
        # outside the input extract (OsmHandler.java:165 sets it from
        # the resolver's missing-ref flag).  The resolver emits a
        # `complete` column; inputs without one (whole-planet batch,
        # synthetic tables) are complete by construction.
        if "complete" in df.columns:
            # only an explicit false means clipped — null (rows the
            # resolver never stamped, e.g. nodes/relations unioned in)
            # stays complete, matching the interpreter twin exactly
            df = df.withColumn(
                "_fn_is_complete",
                F.when(
                    F.col("complete").cast("boolean").eqNullSafe(F.lit(False)),
                    F.lit("false"),
                ).otherwise(F.lit("true")),
            )
        else:
            df = df.withColumn("_fn_is_complete", F.lit("true"))
    if "fn:type" in used:
        if kind_col is None:
            raise ValueError("type() used but no kind_col given")
        df = df.withColumn("_fn_type", F.col(kind_col).cast("string"))
    if "fn:osmid" in used:
        if id_col is None:
            raise ValueError("osmid() used but no id_col given")
        df = df.withColumn("_fn_osmid", F.col(id_col).cast("string"))
    return df


# -------------------------------------------------------------------- fold
def _collect_sub_actions(rules: list[Rule]) -> tuple[list[Action], dict[int, int]]:
    """All apply actions (incl. nested ones inside sub lists) in
    declaration order; keyed by id() for the compiler, positional index
    for the member-side executor (nested applies are re-indexed by the
    executor when a member relation pushes further)."""
    subs: list[Action] = []
    index: dict[int, int] = {}

    def walk_actions(actions):
        for a in actions:
            if a.kind == "apply":
                index[id(a)] = len(subs)
                subs.append(a)
                walk_actions(a.sub)

    for r in rules:
        walk_actions(r.actions)
    return subs, index


def compiled_sub_actions(rules: list[Rule]) -> list[Action]:
    """The positional sub-action table matching the ``pushed.sub_idx``
    values emitted by compile_rules (for the member-side executor)."""
    subs, _ = _collect_sub_actions(rules)
    return subs


def _dispatch(steps: list[str], lo: int, hi: int) -> str:
    """Balanced IF-tree over the 1-based step index ``i``: O(log n)
    compares per fold step, expression size linear in n."""
    if lo == hi:
        return steps[lo]
    mid = (lo + hi) // 2
    return f"if(i <= {mid + 1}, {_dispatch(steps, lo, mid)}, {_dispatch(steps, mid + 1, hi)})"


def _acc_struct(tags: str, results: str, done: str, fin: str, pushed: str, m: str) -> str:
    return (
        f"named_struct('tags', {tags}, 'results', {results}, 'done', {done}, "
        f"'fin', {fin}, 'pushed', {pushed}, 'm', {m})"
    )


def compile_rules(
    rules: list[Rule],
    df: DataFrame,
    tags_col: str = "tags",
    id_col: str | None = None,
    kind_col: str | None = None,
    is_relation: bool = False,
    with_pushed: bool = False,
) -> DataFrame:
    """Apply the ordered ruleset to every row of ``df``.

    Adds ``results`` (emitted gtypes in order, with routing attrs) and
    ``tags_out`` (final persistent tag state); with ``with_pushed``
    also ``pushed`` (apply-action snapshots for the member executor).

    SESSION-WIDE SIDE EFFECT: sets ``spark.sql.mapKeyDedupPolicy`` to
    ``LAST_WIN`` on the calling session and does NOT restore it —
    the compiled plan relies on last-writer-wins ``map_concat`` at
    EXECUTION time (whenever the returned DataFrame is acted on), so a
    scoped save/restore around this call would break the plan.  Any
    unrelated code in the same session that relied on the default
    EXCEPTION policy to trap duplicate map keys will silently switch
    to last-writer-wins after the first compile.
    """
    spark = df.sparkSession
    # map_concat-based tag updates rely on last-writer-wins key dedup.
    # This is a runtime-settable SQL conf, so set it here rather than
    # demanding the caller's session factory did (a vanilla
    # SparkSession defaults to EXCEPTION and would fail at execution).
    policy = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    if policy != "LAST_WIN":
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

    main = [r for r in rules if not r.finalize]
    fin = [r for r in rules if r.finalize]
    _, sub_index = _collect_sub_actions(rules)

    df = _add_fn_columns(df, _used_fn_keys(rules), id_col, kind_col)

    steps: list[str] = []

    _KEEP_M_FALSE = _acc_struct("a.tags", "a.results", "a.done", "a.fin", "a.pushed", "false")

    def action_steps(r: Rule):
        """One fold step PER ACTION, each gated on the accumulator's
        rule-matched flag ``a.m`` and referencing only the lambda
        variable — expression size stays linear in the total action
        count (textually chaining the list embedded each previous
        expression 3-12 times: exponential; the default points style's
        addlabel chains never finished compiling that way)."""
        emitted = 0
        for a in r.actions:
            if a.kind == "apply":
                if is_relation:
                    p = f"named_struct('sub_idx', cast({sub_index[id(a)]} as int), 'ctx', a.tags)"
                    changed = _acc_struct(
                        "a.tags", "a.results", "a.done", "a.fin",
                        f"array_append(a.pushed, {p})", "a.m",
                    )
                    steps.append(_iff("a.m", changed, "a"))
                    emitted += 1
                continue
            new_tags = _compile_one_action(a, "a.tags")
            if new_tags is None:
                continue
            changed = _acc_struct(new_tags, "a.results", "a.done", "a.fin", "a.pushed", "a.m")
            steps.append(_iff("a.m", changed, "a"))
            emitted += 1
        return emitted

    def make_match_step(r: Rule, idx: int, has_consumers: bool) -> str:
        # a non-matching rule costs one short-circuited predicate and
        # (usually) no struct allocation; `not a.done` is tested FIRST
        # so every step after the terminating rule is ~2 node evals.
        match = f"(not a.done and coalesce({compile_pred(r.pred, 'a.tags')}, false))"
        gt = r.gtype
        new_results = "a.results"
        new_done = "a.done"
        if gt is not None:
            dn = q(gt.default_name) if gt.default_name is not None else "cast(null as string)"
            entry = (
                f"named_struct('type_code', cast({gt.type_code} as int), "
                f"'min_res', cast({gt.min_res} as int), 'max_res', cast({gt.max_res} as int), "
                f"'rule_idx', cast({idx} as int), 'road_class', cast({gt.road_class} as int), "
                f"'road_speed', cast({gt.road_speed} as int), 'default_name', {dn})"
            )
            new_results = f"array_append(a.results, {entry})"
            if not r.cont:
                new_done = "true"
        changed = _acc_struct("a.tags", new_results, new_done, "a.fin", "a.pushed", "true")
        if not has_consumers:
            # no trailing m-gated steps read m before the next match
            # step overwrites it — stale m is harmless, skip the reset
            return _iff(match, changed, "a")
        # lazy reset: allocate the m=false struct only when a stale
        # true flag must be cleared
        return _iff(match, changed, _iff("a.m", _KEEP_M_FALSE, "a"))

    for r_idx, r in enumerate(main):
        gt = r.gtype
        persists = is_relation or gt is None or (not r.cont) or r.with_actions
        dn_step = gt is not None and gt.default_name is not None and not r.cont and bool(fin) and persists
        runs_actions = persists and bool(r.actions)
        steps.append(make_match_step(r, r_idx, runs_actions or dn_step))
        if runs_actions:
            action_steps(r)
        # default_name persists on the terminating emission, gated on a
        # finalize section existing (ActionRule: the addTag sits inside
        # the finalizeRule != null block)
        if dn_step:
            changed = _acc_struct(
                _map_set("a.tags", "mkgmap:default_name", q(gt.default_name)),
                "a.results", "a.done", "a.fin", "a.pushed", "a.m",
            )
            steps.append(_iff("a.m", changed, "a"))

    if fin:
        # marker step: freeze the finalize decision — a terminating
        # emission always finalizes; otherwise the execute-tag fallback
        # (RuleSet.resolveType:100-105)
        should = (
            f"(a.done or coalesce({_tag('a.tags', _EXEC_TAG)} = 'true', false))"
        )
        steps.append(_acc_struct("a.tags", "a.results", "a.done", should, "a.pushed", "a.m"))

        for r in fin:
            m = f"(a.fin and coalesce({compile_pred(r.pred, 'a.tags')}, false))"
            changed = _acc_struct("a.tags", "a.results", "a.done", "a.fin", "a.pushed", "true")
            steps.append(_iff(m, changed, _iff("a.m", _KEEP_M_FALSE, "a")))
            action_steps(r)

    if not steps:
        out = df.withColumn("results", F.expr(f"cast(array() as {RESULT_TYPE})")).withColumn(
            "tags_out", F.col(tags_col)
        )
        if with_pushed:
            out = out.withColumn("pushed", F.expr(f"cast(array() as {PUSHED_TYPE})"))
        return out

    init = _acc_struct(
        f"`{tags_col}`",
        f"cast(array() as {RESULT_TYPE})",
        "false",
        "false",
        f"cast(array() as {PUSHED_TYPE})",
        "false",
    )
    n = len(steps)
    body = _dispatch(steps, 0, n - 1)
    agg = f"aggregate(sequence(1, {n}), {init}, (a, i) -> {body})"

    out = df.withColumn("_acc", F.expr(agg))
    out = out.withColumn("results", F.col("_acc").getField("results")).withColumn(
        "tags_out", F.col("_acc").getField("tags")
    )
    if with_pushed:
        out = out.withColumn("pushed", F.col("_acc").getField("pushed"))
    return out.drop("_acc")
