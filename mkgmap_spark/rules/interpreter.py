"""Naive rule interpreter — the differential oracle.

Mirrors the role of StyleTester's ``--reference`` mode
(main/StyleTester.java:113-118): a deliberately simple rule-at-a-time
evaluator with no optimization, used to cross-check the compiled
Column program (tests follow the RulesTest pattern,
test/main/RulesTest.java:74-160).
"""

from __future__ import annotations

import re

from .parser import Action, And, Cond, GType, Not, Or, Rule

_SUBST_RE = re.compile(r"\$\{([^}]+)\}")


def _num(v: str | None):
    if v is None:
        return None
    try:
        return float(v)
    except ValueError:
        return None


EARTH_R = 6378137.0
_MU = 2.0 * 3.141592653589793 / (1 << 24)


def _geom_value(key: str, geom: dict | None):
    """Style-function values (LengthFunction.java:48-62 equirect sum;
    IsClosedFunction).  Returns a string like tag values do."""
    if geom is None:
        return None
    la, lo = geom.get("lats") or [], geom.get("lons") or []
    if key == "fn:is_closed":
        closed = len(la) >= 3 and la[0] == la[-1] and lo[0] == lo[-1]
        return "true" if closed else "false"
    if key == "fn:length":
        import math

        total = 0.0
        for i in range(1, len(la)):
            y1, y2 = la[i - 1] * _MU, la[i] * _MU
            dx = (lo[i] - lo[i - 1]) * _MU * math.cos((y1 + y2) / 2.0)
            total += EARTH_R * math.sqrt((y2 - y1) ** 2 + dx * dx)
        return repr(total)
    return None


def eval_pred(pred, tags: dict[str, str], geom: dict | None = None) -> bool:
    if isinstance(pred, Cond):
        v = _geom_value(pred.key, geom) if pred.key.startswith("fn:") else tags.get(pred.key)
        if pred.op == "exists":
            return v is not None
        if pred.op == "not_exists":
            return v is None
        if pred.op == "=":
            return v == pred.value
        if pred.op == "!=":
            # mkgmap: a!=b is true when a is missing too (NotEqualOp)
            return v != pred.value
        if pred.op == "~":
            return v is not None and re.fullmatch(pred.value, v) is not None
        a, b = _num(v), _num(pred.value)
        if a is None or b is None:
            return False
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[pred.op]
    if isinstance(pred, Not):
        return not eval_pred(pred.child, tags, geom)
    if isinstance(pred, And):
        return eval_pred(pred.left, tags, geom) and eval_pred(pred.right, tags, geom)
    if isinstance(pred, Or):
        return eval_pred(pred.left, tags, geom) or eval_pred(pred.right, tags, geom)
    raise TypeError(type(pred))


def _substitute(value: str, tags: dict[str, str]) -> str | None:
    """${tag} substitution; None if any referenced tag is missing
    (ValueBuilder semantics: failed substitution -> value unusable)."""
    out = []
    pos = 0
    for m in _SUBST_RE.finditer(value):
        out.append(value[pos : m.start()])
        tv = tags.get(m.group(1))
        if tv is None:
            return None
        out.append(tv)
        pos = m.end()
    out.append(value[pos:])
    return "".join(out)


def apply_actions(actions: list[Action], tags: dict[str, str]) -> dict[str, str]:
    t = dict(tags)
    for a in actions:
        if a.kind == "delete":
            t.pop(a.key, None)
        elif a.kind in ("set", "add"):
            if a.kind == "add" and a.key in t:
                continue
            v = _substitute(a.value, t)
            if v is not None:
                t[a.key] = v
        elif a.kind == "name":
            if "mkgmap:label:1" not in t:
                v = _substitute(a.value, t)
                if v is not None:
                    t["mkgmap:label:1"] = v
    return t


def interpret(rules: list[Rule], tags: dict[str, str], geom: dict | None = None) -> tuple[list[GType], dict[str, str]]:
    """Run the ordered rule list over one element's tags.

    Returns (emitted gtypes in order, final persistent tag state).
    First TYPE-DEF terminates unless continue; `continue with_actions`
    persists the actions for later rules, plain `continue` does not
    (RuleSet.resolveType + ActionRule semantics).
    """
    main = [r for r in rules if not getattr(r, "finalize", False)]
    fin = [r for r in rules if getattr(r, "finalize", False)]

    cur = dict(tags)
    out: list[GType] = []

    def run_finalize(t):
        # finalize rules run once per matched element, actions only
        # (RuleFileReader.java:380-439; RuleSet.java:101-105)
        for fr in fin:
            if eval_pred(fr.pred, t, geom):
                t = apply_actions(fr.actions, t)
        return t

    for r in main:
        if not eval_pred(r.pred, cur, geom):
            continue
        acted = apply_actions(r.actions, cur) if r.actions else cur
        if r.gtype is None:
            # action-only rule: actions always persist
            cur = acted
            continue
        out.append(r.gtype)
        if not r.cont:
            cur = acted
            if out:
                cur = run_finalize(cur)
            return out, cur
        cur = acted if r.with_actions else cur
    if out:
        cur = run_finalize(cur)
    return out, cur
