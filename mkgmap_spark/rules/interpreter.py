"""Naive rule interpreter — the differential oracle.

Mirrors the role of StyleTester's ``--reference`` mode
(main/StyleTester.java:113-118): a deliberately simple rule-at-a-time
evaluator with no optimization, used to cross-check the compiled
Column program (tests follow the RulesTest pattern,
test/main/RulesTest.java:74-160).

Semantics implemented 1:1 with the reference:

- predicate ops incl. ``!~`` (NotRegexOp: true when the tag is
  missing) and numeric compares through ValueWithUnit (first numeric
  substring of BOTH sides; units parsed but NOT converted —
  ValueWithUnit.compareTo compares the numbers only);
- first-match / ``continue`` / propagate-on-continue with element
  copies exactly as ActionRule.resolveType:80-110 (a continue rule
  without with_actions/propagate applies its actions to a copy);
- finalize rules run at every type emission (persistently only for a
  terminating emission), plus the mkgmap:execute_finalize_rules
  fallback when the scan completes without a terminating type
  (RuleSet.resolveType:100-105);
- the full action set (ActionReader.java:48-108) and the 13 value
  filters (ValueBuilder.java:195-244) with '|'-separated alternatives
  (first alternative whose substitutions all resolve wins);
- ``apply``/``apply_once`` (SubAction.java): sub-actions are recorded
  as (sub_action, relation-tag snapshot) pushes; apply_sub_to_member
  executes them against a member with ${..} reading the snapshot and
  $(..) / filter tag lookups reading the member (ValueItem.getValue:
  el vs local_el).  name/addlabel inside apply read the member for
  both (NameAction.perform uses build(el, el)).
"""

from __future__ import annotations

import math
import re

from .parser import (
    ACCESS_TAG_KEYS,
    Action,
    And,
    Cond,
    GType,
    Not,
    Or,
    Rule,
    Template,
    TruePred,
)

# ---------------------------------------------------------------- units
# UnitConversions.java:41-63
UNIT_TABLES = {
    "length": {"m": 1.0, "km": 1000.0, "ft": 0.3048, "feet": 0.3048, "mi": 1609.344},
    "speed": {"kmh": 1.0, "km/h": 1.0, "kmph": 1.0, "mph": 1.60934, "knots": 1.852},
    "weight": {"t": 1.0, "kg": 0.001, "lb": 0.00045359237, "lbs": 0.00045359237},
}


def unit_type(u: str):
    for t, m in UNIT_TABLES.items():
        if u in m:
            return t
    return None


def conv_spec(arg: str):
    """Parse 'src=>dst'; returns (valid, default_factor, unit_type,
    target) — factor(u) = table[u] / table[target]
    (UnitConversions.getConversion)."""
    m = re.fullmatch(r"(.*)=>(.*)", arg)
    if not m:
        raise ValueError(f"unrecognised unit conversion {arg!r}")
    src, dst = m.group(1), m.group(2)
    t = unit_type(src)
    if t is None or t != unit_type(dst):
        return (False, 1.0, None, dst)
    return (True, UNIT_TABLES[t][src] / UNIT_TABLES[t][dst], t, dst)


_NUM_RE = re.compile(r"(-?[0-9.]+)")


def extract_number(v: str | None):
    """ValueWithUnit: the first numeric substring, or None."""
    if v is None:
        return None
    m = _NUM_RE.search(v)
    if not m:
        return None
    try:
        return float(m.group(1))
    except ValueError:
        return None


def java_round(x: float) -> int:
    """Java Math.round: floor(x + 0.5)."""
    return int(math.floor(x + 0.5))


def _java_re_compat(pattern: str) -> str:
    """Java Pattern accepts quantified anchors (``^+3530`` compiles; a
    one-or-more of the zero-width ``^`` is just ``^``) where Python's
    ``re`` raises "nothing to repeat" — the reference style manual's
    phone-normalization example relies on this
    (ValueBuilderTest.testQuotedSplitLines).  Collapse ``^+``/``$+``
    runs outside character classes; the compiled SQL twin runs Java
    regex natively and needs no shim."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        if c in "^$":
            j = i + 1
            while j < n and pattern[j] == "+":
                j = j + 1
            out.append(c)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def format_2dp(x: float) -> str:
    """DecimalFormat('0.0#') stand-in shared with the compiler: round
    half-up to 2 dp, shortest repr (always >= 1 decimal for floats)."""
    return repr(math.floor(x * 100 + 0.5) / 100.0)


# -------------------------------------------------------------- filters
# PrependFilter symbols_8bit
PREPEND_SYMBOLS = {
    "ele": "",
    "interstate": "",
    "shield": "",
    "round": "",
    "boxx": "",
    "box": "",
    "oval": "",
}
# HighwaySymbolFilter symbols
HWY_SYMBOLS = {
    "interstate": "",
    "shield": "",
    "round": "",
    "hbox": "",
    "box": "",
    "oval": "",
}

# country-ISO: the reference resolves via LocatorConfig.xml's isoMap
# (CountryISOFilter.doFilter -> LocatorConfig.getCountryISOCode);
# unknown names pass through unchanged (null-lookup path).  The full
# shipped table (data/LocatorConfig.xml) backs both engines.
from ..functions.locator_config import country_iso_map as _country_iso_map

COUNTRY_ISO = _country_iso_map()

# transliteration now lives in functions/translit.py (complete
# reference tables generated from the TableTransliterator rows data)


def _conv_value(value: str, arg: str) -> str:
    """ConvertFilter.doFilter."""
    valid, default_factor, utype, _ = conv_spec(arg)
    if value is None or not valid:
        return value
    number = value
    factor = default_factor
    if not value[-1:].isdigit():
        m = re.fullmatch(r"\s*([\d.]+)\s*([\w/]*)\s*", value)
        if not m:
            return value
        number = m.group(1)
        src = m.group(2)
        if src == "":
            factor = default_factor
        else:
            tbl = UNIT_TABLES[utype]
            if src not in tbl:
                return value
            _, _, _, dst = conv_spec(arg)
            factor = tbl[src] / tbl[dst]
    try:
        d = float(number)
    except ValueError:
        return value
    return str(java_round(d * factor))


def apply_filter(cmd: str, arg: str, value: str | None, local_tags: dict) -> str | None:
    """One ValueFilter.doFilter step.  ``local_tags`` is the local
    element (filters that look at tags use local_el)."""
    if cmd == "def":
        return arg if (value is None or value == "") else value
    if cmd == "conv":
        return _conv_value(value, arg)
    if cmd == "height":
        v = _conv_value(value, arg if arg else "m=>ft")
        return None if v is None else "" + v
    if cmd == "subst":
        if value is None:
            return None
        i = arg.find("=>")
        is_re = False
        if i == -1:
            i = arg.find("~>")
            if i >= 0:
                is_re = True
        if i >= 0:
            frm, to = arg[:i], arg[i + 2 :]
        else:
            frm, to = arg, ""
        if is_re:
            # Java replaceAll replacement syntax: $N group refs
            rep = re.sub(r"\$(\d+)", r"\\\1", to.replace("\\", "\\\\"))
            return re.sub(_java_re_compat(frm), rep, value) if frm else value
        return value.replace(frm, to)
    if cmd == "prefix":
        if value is None:
            return None
        p = PREPEND_SYMBOLS.get(arg)
        if p is None:
            try:
                p = chr(int(arg, 16))
            except ValueError:
                p = arg
        return p + value
    if cmd == "highway-symbol":
        if value is None:
            return None
        parts = arg.split(":")
        prefix = HWY_SYMBOLS.get(parts[0], "[" + parts[0] + "]")
        max_an = int(parts[1]) if len(parts) >= 2 else 8
        max_a = int(parts[2]) if len(parts) >= 3 else max_an if len(parts) == 2 else 8
        shield = value.replace(" ", "").replace(";", "/")
        is_an = any(c.isdigit() for c in shield)
        if (is_an and len(shield) > max_an) or (not is_an and len(shield) > max_a):
            return value
        return prefix + shield
    if cmd == "not-equal":
        if value is None:
            return None
        tv = local_tags.get(arg)
        return None if (tv is not None and value == tv) else value
    if cmd == "substring":
        # SubstringFilter: 1 or 2 ':'-separated args, start <= end —
        # anything else is the reference's SyntaxException
        parts = arg.split(":")
        if not arg or len(parts) > 2:
            raise ValueError(f"substring filter needs 1 or 2 args, got {arg!r}")
        start = int(parts[0])
        end = int(parts[1]) if len(parts) == 2 else None
        if end is not None and start > end:
            raise ValueError(f"substring filter start > end: {arg!r}")
        if value is None:
            return None
        if start > len(value):
            return None
        if end is None or end > len(value):
            return value[start:]
        return value[start:end]
    if cmd == "part":
        if value is None:
            return None
        if ":" in arg:
            tmp, op = arg.split(":"), None
        elif ">" in arg:
            tmp, op = arg.split(">"), ">"
        elif "<" in arg:
            tmp, op = arg.split("<"), "<"
        else:
            tmp, op = [arg], None
        partnumber = int(tmp[1]) if len(tmp) > 1 else 1
        sep = tmp[0] if tmp[0] else ";"
        if partnumber == 0:
            raise ValueError(f"invalid part spec {arg!r}")
        pieces = value.split(sep)
        if len(pieces) < abs(partnumber):
            return None
        idx = partnumber - 1 if partnumber > 0 else len(pieces) + partnumber
        if op is None:
            return pieces[idx].strip()
        out = []
        if op == "<":
            for i in range(idx):
                out.append(pieces[i] + sep)
        else:
            for i in range(idx + 1, len(pieces)):
                out.append(pieces[i] + sep)
        return "".join(out)
    if cmd in ("ascii", "latin1"):
        # matches the compiler's inline SQL form exactly (full tables
        # below U+3000, '?' above — functions/translit.py)
        from ..functions.translit import transliterate_inline

        return transliterate_inline(value, cmd)
    if cmd == "country-ISO":
        if value is None:
            return None
        return COUNTRY_ISO.get(value.upper().strip(), value)
    if cmd == "not-contained":
        parts = arg.split(":", 1)
        if len(parts) < 2 or not parts[1]:
            raise ValueError(f"not-contained needs sep:tag, got {arg!r}")
        sep = parts[0] if parts[0] else ";"
        if value is None:
            return None
        tv = local_tags.get(parts[1])
        if tv is None:
            return value
        return None if value in tv.split(sep) else value
    raise ValueError(f"unknown filter {cmd!r}")


# ------------------------------------------------------- value builders
def eval_template(t: Template, el_tags: dict, local_tags: dict | None = None) -> str | None:
    """ValueBuilder.build: None if any item resolves to None."""
    if local_tags is None:
        local_tags = el_tags
    parts = []
    for item in t.items:
        if item.tag is None:
            parts.append(item.text or "")
            continue
        v = (local_tags if item.local else el_tags).get(item.tag)
        for cmd, arg in item.filters:
            v = apply_filter(cmd, arg, v, local_tags)
        if v is None:
            return None
        parts.append(v)
    return "".join(parts)


def eval_alternatives(templates: list[Template], el_tags: dict, local_tags: dict | None = None) -> str | None:
    for t in templates:
        v = eval_template(t, el_tags, local_tags)
        if v is not None:
            return v
    return None


# --------------------------------------------------------------- actions
def perform_actions(
    actions: list[Action],
    tags: dict[str, str],
    value_tags: dict | None = None,
    pushed: list | None = None,
    is_relation: bool = False,
) -> dict[str, str]:
    """Run an action list against ``tags`` (returns a new dict).

    ``value_tags``: the element used for ${..} substitution in
    set/add/setaccess/addaccess (the relation in apply context;
    AddTagAction.setValueTags).  ``pushed`` collects (sub_action,
    tags-snapshot) pairs for apply actions when the element is a
    relation (SubAction performs against members, not this element).
    """
    t = dict(tags)
    for a in actions:
        if a.kind == "delete":
            t.pop(a.key, None)
        elif a.kind == "deletealltags":
            t = {}
        elif a.kind == "rename":
            v = t.get(a.key)
            if v is not None:
                t[a.to] = v
                del t[a.key]
        elif a.kind in ("echo", "echotags"):
            pass  # debug sinks; no tag mutation
        elif a.kind in ("set", "add"):
            if a.kind == "add" and t.get(a.key) is not None:
                continue
            v = eval_alternatives(a.values, value_tags if value_tags is not None else t, t)
            if v is not None:
                t[a.key] = v
        elif a.kind in ("setaccess", "addaccess"):
            v = eval_alternatives(a.values, value_tags if value_tags is not None else t, t)
            if v is not None:
                for key in ACCESS_TAG_KEYS:
                    if a.kind == "setaccess" or t.get(key) is None:
                        t[key] = v
        elif a.kind == "name":
            if t.get("mkgmap:label:1") is None:
                v = eval_alternatives(a.values, t, t)
                if v is not None:
                    t["mkgmap:label:1"] = v
        elif a.kind == "addlabel":
            for index in range(1, 5):
                if t.get(f"mkgmap:label:{index}") is None:
                    v = eval_alternatives(a.values, t, t)
                    if v is not None:
                        if any(v == t.get(f"mkgmap:label:{n}") for n in range(1, index)):
                            break  # equal to a previous label: do not use
                        t[f"mkgmap:label:{index}"] = v
                    break
        elif a.kind == "apply":
            if is_relation and pushed is not None:
                pushed.append((a, dict(t)))
        else:
            raise ValueError(f"unknown action kind {a.kind!r}")
    return t


def apply_sub_to_member(
    sub: Action, ctx_tags: dict, member_tags: dict, member_is_relation: bool = False
) -> tuple[dict, list]:
    """Execute one apply block's sub-actions against one member.

    ${..} in set/add/setaccess/addaccess reads the RELATION snapshot
    (ctx_tags); $(..) and filter tag lookups read the member.  Returns
    (new member tags, nested pushes) — nested apply actions recurse to
    the member's own members when it is a relation."""
    nested: list = []
    out = perform_actions(
        sub.sub, member_tags, value_tags=ctx_tags, pushed=nested, is_relation=member_is_relation
    )
    return out, nested


# ------------------------------------------------------------ predicates
EARTH_R = 6378137.0
_MU = 2.0 * 3.141592653589793 / (1 << 24)

NUMERIC_FNS = {"fn:length", "fn:area_size", "fn:maxspeedkmh", "fn:maxspeedmph"}


def _fn_value(key: str, tags: dict, geom: dict | None, el: dict | None):
    """Style-function values (osmstyle/function/*)."""
    la = (geom or {}).get("lats") or []
    lo = (geom or {}).get("lons") or []
    if key == "fn:is_closed":
        closed = len(la) >= 3 and la[0] == la[-1] and lo[0] == lo[-1]
        return "true" if closed else "false"
    if key == "fn:is_complete":
        # false when the resolver flagged lost node refs (bbox-clipped
        # extract); inputs without the flag are complete by construction
        comp = (geom or {}).get("complete")
        if comp is None:
            comp = (el or {}).get("complete")
        return "false" if comp is False else "true"
    if key == "fn:type":
        return (el or {}).get("kind")
    if key == "fn:osmid":
        i = (el or {}).get("id")
        return None if i is None else str(i)
    if key == "fn:length":
        total = 0.0
        for i in range(1, len(la)):
            y1, y2 = la[i - 1] * _MU, la[i] * _MU
            dx = (lo[i] - lo[i - 1]) * _MU * math.cos((y1 + y2) / 2.0)
            total += EARTH_R * math.sqrt((y2 - y1) ** 2 + dx * dx)
        return total
    if key == "fn:area_size":
        # AreaSizeFunction: 0 unless closed; |shoelace|/2 in map units^2
        if not (len(la) >= 3 and la[0] == la[-1] and lo[0] == lo[-1]):
            return 0.0
        a2 = sum(lo[i] * la[i + 1] - lo[i + 1] * la[i] for i in range(len(la) - 1))
        return abs(a2) / 2.0
    if key in ("fn:maxspeedkmh", "fn:maxspeedmph"):
        tv = tags.get("maxspeed")
        if tv is None:
            return None
        s = tv.lower().strip()
        unit = "kmh"
        if re.fullmatch(r".*mph", s):
            s = re.sub(r"[ \t]*mph", "", s, count=1)
            unit = "mph"
        else:
            s = re.sub(r"[ \t]*km/?h", "", s, count=1)
        try:
            speed = int(s)
        except ValueError:
            return None
        target = "kmh" if key == "fn:maxspeedkmh" else "mph"
        if unit == target:
            v = float(speed)
        elif unit == "mph":
            v = speed * 1.61
        else:
            v = speed / 1.61
        return format_2dp(v)
    raise ValueError(f"unknown style function {key!r}")


def eval_pred(pred, tags: dict[str, str], geom: dict | None = None, el: dict | None = None) -> bool:
    if isinstance(pred, TruePred):
        return True
    if isinstance(pred, Cond):
        if pred.key.startswith("fn:"):
            # length/area_size yield floats (numeric-compare path);
            # the rest yield strings like tag values
            v = _fn_value(pred.key, tags, geom, el)
        else:
            v = tags.get(pred.key)
        # RHS: another tag's value for $refs, else the literal
        rhs = tags.get(pred.value_tag) if pred.value_tag is not None else pred.value
        if pred.op == "exists":
            return v is not None
        if pred.op == "not_exists":
            return v is None
        if pred.op in ("=", "!="):
            if isinstance(v, float):
                # numeric style functions compare NUMERICALLY on both
                # engines (documented divergence from the reference's
                # formatted-string equality — see compiler.compile_pred)
                b = extract_number(rhs)
                eq = b is not None and v == b
            else:
                # EqualsOp: LHS null -> false; equal to possibly-null RHS
                eq = v is not None and v == rhs
            return eq if pred.op == "=" else not eq
        if pred.op == "~":
            return v is not None and re.fullmatch(pred.value, str(v)) is not None
        if pred.op == "!~":
            # NotRegexOp: negation of ~ (true when the tag is missing)
            return not (v is not None and re.fullmatch(pred.value, str(v)) is not None)
        a = v if isinstance(v, float) else extract_number(v)
        b = extract_number(rhs)
        if a is None or b is None:
            return False
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[pred.op]
    if isinstance(pred, Not):
        return not eval_pred(pred.child, tags, geom, el)
    if isinstance(pred, And):
        return eval_pred(pred.left, tags, geom, el) and eval_pred(pred.right, tags, geom, el)
    if isinstance(pred, Or):
        return eval_pred(pred.left, tags, geom, el) or eval_pred(pred.right, tags, geom, el)
    raise TypeError(type(pred))


# --------------------------------------------------------------- driver
def apply_actions(actions: list[Action], tags: dict[str, str]) -> dict[str, str]:
    """Back-compat simple entry (non-relation, no apply)."""
    return perform_actions(actions, tags)


def interpret(
    rules: list[Rule],
    tags: dict[str, str],
    geom: dict | None = None,
    el: dict | None = None,
) -> tuple[list[GType], dict[str, str]]:
    """Run the ordered rule list over one element's tags.

    Returns (emitted gtypes in order, final persistent tag state).
    ``el`` may carry {'id', 'kind', 'pushed': []} — 'pushed' collects
    (sub_action, relation-tag-snapshot) pairs for apply actions when
    kind == 'relation'.

    Exact ActionRule.resolveType semantics: a continue rule without
    propagate applies actions (and per-emission finalize) to a COPY;
    the terminating emission persists actions, the default_name tag,
    and the finalize pass; when the scan ends without a terminating
    type, finalize runs iff mkgmap:execute_finalize_rules=true.
    """
    main = [r for r in rules if not r.finalize]
    fin = [r for r in rules if r.finalize]
    is_relation = bool(el) and el.get("kind") == "relation"
    pushed = el.setdefault("pushed", []) if el is not None else None

    cur = dict(tags)
    out: list[GType] = []

    def run_finalize(t: dict) -> dict:
        for fr in fin:
            if eval_pred(fr.pred, t, geom, el):
                t = perform_actions(fr.actions, t, pushed=pushed, is_relation=is_relation)
        return t

    for r in main:
        if not eval_pred(r.pred, cur, geom, el):
            continue
        gt = r.gtype
        # propagate = !continue or with_actions (GType.isPropogateActions);
        # relations are never copied (ActionRule: !(element instanceof
        # Relation)), so their actions always persist
        propagate = gt is None or (not r.cont) or r.with_actions
        acted = perform_actions(r.actions, cur, pushed=pushed, is_relation=is_relation)
        if propagate or is_relation:
            cur = acted
        if gt is not None:
            if fin:
                # per-emission finalize pass (ActionRule:97-106): runs
                # on the post-action state; the default_name tag is
                # injected first; only a TERMINATING emission persists
                # the result (continue emissions finalize a copy)
                fin_base = dict(acted)
                if gt.default_name is not None:
                    fin_base["mkgmap:default_name"] = gt.default_name
                fin_out = run_finalize(fin_base)
                if not r.cont:
                    cur = fin_out
            out.append(gt)
            if not r.cont:
                return out, cur
    # scan completed without a terminating type: finalize fallback
    # (RuleSet.resolveType:100-105, gated on the execute tag)
    if fin and cur.get("mkgmap:execute_finalize_rules") == "true":
        cur = run_finalize(cur)
    return out, cur
