"""Parser for the style-rule DSL.

Grammar subset (documented against the reference):
- predicates: ``key=value  key!=value  key=*  key!=*  key<n  key<=n
  key>n  key>=n  key~'regex'`` (EqualsOp/NotEqualOp/ExistsOp/
  NotExistsOp/NumericOp/RegexOp, osmstyle/eval/*)
- boolean: ``& | ! ( )`` with mkgmap precedence ! > & > |
  (Op.java:31-138 priorities)
- actions: ``{ set k=v; add k=v; delete k; name 'template' }``
  (ActionReader.java:48-108); values may contain ``${tag}``
  substitutions (ValueBuilder.java) — an action whose substitution
  references a missing tag is skipped
- type def: ``[0xNN resolution A-B [level A-B] [continue
  [with_actions]]]`` (TypeReader.java:68-110)

- style function atoms: ``length()`` (equirectangular way length in
  metres, LengthFunction.java:48-62) and ``is_closed()``
  (IsClosedFunction) usable as predicate keys

Out of scope this round (tracked in SURVEY §2.2): unit-suffix numeric
values, the remaining style functions (area_size(), maxspeedkmh()...),
apply/apply_once inside action blocks (the standalone operator exists,
operators/relations.apply_to_members), include/overlay, finalize
sections, the full filter set in ``${tag|filter:...}``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ----------------------------------------------------------------- AST
@dataclass
class Cond:
    op: str  # '=', '!=', 'exists', 'not_exists', '<', '<=', '>', '>=', '~'
    key: str
    value: str | None = None


@dataclass
class Not:
    child: object


@dataclass
class And:
    left: object
    right: object


@dataclass
class Or:
    left: object
    right: object


@dataclass
class Action:
    kind: str  # 'set' | 'add' | 'delete' | 'name'
    key: str | None = None
    value: str | None = None


@dataclass
class GType:
    type_code: int
    min_res: int = 24
    max_res: int = 24


@dataclass
class Rule:
    pred: object
    actions: list[Action] = field(default_factory=list)
    gtype: GType | None = None
    cont: bool = False
    with_actions: bool = False
    finalize: bool = False


# ------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<comment>\#[^\n]*)
  | (?P<str>'[^']*'|"[^"]*")
  | (?P<op><=|>=|!=\*|!=|=\*|=|<|>|~|&|\||!|\(|\)|\{|\}|\[|\]|;)
  | (?P<word>[^\s'"<>=!~&|(){}\[\];]+)
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[str]:
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"rule syntax error at {src[i:i+20]!r}")
        i = m.end()
        if m.lastgroup in ("str", "op", "word"):
            out.append(m.group(m.lastgroup))
    return out


def _unquote(tok: str) -> str:
    if len(tok) >= 2 and tok[0] in "'\"" and tok[-1] == tok[0]:
        return tok[1:-1]
    return tok


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r}")

    # precedence: | lowest, then &, then !
    def parse_or(self):
        left = self.parse_and()
        while self.peek() == "|":
            self.next()
            left = Or(left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.peek() == "&":
            self.next()
            left = And(left, self.parse_not())
        return left

    def parse_not(self):
        if self.peek() == "!":
            self.next()
            return Not(self.parse_not())
        return self.parse_atom()

    def parse_atom(self):
        if self.peek() == "(":
            self.next()
            e = self.parse_or()
            self.expect(")")
            return e
        key = _unquote(self.next())
        if self.peek() == "(":
            # style function atom: length() / is_closed()
            # (osmstyle/function/FunctionFactory.java:30-51)
            self.expect("(")
            self.expect(")")
            key = f"fn:{key}"
        op = self.next()
        if op == "=*":
            return Cond("exists", key)
        if op == "!=*":
            return Cond("not_exists", key)
        if op in ("=", "!=", "<", "<=", ">", ">=", "~"):
            return Cond(op, key, _unquote(self.next()))
        raise ValueError(f"bad predicate operator {op!r} after {key!r}")

    def parse_actions(self) -> list[Action]:
        self.expect("{")
        acts: list[Action] = []
        while self.peek() != "}":
            kind = self.next()
            if kind == ";":
                continue
            if kind == "delete":
                acts.append(Action("delete", key=_unquote(self.next())))
            elif kind == "name":
                acts.append(Action("name", value=_unquote(self.next())))
            elif kind in ("set", "add"):
                key = _unquote(self.next())
                self.expect("=")
                acts.append(Action(kind, key=key, value=_unquote(self.next())))
            else:
                raise ValueError(f"unsupported action {kind!r}")
        self.expect("}")
        return acts

    def parse_gtype(self) -> tuple[GType, bool, bool]:
        self.expect("[")
        code = self.next()
        type_code = int(code, 16) if code.lower().startswith("0x") else int(code)
        g = GType(type_code)
        cont = with_actions = False
        while self.peek() != "]":
            t = self.next()
            if t == "resolution":
                spec = self.next()
                parts = spec.split("-")
                vals = [int(p) for p in parts]
                g.min_res, g.max_res = min(vals), max(vals)
            elif t == "level":
                self.next()  # level spec accepted, resolution-driven engine
            elif t == "continue":
                cont = True
                if self.peek() == "with_actions":
                    self.next()
                    with_actions = True
            else:
                raise ValueError(f"unsupported type-def attribute {t!r}")
        self.expect("]")
        return g, cont, with_actions


def parse_rule(src: str) -> Rule:
    p = _P(_tokenize(src))
    pred = p.parse_or()
    actions: list[Action] = []
    gtype = None
    cont = with_actions = False
    if p.peek() == "{":
        actions = p.parse_actions()
    if p.peek() == "[":
        gtype, cont, with_actions = p.parse_gtype()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens: {p.toks[p.i:]}")
    return Rule(pred, actions, gtype, cont, with_actions)


def parse_rules(src: str) -> list[Rule]:
    """Parse a rule file: one rule per (logical) line; '#' comments.
    Rules after a ``<finalize>`` marker line form the finalize section
    (RuleFileReader.java:380-439) and are flagged ``finalize=True``."""
    rules = []
    in_finalize = False
    for line in src.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        if line == "<finalize>":
            in_finalize = True
            continue
        r = parse_rule(line)
        r.finalize = in_finalize
        rules.append(r)
    return rules


def parse_rule_files(sources: list[str]) -> list[Rule]:
    """Include/overlay merge: later files append at lower priority
    (RuleSet.merge:154-173 — simple concatenation in declaration
    order)."""
    out: list[Rule] = []
    for src in sources:
        out.extend(parse_rules(src))
    return out
