"""Parser for the style-rule DSL.

Grammar (documented against the reference, osmstyle/RuleFileReader.java
+ scan/TokenScanner.java):

- predicates: ``key=value  key!=value  key=*  key!=*  key<n  key<=n
  key>n  key>=n  key~'regex'  key!~'regex'`` (EqualsOp/NotEqualOp/
  ExistsOp/NotExistsOp/NumericOp/RegexOp/NotRegexOp, osmstyle/eval/*)
- boolean: ``& | ! ( )`` with mkgmap precedence ! > & > |
  (Op.java:31-138 priorities)
- style function atoms usable as predicate keys
  (osmstyle/function/FunctionFactory.java:30-51): ``length()``,
  ``is_closed()``, ``is_complete()``, ``area_size()``,
  ``maxspeedkmh()``, ``maxspeedmph()``, ``type()``, ``osmid()``;
  ``get_tag(x)`` is the internal form of a plain tag lookup
  (GetTagFunction.java) and parses to the same Cond.
- actions (ActionReader.java:48-108): ``set k=v|v2|..``,
  ``add k=v|..``, ``setaccess v|..``, ``addaccess v|..``,
  ``name v|..``, ``addlabel v|..``, ``delete k``, ``deletealltags``,
  ``rename from to``, ``echo s``, ``echotags s``,
  ``apply [role=r] { .. }``, ``apply_once [role=r] { .. }``.
  Values are templates with ``${tag|filter:arg|..}`` (relation/element
  tags) and ``$(tag|..)`` (local element tags in apply context)
  substitutions (ValueBuilder.java:105-244); alternatives separated by
  ``|`` — the first alternative whose substitutions all resolve wins.
- type def (TypeReader.java:60-110): ``[0xNN [resolution A[-B]]
  [level A[-B]] [road_class=n] [road_speed=n] [default_name=s]
  [continue [with_actions]] [propagate|with_actions|no_propagate]
  [copy|oneway|access (reserved)]]``.  A single resolution number sets
  the min only (max stays 24); reversed ranges are swapped.
- ``<finalize>`` marker starts the finalize section
  (RuleFileReader.java:380-439): action-only rules executed per type
  emission / via the mkgmap:execute_finalize_rules fallback.
- ``if ( expr ) then .. [else ..] end`` desugars to a hidden generated
  tag (RuleFileReader.readIf: a rule ``expr { set mkgmap:gen:if:N=true }``
  plus an AND with the generated-tag check on every enclosed rule; we
  always use the "safe" generated-tag form, which freezes the if
  result at its declaration point exactly like the reference does when
  enclosed actions could change it).
- ``include 'path';`` splices another rule file (RuleFileReader:176) —
  resolved through a caller-supplied ``resolver(path) -> source``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

STYLE_FUNCTIONS = {
    "length",
    "is_closed",
    "is_complete",
    "area_size",
    "maxspeedkmh",
    "maxspeedmph",
    "type",
    "osmid",
}

VALID_FILTERS = {
    "def",
    "conv",
    "subst",
    "prefix",
    "highway-symbol",
    "height",
    "not-equal",
    "substring",
    "part",
    "ascii",
    "latin1",
    "country-ISO",
    "not-contained",
}

_VALID_ACCESS = {"yes", "no", "true", "false", "1", "0"}

# the 8 per-vehicle tags written by setaccess/addaccess
# (AccessTagsAndBits.java:46-57 ACCESS_TAGS, declaration order)
ACCESS_TAG_KEYS = [
    "mkgmap:foot",
    "mkgmap:bicycle",
    "mkgmap:car",
    "mkgmap:delivery",
    "mkgmap:truck",
    "mkgmap:bus",
    "mkgmap:taxi",
    "mkgmap:emergency",
]


# ----------------------------------------------------------------- AST
@dataclass
class Cond:
    op: str  # '=', '!=', 'exists', 'not_exists', '<', '<=', '>', '>=', '~', '!~'
    key: str
    value: str | None = None
    # value-side tag reference: ``test=$other`` / ``$a < $b`` compare
    # against the OTHER tag's value (ExpressionReader.java:78-84 pushes
    # GetTagFunction for $-words; bare RHS words stay literal — their
    # numeric value is the first numeric substring, ValueWithUnit)
    value_tag: str | None = None


@dataclass
class TruePred:
    """The empty predicate ``()`` — always true (if-then-2.test)."""


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
class ValueItem:
    """One segment of a value template: literal text OR a tag reference
    with an optional filter chain (ValueItem.java/ValueFilter.java)."""

    text: str | None = None
    tag: str | None = None
    local: bool = False  # $(tag) reads the local element in apply context
    filters: list[tuple[str, str]] = field(default_factory=list)


@dataclass
class Template:
    items: list[ValueItem]

    @property
    def is_literal(self) -> bool:
        return all(i.tag is None for i in self.items)


@dataclass
class Action:
    kind: str  # set|add|name|addlabel|setaccess|addaccess|delete|deletealltags|rename|echo|echotags|apply
    key: str | None = None
    values: list[Template] = field(default_factory=list)  # '|'-separated alternatives
    to: str | None = None  # rename target
    role: str | None = None  # apply role filter
    once: bool = False  # apply_once
    sub: list["Action"] = field(default_factory=list)  # apply sub-actions

    # compatibility convenience for simple single-template actions
    @property
    def value(self) -> str | None:
        if not self.values:
            return None
        return template_to_string(self.values[0])


def template_to_string(t: Template) -> str:
    out = []
    for it in t.items:
        if it.tag is None:
            out.append(it.text or "")
        else:
            f = "".join(f"|{c}:{a}" for c, a in it.filters)
            out.append(("$(" if it.local else "${") + it.tag + f + (")" if it.local else "}"))
    return "".join(out)


@dataclass
class GType:
    type_code: int
    min_res: int = 24
    max_res: int = 24
    road_class: int = 0  # Java int field defaults (GType.java:45-46)
    road_speed: int = 0
    default_name: str | None = None
    min_level: int = 0   # derived from resolutions (GType.fixLevels)
    max_level: int = -1

    def fix_levels(self, levels: list[tuple[int, int]]) -> None:
        """GType.fixLevels:130-138 — derive the level range from the
        resolution range.  LevelInfo sorts highest level number first
        (ascending bits), so the LAST level whose bits fit wins."""
        self.max_level = -1
        self.min_level = 0
        for lv, bits in sorted(levels, key=lambda t: -t[0]):
            if bits <= self.min_res:
                self.max_level = lv
            if bits <= self.max_res:
                self.min_level = lv


@dataclass
class Rule:
    pred: object
    actions: list[Action] = field(default_factory=list)
    gtype: GType | None = None
    cont: bool = False
    with_actions: bool = False  # propagate actions on continue
    finalize: bool = False


# ------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<comment>\#[^\n]*)
  | (?P<fin><finalize>)
  | (?P<str>'[^']*'|"[^"]*")
  | (?P<op><=|>=|!=\*|!~|!=|=\*|=|<|>|~|&|\||!|\(|\)|\{|\}|\[|\]|;)
  | (?P<word>[^\s'"<>=!~&|(){}\[\];]+)
    """,
    re.VERBOSE,
)

_QUOTED = "\x00"  # marker prefix for quoted tokens


def _tokenize(src: str) -> list[str]:
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"rule syntax error at {src[i:i+30]!r}")
        i = m.end()
        g = m.lastgroup
        if g == "str":
            out.append(_QUOTED + m.group(g)[1:-1])
        elif g in ("op", "word", "fin"):
            out.append(m.group(g))
    return out


def _unquote(tok: str) -> str:
    return tok[1:] if tok.startswith(_QUOTED) else tok


def _is_quoted(tok: str) -> bool:
    return tok.startswith(_QUOTED)


# ------------------------------------------------- value template parser
_FILTER_SPLIT_PATTERNS = [
    # mirrors ValueBuilder.FILTER_ARG_PATTERNS (quoted arg first, then
    # anything up to '|', then bare command)
    re.compile(r'[ \t]*([^: \t|]+:"[^"]+")[ \t]*'),
    re.compile(r"[ \t]*([^: \t|]+:'[^']+')[ \t]*"),
    re.compile(r"[ \t]*([^: \t|]+:[^|]*)"),
    re.compile(r"[ \t]*([^: \t|]+)"),
]
_NAME_ARG_SPLIT = re.compile(r"([^:]+)(?::[\"']?(.*?)[\"']?)?", re.DOTALL)


def _parse_filters(s: str) -> list[tuple[str, str]]:
    filters = []
    start, end = 0, len(s)
    while start < end:
        m = None
        for p in _FILTER_SPLIT_PATTERNS:
            m = p.match(s, start, end)
            if m:
                break
        if not m:
            raise ValueError(f"bad filter spec {s!r}")
        start = m.end() + 1  # skip the '|'
        expr = m.group(1)
        nm = _NAME_ARG_SPLIT.fullmatch(expr)
        cmd = nm.group(1)
        arg = nm.group(2) if nm.group(2) is not None else ""
        if cmd not in VALID_FILTERS:
            raise ValueError(f"unknown value filter {cmd!r}")
        filters.append((cmd, arg))
    return filters


def parse_template(src: str) -> Template:
    """Compile a value template (ValueBuilder.compile:105-158 state
    machine): ``${tag|filters}`` element refs, ``$(tag|filters)`` local
    refs, everything else literal."""
    items: list[ValueItem] = []
    if "$" not in src:
        return Template([ValueItem(text=src)])
    state = "\0"
    text: list[str] = []
    ref: list[str] = []
    for c in src:
        if state == "\0":
            if c == "$":
                state = "$"
            else:
                text.append(c)
        elif state == "$":
            if c in "{(":
                if text:
                    items.append(ValueItem(text="".join(text)))
                    text = []
                ref = []
                state = "}" if c == "{" else ")"
            else:
                state = "\0"
                text.append("$")
                text.append(c)
        else:  # inside ${...} or $(...)
            if c == state:
                name = "".join(ref)
                local = state == ")"
                if "|" in name:
                    tagname, fspec = re.split(r"[ \t]*\|", name, maxsplit=1)
                    items.append(ValueItem(tag=tagname, local=local, filters=_parse_filters(fspec)))
                else:
                    items.append(ValueItem(tag=name, local=local))
                state = "\0"
            else:
                ref.append(c)
    if text:
        items.append(ValueItem(text="".join(text)))
    if not items:
        items = [ValueItem(text="")]
    return Template(items)


# --------------------------------------------------------------- parser
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

    def _dollar_ref(self, tok: str) -> str | None:
        """$word / ${word} tag reference; None if tok isn't one."""
        if _is_quoted(tok):
            return None
        if tok == "$" and self.peek() == "{":
            self.next()
            name = _unquote(self.next())
            self.expect("}")
            return name
        if tok.startswith("$") and len(tok) > 1:
            return tok[1:]
        return None

    def parse_atom(self):
        if self.peek() == "(":
            self.next()
            if self.peek() == ")":
                self.next()
                return TruePred()  # empty predicate: always true
            e = self.parse_or()
            self.expect(")")
            return e
        raw = self.next()
        ref = self._dollar_ref(raw)
        key = ref if ref is not None else _unquote(raw)
        if ref is None and self.peek() == "(":
            # style function atom (FunctionFactory.java:30-51)
            self.next()
            if key == "get_tag":
                # get_tag(x) is the internal plain-tag form
                key = _unquote(self.next())
            elif key not in STYLE_FUNCTIONS:
                raise ValueError(f"unknown style function {key!r}")
            else:
                key = f"fn:{key}"
            self.expect(")")
        op = self.next()
        if op == "=*":
            return Cond("exists", key)
        if op == "!=*":
            return Cond("not_exists", key)
        if op in ("=", "!=", "<", "<=", ">", ">=", "~", "!~"):
            vraw = self.next()
            vref = self._dollar_ref(vraw)
            if vref is not None:
                if op in ("~", "!~"):
                    raise ValueError("regex pattern must be a literal")
                return Cond(op, key, None, value_tag=vref)
            return Cond(op, key, _unquote(vraw))
        raise ValueError(f"bad predicate operator {op!r} after {key!r}")

    # ------------------------------------------------------- actions
    def _read_alternatives(self) -> list[Template]:
        """'|'-separated template alternatives (ActionReader.hasMoreWords)."""
        alts = [parse_template(_unquote(self.next()))]
        while self.peek() == "|":
            self.next()
            alts.append(parse_template(_unquote(self.next())))
        return alts

    def parse_actions(self) -> list[Action]:
        self.expect("{")
        acts: list[Action] = []
        while self.peek() not in ("}", None):
            kind = self.next()
            if kind == ";":
                continue
            if kind == "delete":
                acts.append(Action("delete", key=_unquote(self.next())))
            elif kind == "deletealltags":
                acts.append(Action("deletealltags"))
            elif kind == "rename":
                frm = _unquote(self.next())
                to = _unquote(self.next())
                acts.append(Action("rename", key=frm, to=to))
            elif kind in ("echo", "echotags"):
                acts.append(Action(kind, values=[parse_template(_unquote(self.next()))]))
            elif kind in ("name", "addlabel"):
                acts.append(Action(kind, values=self._read_alternatives()))
            elif kind in ("set", "add"):
                key = _unquote(self.next())
                self.expect("=")
                acts.append(Action(kind, key=key, values=self._read_alternatives()))
            elif kind in ("setaccess", "addaccess"):
                vals = self._read_alternatives()
                for t in vals:
                    if t.is_literal and template_to_string(t) not in _VALID_ACCESS:
                        raise ValueError(
                            f"expected yes/no for {kind}, got {template_to_string(t)!r}"
                        )
                acts.append(Action(kind, values=vals))
            elif kind in ("apply", "apply_once"):
                role = None
                if self.peek() == "role":
                    self.next()
                    self.expect("=")
                    role = _unquote(self.next())
                sub = self.parse_actions()
                acts.append(Action("apply", role=role, once=kind == "apply_once", sub=sub))
            else:
                raise ValueError(f"unsupported action {kind!r}")
        self.expect("}")
        return acts

    # --------------------------------------------------------- gtype
    def parse_gtype(self, levels: list[tuple[int, int]]) -> tuple[GType, bool, bool]:
        self.expect("[")
        code = self.next()
        type_code = int(code, 16) if code.lower().startswith("0x") else int(code)
        g = GType(type_code)
        cont = False
        propagate = True  # GType default: actions propagate unless 'continue'
        saw_res = False
        while self.peek() != "]":
            t = self.next()
            if t == "resolution":
                self._set_resolution(g, self.next())
                saw_res = True
            elif t == "level":
                # level N maps to the resolution of that level
                # (TypeReader.setLevel — "immediately converted to
                # resolution(s)" via the level->bits table)
                spec = self.next()
                parts = spec.split("-")
                bits = {lv: b for lv, b in levels}
                try:
                    if len(parts) == 2:
                        g.min_res = bits[int(parts[1])]
                        g.max_res = bits[int(parts[0])]
                        if g.min_res > g.max_res:
                            g.min_res, g.max_res = g.max_res, g.min_res
                    else:
                        g.min_res = bits[int(parts[0])]
                        g.max_res = 24
                except KeyError as e:
                    raise ValueError(f"level {e} not in levels table")
                saw_res = True
            elif t == "road_class":
                g.road_class = self._next_int_value()
            elif t == "road_speed":
                g.road_speed = self._next_int_value()
            elif t == "default_name":
                if self.peek() == "=":
                    self.next()
                g.default_name = _unquote(self.next())
            elif t == "continue":
                cont = True
                propagate = False  # TypeReader: continue defaults to no-propagate
            elif t in ("propagate", "with_actions", "withactions"):
                propagate = True
            elif t == "no_propagate":
                propagate = False
            elif t in ("copy", "oneway", "access"):
                pass  # reserved words, accepted and ignored (TypeReader)
            else:
                raise ValueError(f"unsupported type-def attribute {t!r}")
        self.expect("]")
        del saw_res
        g.fix_levels(levels)  # TypeReader.readType:95
        return g, cont, cont and propagate

    def _next_int_value(self) -> int:
        if self.peek() == "=":
            self.next()
        return int(_unquote(self.next()))

    def _set_resolution(self, g: GType, spec: str):
        # TypeReader.setResolution: single value sets the min only
        # (max stays 24); reversed ranges are swapped
        spec = _unquote(spec)
        if "-" in spec:
            a, b = (int(p) for p in spec.split("-", 1))
            if a > b:
                a, b = b, a
            g.min_res, g.max_res = a, b
        else:
            g.min_res = int(spec)
            g.max_res = 24


DEFAULT_LEVELS = [(0, 24), (1, 22), (2, 20), (3, 18), (4, 16)]


def parse_rule(src: str, levels: list[tuple[int, int]] | None = None) -> Rule:
    p = _P(_tokenize(src))
    r = _parse_single(p, levels or DEFAULT_LEVELS)
    if p.peek() is not None:
        raise ValueError(f"trailing tokens: {p.toks[p.i:]}")
    return r


def _parse_one_rule(p: _P, levels) -> list[Rule]:
    """One source rule; multiple TYPE-DEFs desugar into a continue
    chain (two-types1.test: ``expr [t1][t2]`` is short for
    ``expr [t1 continue]`` + ``expr [t2]``, actions on the first)."""
    pred = p.parse_or()
    actions: list[Action] = []
    gtypes: list[tuple] = []
    if p.peek() == "{":
        actions = p.parse_actions()
    while p.peek() == "[":
        gtypes.append(p.parse_gtype(levels))
    if not gtypes:
        return [Rule(pred, actions, None, False, False)]
    out = []
    for k, (g, cont, with_actions) in enumerate(gtypes):
        last = k == len(gtypes) - 1
        out.append(
            Rule(
                pred,
                actions if k == 0 else [],
                g,
                cont or not last,
                with_actions,
            )
        )
    return out


def _parse_single(p: _P, levels) -> Rule:
    rules = _parse_one_rule(p, levels)
    if len(rules) != 1:
        raise ValueError("parse_rule expects exactly one rule")
    return rules[0]


# StyleFunction.supportsNode/Way/Relation (osmstyle/function/*.java):
# which style functions are legal per rule-file kind.  POINT files only
# accept osmid()/type(); geometry functions raise the reference's
# SyntaxException ("testLengthInPoints").
FUNCTIONS_BY_KIND = {
    "point": {"fn:osmid", "fn:type"},
    "line": None,  # all
    "polygon": None,
    "relation": {"fn:osmid", "fn:type", "fn:length"},
}


def _validate_function_kinds(rules: list[Rule], kind: str):
    allowed = FUNCTIONS_BY_KIND.get(kind)
    if allowed is None:
        return

    def walk(p):
        if isinstance(p, Cond):
            for k in (p.key, p.value_tag):
                if k and k.startswith("fn:") and k not in allowed:
                    raise ValueError(
                        f"style function {k[3:]}() is not supported for {kind} rules"
                    )
        elif isinstance(p, Not):
            walk(p.child)
        elif isinstance(p, (And, Or)):
            walk(p.left)
            walk(p.right)

    for r in rules:
        walk(r.pred)


def parse_rules(
    src: str,
    resolver=None,
    levels: list[tuple[int, int]] | None = None,
    _ifcounter: list[int] | None = None,
    kind: str | None = None,
) -> list[Rule]:
    """Parse a rule file: a token stream of rules (rules may span
    lines); '#' comments; ``<finalize>`` marker; ``include``;
    ``if/else/end`` desugaring (RuleFileReader.readIf:215-248).
    ``kind`` ('point'|'line'|'polygon'|'relation') enables the
    per-FeatureKind style-function check of RuleFileReader."""
    levels = levels or DEFAULT_LEVELS
    counter = _ifcounter if _ifcounter is not None else [0]
    p = _P(_tokenize(src))
    rules: list[Rule] = []
    in_finalize = False
    if_stack: list[object] = []  # safe generated-tag predicates

    while p.peek() is not None:
        tok = p.peek()
        if tok == "<finalize>":
            p.next()
            in_finalize = True
            continue
        # ``include=yes`` etc. is a predicate on a tag literally named
        # "include" (RuleFileReader checks what follows the keyword)
        _next = p.toks[p.i + 1] if p.i + 1 < len(p.toks) else None
        if tok == "include" and _next not in ("=", "!=", "=*", "!=*", "<", "<=", ">", ">=", "~", "!~"):
            p.next()
            path = _unquote(p.next())
            from_style = None
            if p.peek() == "from":
                # ``include 'file' from stylename;`` pulls the file out
                # of ANOTHER style (RuleFileReader:176-189); resolvers
                # that support it take an optional second argument
                p.next()
                from_style = _unquote(p.next())
            if p.peek() == ";":
                p.next()
            if resolver is None:
                raise ValueError(f"include {path!r} found but no resolver given")
            src = resolver(path, from_style) if from_style is not None else resolver(path)
            sub = parse_rules(src, resolver=resolver, levels=levels, _ifcounter=counter)
            for r in sub:
                r.finalize = r.finalize or in_finalize
                for ctx in if_stack:
                    r.pred = And(ctx, r.pred)
            rules.extend(sub)
            continue
        if tok == "if" and p.toks[p.i + 1 : p.i + 2] == ["("]:
            p.next()
            p.expect("(")
            expr = p.parse_or()
            p.expect(")")
            p.expect("then")
            counter[0] += 1
            if_var = f"mkgmap:gen:if:{counter[0]}"
            # hidden rule: expr { set if_var=true } — freezes the if
            # result at its declaration point (the reference's "safe"
            # form, RuleFileReader.readIf)
            hidden = Rule(expr, [Action("set", key=if_var, values=[parse_template("true")])])
            hidden.finalize = in_finalize
            for ctx in if_stack:
                hidden.pred = And(ctx, hidden.pred)
            rules.append(hidden)
            if_stack.append(Cond("=", if_var, "true"))
            continue
        if tok == "else" and if_stack:
            p.next()
            if_stack.append(Not(if_stack.pop()))
            continue
        if tok == "end" and if_stack:
            p.next()
            if_stack.pop()
            continue
        for r in _parse_one_rule(p, levels):
            r.finalize = in_finalize
            if r.finalize and r.gtype is not None:
                raise ValueError("finalize rules must not contain an element type definition")
            for ctx in if_stack:
                r.pred = And(ctx, r.pred)
            rules.append(r)
    if kind is not None:
        _validate_function_kinds(rules, kind)
    return rules


def parse_rule_files(sources: list[str], resolver=None) -> list[Rule]:
    """Include/overlay merge: later files append at lower priority
    (RuleSet.merge:154-173 — concatenation in declaration order).
    Finalize rules keep their flag across the merge."""
    out: list[Rule] = []
    counter = [0]
    for src in sources:
        out.extend(parse_rules(src, resolver=resolver, _ifcounter=counter))
    return out


def used_tags(rules: list[Rule]) -> set[str]:
    """Tags READ by a rule list (RuleSet.getUsedTags) — the scan-side
    prune set: predicate keys and $tag refs, template tag refs in
    action values, and rename sources.  Style-function pseudo-keys
    (fn:*) and internal generated tags (mkgmap:gen:*) are excluded —
    neither exists in the input tag table."""
    out: set[str] = set()

    def add(key: str | None):
        if key and not key.startswith("fn:") and not key.startswith("mkgmap:gen:"):
            out.add(key)

    def walk_pred(p):
        if isinstance(p, Cond):
            add(p.key)
            add(p.value_tag)
        elif isinstance(p, Not):
            walk_pred(p.child)
        elif isinstance(p, (And, Or)):
            walk_pred(p.left)
            walk_pred(p.right)

    def walk_template(t: Template):
        for it in t.items:
            if it.tag is not None:
                add(it.tag)

    def walk_action(a: Action):
        for t in a.values:
            walk_template(t)
        if a.kind == "rename":
            add(a.key)
        for s in a.sub:
            walk_action(s)

    for r in rules:
        walk_pred(r.pred)
        for a in r.actions:
            walk_action(a)
    return out
