"""Style DIRECTORY loading — the reference's full style bundle.

Reference: osmstyle/StyleImpl.java:140-165 — a style is a directory of
files read in a fixed order: ``version``, ``info``, ``options`` (the
``levels`` / ``overview-levels`` / ``extra-used-tags`` general
options, Options key=value grammar incl. the ``key { ... }`` braces
form), ``overlays`` (OverlayReader.java: ``0xAAA: 0x1, 0x2`` type
replacement lists), then the rule files ``relations``, ``points``,
``lines``, ``polygons`` (each optional, RuleFileReader per feature
kind with the style's level list).

Overlay semantics (OverlayReader.addLine:104-124): an emitted LINE
whose type appears in the overlay map becomes SEVERAL lines, one per
replacement type; the first copy keeps its routing attributes, the
rest are plain lines ("Force all following types to be added as lines
rather than roads").  :func:`apply_line_overlays` re-expresses that as
a flatten(transform(...)) over the compiled ``results`` array — pure
Column work, no Python in the row path.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parser import DEFAULT_LEVELS, Rule, parse_rules

RULE_FILES = ("relations", "points", "lines", "polygons")


@dataclass
class Style:
    name: str
    info: dict[str, str]
    options: dict[str, str]
    levels: list[tuple[int, int]]
    overview_levels: list[tuple[int, int]] | None
    extra_used_tags: set[str]
    overlays: dict[int, list[int]]
    rules: dict[str, list[Rule]] = field(default_factory=dict)


def parse_level_spec(spec: str) -> list[tuple[int, int]]:
    """LevelInfo.createFromString:57-82: comma/space-separated
    ``level:bits`` (or ``level=bits``) pairs, both range-checked."""
    out: list[tuple[int, int]] = []
    for part in re.split(r"[,\s]+", spec.strip()):
        if not part:
            continue
        kv = re.split(r"[=:]", part)
        if len(kv) < 2:
            raise ValueError(f"incorrect level specification {spec!r}")
        level, bits = int(kv[0]), int(kv[1])
        if not (0 <= level <= 16):
            raise ValueError(f"level out of range 0-16: {part}")
        if not (0 <= bits <= 24):
            raise ValueError(f"resolution out of range 0-24: {part}")
        out.append((level, bits))
    return out


def parse_options(text: str) -> dict[str, str]:
    """The Options grammar subset styles use: ``key = value`` lines,
    ``key { multi-line value }`` braces form, '#' comments."""
    out: dict[str, str] = {}
    key_brace: str | None = None
    buf: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if key_brace is not None:
            if line.strip() == "}":
                out[key_brace] = " ".join(x.strip() for x in buf if x.strip())
                key_brace, buf = None, []
            else:
                buf.append(line)
            continue
        s = line.strip()
        if not s:
            continue
        m = re.match(r"^([\w.-]+)\s*\{\s*$", s)
        if m:
            key_brace = m.group(1)
            continue
        # info files use both `key=value` and `key: value`
        # (StyleInfo via the Options reader accepts either separator)
        sep = min(
            (i for i in (s.find("="), s.find(":")) if i >= 0), default=-1
        )
        if sep >= 0:
            out[s[:sep].strip()] = s[sep + 1 :].strip()
        else:
            out[s] = ""
    return out


def _decode_int(s: str) -> int:
    """Java Integer.decode: 0x/0X/# prefix = hex, leading 0 = octal,
    else decimal (with optional sign) — NOT Python's int(s, 0), which
    rejects '#1f' and leading-zero decimals."""
    s = s.strip()
    sign = 1
    if s[:1] in "+-":
        sign = -1 if s[0] == "-" else 1
        s = s[1:]
    if s.lower().startswith("0x"):
        return sign * int(s[2:], 16)
    if s.startswith("#"):
        return sign * int(s[1:], 16)
    if len(s) > 1 and s.startswith("0"):
        return sign * int(s, 8)
    return sign * int(s, 10)


def parse_overlays(text: str) -> dict[int, list[int]]:
    """OverlayReader.readOverlays:40-60: ``type: t1, t2, ...`` lines,
    all integers in Java Integer.decode notation."""
    out: dict[int, list[int]] = {}
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        left, right = line.split(":", 1)
        repl = [_decode_int(x) for x in right.split(",") if x.strip()]
        if repl:
            out[_decode_int(left)] = repl
    return out


def load_style(base: str, name: str | None = None) -> Style:
    """Load a style directory the way StyleImpl.readRules does: merged
    main + overview levels feed every rule file's TYPE-DEF resolution;
    missing rule files are fine (":it is ok for this file to not
    exist")."""

    def read(fname: str) -> str | None:
        p = os.path.join(base, fname)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as fh:
            return fh.read()

    def resolver(pth: str, from_style: str | None = None) -> str:
        if from_style is not None:
            # ``include 'file' from style;`` — the sibling style next
            # to this one (StyleImpl resolves against the style base)
            p = os.path.join(os.path.dirname(base.rstrip("/")), from_style, pth)
            if os.path.exists(p):
                with open(p, encoding="utf-8") as fh:
                    return fh.read()
            return ""
        return read(pth) or ""

    # StyleImpl reads `version` first and rejects directories without
    # one ("Not a style file") — the guard that catches a typo'd style
    # path before it silently yields an empty ruleset
    if read("version") is None:
        raise ValueError(f"not a style directory (no version file): {base}")

    info_txt = read("info") or ""
    info = parse_options(info_txt)

    # base-style derivation (StyleImpl:144-163): every `base-style:`
    # line in info names a base loaded RECURSIVELY from the sibling
    # directory; base options merge in before this style's own
    # (mergeOptions before readOptions), and base rules append AFTER
    # this style's rules in REVERSE declaration order — later-declared
    # bases take priority, the first base comes last.
    base_names = re.findall(r"^[ \t]*base-style[ \t]*[:=][ \t]*(\S+)", info_txt, re.M)
    base_styles = [
        load_style(os.path.join(os.path.dirname(base.rstrip("/")), bn), bn)
        for bn in base_names
    ]

    options: dict[str, str] = {}
    for bs in base_styles:
        options.update(bs.options)
    options.update(parse_options(read("options") or ""))

    levels = (
        parse_level_spec(options["levels"]) if options.get("levels") else list(DEFAULT_LEVELS)
    )
    ov = None
    merged = list(levels)
    if options.get("overview-levels"):
        ov = parse_level_spec(options["overview-levels"])
        merged = sorted(set(levels) | set(ov))
    extra = {
        t for t in re.split(r"[,\s]+", options.get("extra-used-tags", "")) if t
    }
    overlays = parse_overlays(read("overlays") or "")

    rules: dict[str, list[Rule]] = {}
    for fname in RULE_FILES:
        src = read(fname)
        if src is None:
            continue
        rules[fname] = parse_rules(
            src,
            resolver=resolver,
            levels=merged,
            # per-file FeatureKind style-function check (RuleFileReader:
            # points files reject geometry functions like length())
            kind={"points": "point", "lines": "line", "polygons": "polygon",
                  "relations": "relation"}.get(fname),
        )

    for bs in reversed(base_styles):
        for fname, rl in bs.rules.items():
            rules.setdefault(fname, []).extend(rl)

    return Style(
        name=name or os.path.basename(base.rstrip("/")),
        info=info,
        options=options,
        levels=levels,
        overview_levels=ov,
        extra_used_tags=extra,
        overlays=overlays,
        rules=rules,
    )


def apply_line_overlays(compiled: DataFrame, overlays: dict[int, list[int]]) -> DataFrame:
    """Expand overlaid line types in the compiled ``results`` column.

    Each result whose type_code has an overlay entry becomes one
    result per replacement type; replacement 0 keeps road_class/
    road_speed, the rest become plain lines (OverlayReader.addLine
    :114-120).  No-op (same df) when the overlay map is empty."""
    if not overlays:
        return compiled
    m = F.create_map(
        *[
            x
            for k, repl in sorted(overlays.items())
            for x in (F.lit(k), F.array(*[F.lit(t) for t in repl]))
        ]
    )
    expanded = F.flatten(
        F.transform(
            F.col("results"),
            lambda r: F.coalesce(
                F.transform(
                    m[r.getField("type_code")],
                    lambda t, i: F.struct(
                        t.alias("type_code"),
                        r.getField("min_res").alias("min_res"),
                        r.getField("max_res").alias("max_res"),
                        r.getField("rule_idx").alias("rule_idx"),
                        F.when(i == 0, r.getField("road_class")).alias("road_class"),
                        F.when(i == 0, r.getField("road_speed")).alias("road_speed"),
                        r.getField("default_name").alias("default_name"),
                    ),
                ),
                F.array(r),
            ),
        )
    )
    return compiled.withColumn("results", expanded)
