"""Garmin SRT multi-level collation (MDR / index sort order).

Reference: the reference sorts every index (MDR, MDX, labels) with a
three-strength collation table read from a text sort description
(mkgmap/srt/SrtTextReader.java; default table resources/sort/cp1252.txt,
selected by Main.getSort:746).  A sort key is the concatenation of the
PRIMARY weights (2 bytes each, zero-weight chars skipped) terminated by
two zero bytes, then the SECONDARY weights (1 byte, zero-skip, one zero
terminator), then TERTIARY likewise (imgfmt/app/srt/Sort.java:355-431
makeKey/fillKey, Page.writePos:681-690).

Parser semantics carried over from SrtTextReader.characterState:
- tokens in the ``characters`` section are single literal characters or
  multi-char hex code points; ``=`` keeps the current position, ``,``
  bumps tertiary, ``;`` bumps secondary (tertiary resets to 1), ``<``
  advances primary BY THE SECONDARY COUNT of the previous group
  (advancePos:436-443) with secondary/tertiary reset to 1;
- ``expand C to a b c`` (expandState:305-372, non-experimental path)
  stores per-expanded-char positions (primary = target's primary,
  secondary = target's + 7, tertiary = target's + 2) and redirects C's
  primary to a 1-based index into the expansion list; key generation
  follows the redirect (Sort.fillKey:412-424);
- single-byte tables (cp1250..cp1258): input text is encoded to the
  table's 8-bit codepage first with '?' replacing unmappable
  characters (Sort.createSortKey:252-258);
- the ``multi`` keyword (cp65001) switches to the PAGED-WEIGHT path
  (Sort.java pages[ch >>> 8], SrtTextReader "multi":210-212): weights
  are keyed by UNICODE CODE POINT, no codepage encode happens
  (Sort.createSortKey:215-216 uses toCharArray directly), and a
  character with no page / no weights contributes NOTHING to the key
  at every strength (fillKey:405-406 hasPage skip + writePos zero
  skip) instead of degrading to '?'.

The engine emits the key as FIXED-WIDTH HEX text (4 hex digits per
primary weight, 2 per secondary/tertiary, sections joined by '-',
which sorts below '0'): binary-comparable in any engine, so the DuckDB
oracle can rebuild the identical key with a weight VALUES table
(``oracle_weight_rows``).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

import pandas as pd

_DATA = os.path.join(os.path.dirname(__file__), os.pardir, "data")


class SrtTable:
    """Parsed sort description.  Weights are keyed by "unit": the
    codepage byte value for single-byte tables, the unicode code point
    for ``multi`` tables (the paged-weight model of Sort.java collapses
    to a flat dict — pages[ch >>> 8][ch & 0xff] == dict[ch])."""

    def __init__(self, codepage: int):
        self.codepage = codepage
        self.multi = False
        self.encoding = f"cp{codepage}" if codepage != 65001 else "utf-8"
        self.primary: dict[int, int] = {}
        self.secondary: dict[int, int] = {}
        self.tertiary: dict[int, int] = {}
        self.expansion_of: dict[int, tuple[int, int]] = {}  # unit -> (idx0, n)
        self.expansions: list[tuple[int, int, int]] = []  # (p, s, t)

    def _unit_of(self, token: str) -> int | None:
        """Weight-table unit of a token (literal char or hex code
        point): the codepage byte for single-byte tables, the code
        point itself for multi (SrtTextReader.Code.read:516-536),
        None when unmappable."""
        cp = int(token, 16) if len(token) > 1 else ord(token)
        if self.multi:
            return cp
        try:
            enc = chr(cp).encode(self.encoding)
        except UnicodeEncodeError:
            return None
        return enc[0] if len(enc) == 1 else None

    def weights_of_unit(self, u: int) -> list[tuple[int, int, int]]:
        """Weight triples a unit contributes to the key (1 normally,
        n for an expansion char)."""
        if u in self.expansion_of:
            idx0, n = self.expansion_of[u]
            return self.expansions[idx0 : idx0 + n]
        return [(self.primary.get(u, 0), self.secondary.get(u, 0), self.tertiary.get(u, 0))]

    # back-compat name (single-byte tables: unit == codepage byte)
    weights_of_byte = weights_of_unit

    def _defined_units(self) -> list[int]:
        units = set(self.primary) | set(self.secondary) | set(self.tertiary)
        units |= set(self.expansion_of)
        return sorted(units)

    def _trans_maps(self):
        """str.translate tables (unicode codepoint -> hex weight
        string, '' for zero-skip, multi-entry for expansions): the
        whole key renders with three C-speed translate calls.  For
        multi tables a precompiled regex first DELETES undefined
        characters (the reference skips them at every strength)."""
        if getattr(self, "_tmaps", None) is None:
            tp: dict[int, str] = {}
            ts: dict[int, str] = {}
            tt: dict[int, str] = {}
            cps: list[int] = []
            for u in self._defined_units() if self.multi else range(256):
                if self.multi:
                    cp = u
                else:
                    try:
                        cp = ord(bytes([u]).decode(self.encoding))
                    except UnicodeDecodeError:
                        continue
                trips = self.weights_of_unit(u)
                tp[cp] = "".join(f"{p:04X}" for p, _, _ in trips if p != 0)
                ts[cp] = "".join(f"{s:02X}" for _, s, _ in trips if s != 0)
                tt[cp] = "".join(f"{t:02X}" for _, _, t in trips if t != 0)
                cps.append(cp)
            strip = None
            if self.multi:
                cls = "".join(
                    re.escape(chr(a)) + ("-" + re.escape(chr(b)) if b > a else "")
                    for a, b in _ranges(cps)
                )
                strip = re.compile(f"[^{cls}]")
            self._tmaps = (tp, ts, tt, strip)
        return self._tmaps

    def sort_key_hex(self, text: str) -> str:
        """Fixed-width-hex rendering of the 3-section Garmin sort key."""
        tp, ts, tt, strip = self._trans_maps()
        if self.multi:
            # paged path: undefined characters contribute nothing
            norm = strip.sub("", text)
        else:
            # normalize into the codepage's character set first ('?'
            # for unmappables, the codepage-encoder replacement)
            norm = text.encode(self.encoding, errors="replace").decode(self.encoding)
        return f"{norm.translate(tp)}-{norm.translate(ts)}-{norm.translate(tt)}"

    def oracle_weight_rows(self, restrict: set[int] | None = None):
        """(unicode_codepoint, seq, primary, secondary, tertiary) rows
        for rebuilding keys in SQL: one row per weight triple a
        character contributes, seq preserving expansion order.
        ``restrict`` (multi tables) limits rows to the given code
        points so an 11k-entry unicode table doesn't become a megabyte
        of VALUES when the query's alphabet is known."""
        rows = []
        for u in self._defined_units() if self.multi else range(256):
            if self.multi:
                cp = u
                if restrict is not None and cp not in restrict:
                    continue
            else:
                try:
                    cp = ord(bytes([u]).decode(self.encoding))
                except UnicodeDecodeError:
                    continue
            for seq, (p, s, t) in enumerate(self.weights_of_unit(u)):
                rows.append((cp, seq, p, s, t))
        return rows


def _ranges(cps: list[int]):
    """Collapse a sorted code-point list into (lo, hi) runs for a
    compact regex character class."""
    out: list[tuple[int, int]] = []
    for cp in sorted(cps):
        if out and cp == out[-1][1] + 1:
            out[-1] = (out[-1][0], cp)
        else:
            out.append((cp, cp))
    return out


def _tokenize(line: str) -> list[str]:
    """SrtTextReader-style tokens: runs of word chars are one token
    (hex or multi-digit literals), symbols are single tokens."""
    out: list[str] = []
    word = ""
    for ch in line:
        if ch.isspace():
            if word:
                out.append(word)
                word = ""
        elif ch.isalnum():
            word += ch
        else:
            if word:
                out.append(word)
                word = ""
            out.append(ch)
    if word:
        out.append(word)
    return out


def parse_srt(text: str) -> SrtTable:
    """Parse the sort description text format (SrtTextReader)."""
    table: SrtTable | None = None
    state = "initial"
    pos1 = pos2 = pos3 = 0
    lines = []
    for raw in text.splitlines():
        hash_at = raw.find("#")
        if hash_at >= 0:
            raw = raw[:hash_at]
        if raw.strip():
            lines.append(raw)

    def advance():
        nonlocal pos1, pos2, pos3
        pos1 = 1 if pos1 == 0 else pos1 + pos2
        pos2 = 1
        pos3 = 1

    i = 0
    toks: list[str] = []
    for ln in lines:
        toks.extend(_tokenize(ln) + ["\n"])
    while i < len(toks):
        tok = toks[i]
        i += 1
        if tok == "\n":
            continue
        if state == "initial":
            if tok == "codepage":
                while toks[i] == "\n":
                    i += 1
                table = SrtTable(int(toks[i]))
                i += 1
            elif tok == "multi":
                assert table is not None, "multi before codepage"
                table.multi = True
            elif tok in ("id1", "id2", "description"):
                while toks[i] == "\n":
                    i += 1
                i += 1  # value ignored (binary header metadata)
                # a quoted description is several tokens: skip to EOL
                if toks[i - 1] in ("\"", "'"):
                    while toks[i] != "\n":
                        i += 1
            elif tok in ("characters", "code"):
                state = "chars"
            elif tok == "expand":
                state = "expand_char"
        elif state == "chars":
            assert table is not None
            if tok in ("characters", "code"):
                advance()
            elif tok in ("pos", "pos2", "pos3"):
                # explicit position overrides (SrtTextReader
                # characterState "pos"/"pos2"/"pos3": validateNext("=")
                # then Integer.decode — 0x-prefixed hex or decimal)
                assert toks[i] == "=", toks[i]
                i += 1
                val = toks[i]
                i += 1
                n = int(val, 0)
                if tok == "pos":
                    pos1 = n
                elif tok == "pos2":
                    pos2 = n
                else:
                    pos3 = n
            elif tok == "flags":
                # per-character kind flags (letter/digit) — consumed
                # but unused: the engine models only weights+expansions
                assert toks[i] == "=", toks[i]
                i += 2
            elif tok == "expand":
                state = "expand_char"
            elif tok == "=":
                pass
            elif tok == ",":
                pos3 += 1
            elif tok == ";":
                pos2 += 1
                pos3 = 1
            elif tok == "<":
                advance()
            else:
                u = table._unit_of(tok)
                if u is not None:
                    table.primary[u] = pos1
                    table.secondary[u] = pos2
                    table.tertiary[u] = pos3
        elif state == "expand_char":
            assert table is not None
            exp_unit = table._unit_of(tok)
            # consume 'to'
            while toks[i] == "\n":
                i += 1
            assert toks[i] == "to", toks[i]
            i += 1
            targets = []
            while i < len(toks) and toks[i] != "\n":
                targets.append(toks[i])
                i += 1
            idx0 = len(table.expansions)
            for t in targets:
                tu = table._unit_of(t)
                if tu is None:
                    continue
                table.expansions.append(
                    (
                        table.primary.get(tu, 0),
                        (table.secondary.get(tu, 0) + 7) & 0xFF,
                        (table.tertiary.get(tu, 0) + 2) & 0xFF,
                    )
                )
            if exp_unit is not None:
                table.expansion_of[exp_unit] = (idx0, len(table.expansions) - idx0)
            state = "chars"
    assert table is not None, "no codepage declaration"
    return table


@lru_cache(maxsize=None)
def default_table(codepage: int = 1252) -> SrtTable:
    with open(os.path.join(_DATA, f"sort_cp{codepage}.txt"), encoding="utf-8") as f:
        return parse_srt(f.read())


def collation_key_udf(codepage: int = 1252):
    """Arrow-batched pandas UDF: name string -> fixed-width-hex sort
    key (see module docstring for the format)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _key(s: pd.Series) -> pd.Series:
        table = default_table(codepage)
        return s.map(lambda v: None if v is None else table.sort_key_hex(v))

    return _key
