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
- input text is encoded to the table's 8-bit codepage first with '?'
  replacing unmappable characters (Sort.createSortKey:252-258).

The engine emits the key as FIXED-WIDTH HEX text (4 hex digits per
primary weight, 2 per secondary/tertiary, sections joined by '-',
which sorts below '0'): binary-comparable in any engine, so the DuckDB
oracle can rebuild the identical key with a weight VALUES table
(``oracle_weight_rows``).
"""

from __future__ import annotations

import os
from functools import lru_cache

import pandas as pd

_DATA = os.path.join(os.path.dirname(__file__), os.pardir, "data")


class SrtTable:
    """Parsed sort description for one 8-bit codepage."""

    def __init__(self, codepage: int):
        self.codepage = codepage
        self.encoding = f"cp{codepage}" if codepage != 65001 else "utf-8"
        # per codepage byte value 0..255
        self.primary = [0] * 256
        self.secondary = [0] * 256
        self.tertiary = [0] * 256
        self.expansion_of: dict[int, tuple[int, int]] = {}  # byte -> (idx0, n)
        self.expansions: list[tuple[int, int, int]] = []  # (p, s, t)

    def _byte_of(self, token: str) -> int | None:
        """Codepage byte value of a token (literal char or hex code
        point), None when unmappable (SrtTextReader.Code)."""
        ch = chr(int(token, 16)) if len(token) > 1 else token
        try:
            enc = ch.encode(self.encoding)
        except UnicodeEncodeError:
            return None
        return enc[0] if len(enc) == 1 else None

    def weights_of_byte(self, b: int) -> list[tuple[int, int, int]]:
        """Weight triples a byte contributes to the key (1 normally,
        n for an expansion char)."""
        if b in self.expansion_of:
            idx0, n = self.expansion_of[b]
            return self.expansions[idx0 : idx0 + n]
        return [(self.primary[b], self.secondary[b], self.tertiary[b])]

    def _trans_maps(self):
        """str.translate tables (unicode codepoint -> hex weight
        string, '' for zero-skip, multi-entry for expansions): the
        whole key renders with three C-speed translate calls."""
        if getattr(self, "_tmaps", None) is None:
            tp: dict[int, str] = {}
            ts: dict[int, str] = {}
            tt: dict[int, str] = {}
            for b in range(256):
                try:
                    cp = ord(bytes([b]).decode(self.encoding))
                except UnicodeDecodeError:
                    continue
                trips = self.weights_of_byte(b)
                tp[cp] = "".join(f"{p:04X}" for p, _, _ in trips if p != 0)
                ts[cp] = "".join(f"{s:02X}" for _, s, _ in trips if s != 0)
                tt[cp] = "".join(f"{t:02X}" for _, _, t in trips if t != 0)
            self._tmaps = (tp, ts, tt)
        return self._tmaps

    def sort_key_hex(self, text: str) -> str:
        """Fixed-width-hex rendering of the 3-section Garmin sort key."""
        # normalize into the codepage's character set first ('?' for
        # unmappables, the codepage-encoder replacement)
        norm = text.encode(self.encoding, errors="replace").decode(self.encoding)
        tp, ts, tt = self._trans_maps()
        return f"{norm.translate(tp)}-{norm.translate(ts)}-{norm.translate(tt)}"

    def oracle_weight_rows(self) -> list[tuple[int, int, int, int, int]]:
        """(unicode_codepoint, seq, primary, secondary, tertiary) rows
        for rebuilding keys in SQL: one row per weight triple a
        character contributes, seq preserving expansion order."""
        rows = []
        for b in range(256):
            try:
                cp = ord(bytes([b]).decode(self.encoding))
            except UnicodeDecodeError:
                continue
            for seq, (p, s, t) in enumerate(self.weights_of_byte(b)):
                rows.append((cp, seq, p, s, t))
        return rows


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
            elif tok in ("id1", "id2", "description"):
                while toks[i] == "\n":
                    i += 1
                i += 1  # value ignored (binary header metadata)
            elif tok in ("characters", "code"):
                state = "chars"
            elif tok == "expand":
                state = "expand_char"
        elif state == "chars":
            assert table is not None
            if tok in ("characters", "code"):
                advance()
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
                b = table._byte_of(tok)
                if b is not None:
                    table.primary[b] = pos1
                    table.secondary[b] = pos2
                    table.tertiary[b] = pos3
        elif state == "expand_char":
            assert table is not None
            exp_byte = table._byte_of(tok)
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
                tb = table._byte_of(t)
                if tb is None:
                    continue
                table.expansions.append(
                    (
                        table.primary[tb],
                        (table.secondary[tb] + 7) & 0xFF,
                        (table.tertiary[tb] + 2) & 0xFF,
                    )
                )
            if exp_byte is not None:
                table.expansion_of[exp_byte] = (idx0, len(table.expansions) - idx0)
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
