"""Regenerate the transliteration data tables from the reference's
character rows (resources/chars/{ascii,latin1}/rowXX.trans, read by
imgfmt/app/labelenc/TableTransliterator.java:94-152).

The rows files are DATA, not code — per their own headers they were
"Created with the Text::Unidecode module of perl" (public CPAN data).
Loading applies the reference's exact merge rules: comment/short lines
skipped, '?' translations skipped (that's the default), first writer
wins within a charset.

Output: mkgmap_spark/data/translit_{ascii,latin1}.tsv with lines
"<4-hex-codepoint>\t<translation>", sorted by codepoint.  Committed so
the repo stands alone; rerun this script only to refresh from a new
reference checkout.
"""

from __future__ import annotations

import glob
import os
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "mkgmap_spark", "data")


def load(charset: str) -> dict[int, str]:
    table: dict[int, str] = {}
    for f in sorted(glob.glob(f"{REF}/resources/chars/{charset}/*.trans")):
        for line in open(f, encoding="utf-8", errors="replace"):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            fields = line.split()
            if len(fields) < 2 or fields[1] == "?":
                continue
            u = fields[0]
            if len(u) != 6 or not u.startswith("U"):
                continue
            cp = int(u[2:], 16)
            if cp not in table:
                table[cp] = fields[1]
    return table


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for charset in ("ascii", "latin1"):
        t = load(charset)
        path = os.path.join(OUT, f"translit_{charset}.tsv")
        with open(path, "w", encoding="utf-8") as fh:
            for cp in sorted(t):
                fh.write(f"{cp:04x}\t{t[cp]}\n")
        print(f"{path}: {len(t)} entries")


if __name__ == "__main__":
    main()
