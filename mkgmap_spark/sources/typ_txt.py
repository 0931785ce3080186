"""TYP text-file source (the typ-compiler front end).

Reference: mkgmap/typ/TypTextReader.java + section processors
(IdSection, DrawOrderSection, PointSection, LineSection,
PolygonSection, CommonSection) and imgfmt/app/typ/TypLabel.java.  A
``typ.txt`` file is a sectioned key=value format describing custom
Garmin rendering: ``[_id]`` family/product/codepage, ``[_draworder]``
polygon stacking levels, and ``[_point]/[_line]/[_polygon]`` elements
carrying type codes, per-language labels, font styles, custom colours
and XPM-like images (with TYP extensions: alpha=/canalalpha= on colour
lines, Colormode= on the header).  The binary TYP writer itself is out
of scope (imgfmt), but the text grammar and its decode rules are the
user-facing surface ported here:

- ``Type`` >= 0x100 splits into (type = v >> 8, subtype = v & 0xff)
  (CommonSection.commonKey:54-66); draw-order types additionally mask
  the type to 14 bits (DrawOrderSection:51-56).
- ``StringN=0xLL,text`` labels decode the language code, falling back
  to lang 0 with the whole value as text (TypLabel.java:22-35).
- FontStyle: NoLabel=1 Small(Font)=2 Normal(Font)=3 Large(Font)=4
  Default=0 (CommonSection.decodeFontStyle).
- alpha: stored as 255 - (a<<4 | a) in rgba form
  (CommonSection.readExtraColourInfo).
- Unknown sections are ignored whole; ``[end]`` is case-insensitive.

``read_typ`` lifts parsed elements into a DataFrame (one row per
element) for joins against styled features — file-level parallelism
like the other text sources.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FONT_STYLES = {
    "nolabel": 1,
    "smallfont": 2, "small": 2,
    "normalfont": 3, "normal": 3,
    "largefont": 4, "large": 4,
    "default": 0,
}

_SECTION_RE = re.compile(r"^\s*\[\s*([^\]]+?)\s*\]\s*$")
_KV_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*[=:]\s*(.*)$")
_QUOTED_RE = re.compile(r'^\s*"(.*)"\s*(.*)$')
_ALPHA_RE = re.compile(r"\b\w*alpha\s*=\s*(\S+)", re.IGNORECASE)
_COLORMODE_RE = re.compile(r"colormode\s*=\s*(\S+)", re.IGNORECASE)


def decode_font_style(value: str) -> int:
    v = value.strip()
    if v.startswith("NoLabel"):
        return 1
    return FONT_STYLES.get(v.lower(), 0)


def decode_label(value: str) -> tuple[int, str]:
    """TypLabel: '0xLL,text' -> (lang, text); bad number -> (0, whole)."""
    parts = value.split(",", 1)
    try:
        return int(parts[0], 0), parts[1]
    except (ValueError, IndexError):
        return 0, value


def decode_type(value: str) -> tuple[int, int]:
    """(type, subtype) from a full type number (commonKey)."""
    ival = int(value, 0)
    if ival >= 0x100:
        return ival >> 8, ival & 0xFF
    return ival & 0xFF, 0


def decode_draworder_type(value: str) -> tuple[int, int]:
    """Draw-order full types mask the type to 14 bits."""
    ival = int(value, 0)
    if ival >= 0x100:
        return (ival >> 8) & 0x3FFF, ival & 0xFF
    return ival & 0xFF, 0


def decode_alpha(aval: str) -> int:
    """alpha=N (0..15) -> rgba alpha 255 - (N<<4 | N)."""
    a = int(aval, 0)
    return 255 - ((a << 4) + a)


def _new_element() -> dict:
    return {
        "type": None,
        "subtype": 0,
        "labels": [],
        "font_style": 0,
        "day_custom_color": None,
        "night_custom_color": None,
        "use_orientation": None,
        "line_width": None,
        "border_width": None,
        "xpms": {},
    }


class _XpmState:
    """Consumes the quoted lines following an Xpm= header: ncolors
    colour lines, then height pixel rows when width > 0."""

    def __init__(self, header_value: str):
        m = _QUOTED_RE.match(header_value)
        if not m:
            raise ValueError(f"bad Xpm header: {header_value!r}")
        nums = m.group(1).split()
        self.xpm = {
            "width": int(nums[0]),
            "height": int(nums[1]),
            "ncolors": int(nums[2]),
            "cpp": int(nums[3]),
            "colormode": 0,
            "colors": [],
            "pixels": [],
        }
        cm = _COLORMODE_RE.search(m.group(2))
        if cm:
            self.xpm["colormode"] = int(cm.group(1), 0)

    def feed(self, line: str) -> bool:
        """Consume one line; True while more lines belong to the xpm."""
        m = _QUOTED_RE.match(line)
        if not m:
            raise ValueError(f"expected quoted xpm line: {line!r}")
        body, rest = m.group(1), m.group(2)
        x = self.xpm
        if len(x["colors"]) < x["ncolors"]:
            cpp = x["cpp"]
            if cpp > 0:
                tag, spec = body[:cpp], body[cpp:].strip()
                sm = re.match(r"^c\s+(\S+)$", spec)
            else:
                # colours-only palette (cpp 0, e.g. "0 0 2 0"): the tag
                # token is untracked — optional leading token, then
                # 'c <colour>'
                sm = re.match(r"^(?:(\S+)\s+)?c\s+(\S+)$", body.strip())
                tag = (sm.group(1) or "") if sm else ""
            if not sm:
                raise ValueError(f"unrecognised colour line: {body!r}")
            colour = sm.group(2) if cpp == 0 else sm.group(1)
            entry = {"tag": tag, "rgb": None, "alpha": None}
            if colour.startswith("#"):
                entry["rgb"] = colour.upper()
            elif colour.lower() == "none":
                entry["rgb"] = None  # transparent
            else:
                raise ValueError(f"unrecognised colour: {colour!r}")
            am = _ALPHA_RE.search(rest)
            if am:
                entry["alpha"] = decode_alpha(am.group(1))
            x["colors"].append(entry)
        else:
            x["pixels"].append(body)
        if len(x["colors"]) < x["ncolors"]:
            return True
        want_rows = x["height"] if x["width"] > 0 else 0
        return len(x["pixels"]) < want_rows


def parse_typ(text: str) -> dict:
    """One typ.txt document -> {fid, product_code, codepage, draworder,
    points, lines, polygons}."""
    out = {
        "fid": None,
        "product_code": None,
        "codepage": None,
        "draworder": [],  # (level, type, subtype)
        "points": [],
        "lines": [],
        "polygons": [],
    }
    section = None  # 'id' | 'draworder' | 'point' | 'line' | 'polygon' | 'ignore'
    current: dict | None = None
    xpm_state: _XpmState | None = None
    xpm_key: str | None = None

    def finish_element():
        nonlocal current
        if current is not None and section in ("point", "line", "polygon"):
            out[section + "s"].append(current)
        current = None

    for raw in text.splitlines():
        line = raw.rstrip("\n")
        s = line.strip()
        if not s or s.startswith(";"):
            continue

        if xpm_state is not None:
            if not xpm_state.feed(line):
                current["xpms"][xpm_key] = xpm_state.xpm
                xpm_state = None
            continue

        m = _SECTION_RE.match(s)
        if m:
            name = m.group(1).lower()
            if name == "end":
                finish_element()
                section = None
            else:
                finish_element()
                section = {
                    "_id": "id",
                    "_draworder": "draworder",
                    "_point": "point",
                    "_line": "line",
                    "_polygon": "polygon",
                }.get(name, "ignore")
                if section in ("point", "line", "polygon"):
                    current = _new_element()
            continue

        if section is None:
            raise ValueError(f"line outside any section: {s!r}")
        if section == "ignore":
            continue

        kv = _KV_RE.match(line)
        if not kv:
            continue  # stray quoted line etc. outside an xpm: skipped
        key, value = kv.group(1), kv.group(2).strip()
        lkey = key.lower()

        if section == "id":
            if lkey == "fid":
                out["fid"] = int(value, 0)
            elif lkey == "productcode":
                out["product_code"] = int(value, 0)
            elif lkey == "codepage":
                out["codepage"] = int(value, 0)
            continue

        if section == "draworder":
            if lkey != "type":
                raise ValueError(f"unrecognised draw-order keyword: {key}")
            tpart, lpart = value.split(",")
            typ, sub = decode_draworder_type(tpart)
            out["draworder"].append((int(lpart), typ, sub))
            continue

        # element sections
        if lkey == "type":
            current["type"], current["subtype"] = decode_type(value)
        elif lkey == "subtype":
            current["subtype"] = int(value, 0)
        elif lkey.startswith("string"):
            current["labels"].append(decode_label(value))
        elif lkey in ("xpm", "dayxpm", "nightxpm", "iconxpm"):
            xpm_state = _XpmState(value)
            xpm_key = lkey
            if xpm_state.xpm["ncolors"] == 0 and (
                xpm_state.xpm["width"] == 0 or xpm_state.xpm["height"] == 0
            ):
                current["xpms"][xpm_key] = xpm_state.xpm
                xpm_state = None
        elif lkey == "fontstyle":
            current["font_style"] = decode_font_style(value)
        elif lkey in ("customcolor", "extendedlabels", "comment"):
            pass  # noise / flags derived from feature use
        elif lkey == "daycustomcolor":
            current["day_custom_color"] = value
        elif lkey == "nightcustomcolor":
            current["night_custom_color"] = value
        elif section == "line" and lkey == "useorientation":
            current["use_orientation"] = value[:1] == "Y"
        elif section == "line" and lkey == "linewidth":
            current["line_width"] = int(value, 0)
        elif section == "line" and lkey == "borderwidth":
            current["border_width"] = int(value, 0)
        # unknown keys are warned-and-ignored by the reference

    finish_element()
    return out


TYP_SCHEMA = (
    "file string, kind string, type int, subtype int, "
    "labels array<struct<lang: int, text: string>>, font_style int, "
    "day_custom_color string, night_custom_color string, "
    "use_orientation boolean, line_width int, border_width int, "
    "draw_level int, "
    "xpm_width int, xpm_height int, xpm_ncolors int, xpm_cpp int, "
    "colors array<struct<tag: string, rgb: string, alpha: int>>"
)


def read_typ(spark: SparkSession, path: str) -> DataFrame:
    """Read typ.txt files into one row per element; polygons join
    their draw-order level."""
    files = spark.read.text(path, wholetext=True).select(
        "value", F_input_file_name()
    )

    def kernel(it):
        for pdf in it:
            rows = []
            for fname, text in zip(pdf["file"], pdf["value"]):
                data = parse_typ(text)
                levels = {
                    (t, s): lvl for lvl, t, s in data["draworder"]
                }
                for kind in ("points", "lines", "polygons"):
                    for el in data[kind]:
                        xpm = (
                            el["xpms"].get("xpm")
                            or el["xpms"].get("dayxpm")
                            or {}
                        )
                        rows.append(
                            (
                                fname,
                                kind[:-1],
                                el["type"],
                                el["subtype"],
                                el["labels"],
                                el["font_style"],
                                el["day_custom_color"],
                                el["night_custom_color"],
                                el["use_orientation"],
                                el["line_width"],
                                el["border_width"],
                                levels.get((el["type"], el["subtype"]))
                                if kind == "polygons"
                                else None,
                                xpm.get("width"),
                                xpm.get("height"),
                                xpm.get("ncolors"),
                                xpm.get("cpp"),
                                [
                                    (c["tag"], c["rgb"], c["alpha"])
                                    for c in xpm.get("colors", [])
                                ],
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "kind", "type", "subtype", "labels", "font_style",
                    "day_custom_color", "night_custom_color",
                    "use_orientation", "line_width", "border_width",
                    "draw_level", "xpm_width", "xpm_height", "xpm_ncolors",
                    "xpm_cpp", "colors",
                ],
            )

    return files.mapInPandas(kernel, TYP_SCHEMA)


def F_input_file_name():
    from pyspark.sql import functions as F

    return F.input_file_name().alias("file")


# ColourInfo scheme flags (imgfmt/app/typ/ColourInfo.java:32-35)
S_NIGHT = 0x1
S_DAY_TRANSPARENT = 0x2
S_NIGHT_TRANSPARENT = 0x4
S_HAS_BITMAP = 0x8


def colour_scheme(
    colors: list[dict], has_bitmap: bool = False, has_border: bool = False
) -> int:
    """ColourInfo.getColourScheme over parsed xpm colour entries
    (rgb None = transparent): 4 colours imply day+night pairs, a
    2-colour no-bitmap no-border palette is the both-transparent
    day/night scheme, and a day-only scheme inherits the day
    transparency bit for night."""
    n = len(colors)
    scheme = 0
    if has_bitmap:
        scheme |= S_HAS_BITMAP
    if n == 4:
        scheme |= S_NIGHT
    if not has_bitmap and not has_border and n == 2:
        scheme |= S_NIGHT | S_DAY_TRANSPARENT | S_NIGHT_TRANSPARENT
    if n < 2 or colors[1]["rgb"] is None:
        scheme |= S_DAY_TRANSPARENT
    if n == 4 and colors[3]["rgb"] is None:
        scheme |= S_NIGHT_TRANSPARENT
    if not (scheme & S_NIGHT) and (scheme & S_DAY_TRANSPARENT):
        scheme |= S_NIGHT_TRANSPARENT
    return scheme


def bits_per_pixel(ncolors: int, simple: bool = False) -> int:
    """ColourInfo.getBitsPerPixel: written-bitmap depth by palette
    size (transparent pixels count)."""
    if simple:
        return 1
    if ncolors == 0:
        return 24
    if ncolors < 2:
        return 1
    if ncolors < 4:
        return 2
    if ncolors < 16:
        return 4
    return 8
