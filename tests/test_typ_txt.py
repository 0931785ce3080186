"""Port of the reference's TypTextReaderTest (test/.../typ/
TypTextReaderTest.java) at the text-grammar level — the binary TYP
writer byte assertions are out of scope (imgfmt), but every parse-level
fact those bytes encode (types, subtypes, stacking levels, palette
sizes, alpha decode) is asserted here, plus the full shipped
test/resources/typ/test.txt fixture and the Spark table lift."""

from __future__ import annotations

import pytest

from mkgmap_spark.sources.typ_txt import (
    decode_alpha,
    decode_font_style,
    decode_label,
    parse_typ,
    read_typ,
)

REF_TYP = "/root/reference/test/resources/typ/test.txt"


def test_id_section():
    d = parse_typ(
        "[_id]\n" "FID=24\n" "ProductCode=2\n" "CodePage=1251\n" "[End]"
    )
    assert d["fid"] == 24
    assert d["product_code"] == 2
    assert d["codepage"] == 1251


def test_stacking():
    """testStacking's draw-order: level 1 -> {0x3}, level 2 ->
    {0x2, 0x4, 0x104:(2,5)}, level 4 -> {0x1} (the byte layout the
    reference asserts is the writer's serialization of exactly this)."""
    d = parse_typ(
        "[_drawOrder]\n"
        "Type=0x3,1\n"
        "Type=0x2,2\n"
        "Type=0x1,4\n"
        "Type=0x4,2\n"
        "Type=0x10402,2\n"
        "Type=0x10405,2\n"
        "[End]\n"
    )
    assert d["draworder"] == [
        (1, 0x3, 0),
        (2, 0x2, 0),
        (4, 0x1, 0),
        (2, 0x4, 0),
        (2, 0x104, 2),
        (2, 0x104, 5),
    ]
    by_level: dict = {}
    for lvl, t, s in d["draworder"]:
        by_level.setdefault(lvl, []).append((t, s))
    assert by_level[1] == [(0x3, 0)]
    assert by_level[4] == [(0x1, 0)]
    # the two 0x104xx entries share a type with subtype bits {2, 5}
    subs = [s for t, s in by_level[2] if t == 0x104]
    assert (1 << subs[0]) + (1 << subs[1]) == (1 << 2) + (1 << 5)


def test_polygon():
    d = parse_typ(
        "[_polygon]\n"
        "Type=0x2\n"
        "String1=0x04,Parking\n"
        "String2=0x03,Parkeergarage\n"
        'Xpm="0 0 2 0"\n'
        '"1 c #7BCAD5"\n'
        '"2 c #00008B"\n'
        "[End]\n"
    )
    [p] = d["polygons"]
    assert p["type"] == 2
    assert p["labels"] == [(4, "Parking"), (3, "Parkeergarage")]
    x = p["xpms"]["xpm"]
    assert (x["width"], x["height"], x["ncolors"], x["cpp"]) == (0, 0, 2, 0)
    assert [c["rgb"] for c in x["colors"]] == ["#7BCAD5", "#00008B"]


def test_polygon_with_bitmap():
    rows = [
        "!     !!!     !!!     !!!     !!",
        "     !!!     !!!     !!!     !!!",
    ] * 16
    src = (
        "[_polygon]\n"
        'Xpm="32 32 4 1"\n'
        '"! c #FFCC99"\n'
        '"  c none"\n'
        '"3 c #000000"\n'
        '"4 c none"\n'
        + "".join(f'"{r}"\n' for r in rows[:32])
        + "[End]\n"
    )
    d = parse_typ(src)
    [p] = d["polygons"]
    x = p["xpms"]["xpm"]
    assert (x["width"], x["height"], x["ncolors"], x["cpp"]) == (32, 32, 4, 1)
    assert [c["tag"] for c in x["colors"]] == ["!", " ", "3", "4"]
    assert [c["rgb"] for c in x["colors"]] == ["#FFCC99", None, "#000000", None]
    assert len(x["pixels"]) == 32
    assert all(len(r) == 32 for r in x["pixels"])


def test_line_two_colours():
    d = parse_typ(
        "[_line]\n"
        "Type=0x00\n"
        "UseOrientation=Y\n"
        "LineWidth=2\n"
        "BorderWidth=1\n"
        'Xpm="0 0 2 0"\n'
        '"1 c #DDDDDD"\n'
        '"2 c #999999"\n'
        "String1=0x04,Road\n"
        "String2=0x01,Route non-définie\n"
        "String3=0x03,Weg\n"
        "ExtendedLabels=Y\n"
        "FontStyle=SmallFont\n"
        "CustomColor=No\n"
        "[end]"
    )
    [ln] = d["lines"]
    assert ln["type"] == 0 and ln["use_orientation"] is True
    assert ln["line_width"] == 2 and ln["border_width"] == 1
    assert ln["labels"] == [(4, "Road"), (1, "Route non-définie"), (3, "Weg")]
    assert ln["font_style"] == 2  # SmallFont


def test_point_with_alpha():
    rows = [
        "$%&&&&&'$", "(&&&)&&&*", "&&)))))&&", "&&)&&&)&&", "&))&)&))&",
        "&&)&&&)&&", "&&)))))&&", "+&&&)&&&,", "$-&&&&&-$",
    ]
    src = (
        "[_point]\n"
        "Type=0x12\n"
        "SubType=0x01\n"
        ";23E6\n"
        ";size: 45\n"
        "String1=0x4,Mini round\n"
        "String2=0x1,Mini rond-point\n"
        "ExtendedLabels=N\n"
        'DayXpm="9 9 10 1"\n'
        '"$  c none"\n'
        '"%  c #808080"  alpha=14\n'
        '"&  c #808080"\n'
        '"\'  c #808080"  alpha=15\n'
        '"(  c #808080"  alpha=8\n'
        '")  c #F0F7FF"\n'
        '"*  c #808080"  alpha=4\n'
        '"+  c #808080"  alpha=11\n'
        '",  c #808080"  alpha=12\n'
        '"-  c #808080"  alpha=13\n'
        + "".join(f'"{r}"\n' for r in rows)
        + "[end]"
    )
    d = parse_typ(src)
    [pt] = d["points"]
    assert pt["type"] == 0x12 and pt["subtype"] == 0x01
    assert pt["labels"] == [(4, "Mini round"), (1, "Mini rond-point")]
    x = pt["xpms"]["dayxpm"]
    assert (x["width"], x["height"], x["ncolors"], x["cpp"]) == (9, 9, 10, 1)
    # alpha=N decodes to 255 - (N<<4 | N) (readExtraColourInfo)
    assert x["colors"][1]["alpha"] == 255 - ((14 << 4) + 14)
    assert x["colors"][2]["alpha"] is None
    assert x["colors"][3]["alpha"] == 255 - ((15 << 4) + 15)
    assert len(x["pixels"]) == 9


def test_zero_colour_bug():
    src = (
        "[_point]\n"
        "Type=0x01e\n"
        "SubType=0x00\n"
        "String1=0x04,island\n"
        'DayXpm="5 5 1 1"   Colormode=32\n'
        '"!      c #000000"  canalalpha=15\n'
    )
    src += '"!!!!!"\n' * 5 + "[end]"
    d = parse_typ(src)
    [pt] = d["points"]
    x = pt["xpms"]["dayxpm"]
    assert (x["width"], x["height"], x["ncolors"]) == (5, 5, 1)
    assert x["colormode"] == 32
    assert x["colors"][0]["alpha"] == 255 - ((15 << 4) + 15)


def test_ignore_unknown_sections():
    d = parse_typ(
        "[_unknown_section_name]\n"
        "Type=0x2\n"
        "String1=0x04,Parking\n"
        "String2=0x03,Parkeergarage\n"
        "OtherStuff=Unknown\n"
        "[End]\n"
        "[_id]\n"
        "FID=4455\n"
        "ProductCode=2\n"
        "CodePage=1251\n"
        "[End]"
    )
    assert d["fid"] == 4455
    assert d["points"] == [] and d["lines"] == [] and d["polygons"] == []


def test_decode_helpers():
    assert decode_font_style("NoLabel") == 1
    assert decode_font_style("nolabel") == 1
    assert decode_font_style("Small") == 2
    assert decode_font_style("NormalFont") == 3
    assert decode_font_style("Large") == 4
    assert decode_font_style("Default") == 0
    assert decode_font_style("garbage") == 0
    assert decode_label("0x04,Parking") == (4, "Parking")
    assert decode_label("plain text") == (0, "plain text")
    assert decode_alpha("0") == 255
    assert decode_alpha("15") == 0


def test_from_file():
    """testFromFile on the shipped test/resources/typ/test.txt."""
    d = parse_typ(open(REF_TYP).read())
    assert (d["fid"], d["product_code"], d["codepage"]) == (12, 1, 1252)
    assert d["draworder"] == [(1, 1, 0), (2, 0x101, 0x12), (2, 0x101, 0x13)]
    assert len(d["polygons"]) == 3
    assert d["polygons"][0]["font_style"] == 1  # NoLabel
    assert d["polygons"][1]["font_style"] == 2  # SmallFont
    assert d["polygons"][2]["font_style"] == 4  # Large


def test_read_typ_table(spark, tmp_path):
    import shutil

    shutil.copy(REF_TYP, tmp_path / "test.txt")
    df = read_typ(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == len(parse_typ(open(REF_TYP).read())["polygons"]) + 2 + 2
    polys = [r for r in rows if r["kind"] == "polygon"]
    assert {p["type"] for p in polys} >= {1, 2, 3}
    lvl = {p["type"]: p["draw_level"] for p in polys}
    assert lvl[1] == 1  # from [_drawOrder]
    # labels survive the lift
    assert any(
        (lbl["lang"], lbl["text"]) == (4, "Test")
        for p in polys
        for lbl in p["labels"]
    )


def test_colour_scheme_cases():
    """Port of ColourInfoTest (imgfmt/app/typ): the colour-scheme code
    for every palette/transparency/bitmap/border combination."""
    from mkgmap_spark.sources.typ_txt import bits_per_pixel, colour_scheme

    C = lambda: {"tag": "x", "rgb": "#010101", "alpha": None}
    T = lambda: {"tag": "x", "rgb": None, "alpha": None}

    assert colour_scheme([C()]) == 6
    assert colour_scheme([C(), C()]) == 7
    assert colour_scheme([C(), T(), C(), C()]) == 3
    assert colour_scheme([C(), C(), C(), T()]) == 5
    assert colour_scheme([C(), T(), C(), T()]) == 7
    assert colour_scheme([C(), C()], has_bitmap=True) == 8
    assert colour_scheme([C(), T()], has_bitmap=True) == 0xE
    assert colour_scheme([C(), T(), C(), C()], has_bitmap=True) == 0xB
    assert colour_scheme([C(), C(), C(), T()], has_bitmap=True) == 0xD
    assert colour_scheme([C(), T(), C(), T()], has_bitmap=True) == 0xF
    assert colour_scheme([C()], has_border=True) == 6
    assert colour_scheme([C(), C()], has_border=True) == 0
    assert colour_scheme([C(), T(), C(), C()], has_border=True) == 3

    assert bits_per_pixel(0) == 24
    assert bits_per_pixel(1) == 1
    assert bits_per_pixel(2) == 2
    assert bits_per_pixel(3) == 2
    assert bits_per_pixel(4) == 4
    assert bits_per_pixel(15) == 4
    assert bits_per_pixel(16) == 8
    assert bits_per_pixel(200, simple=True) == 1
