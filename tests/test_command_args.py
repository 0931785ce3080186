"""Ports of CommandArgsTest, OptionsTest, and OptionTest
(test/uk/me/parabola/mkgmap/) against the argument front end."""

from __future__ import annotations

from mkgmap_spark.plans.command_args import (
    Option,
    read_args,
    read_option_file,
)

FILE1 = "00000001.osm"
FILE2 = "00000002.osm"
FILE3 = "00000003.osm"


# ------------------------------------------------- CommandArgsTest

def test_default_mapnames():
    p = read_args(["fred.osm", "bob.osm"])
    assert p.files[0].mapname == "63240001"
    assert p.files[1].mapname == "63240002"


def test_numeric_names():
    p = read_args([FILE1, FILE2])
    assert p.files[0].mapname == "00000001"
    assert p.files[1].mapname == "00000002"


def test_mapname_with_numeric_filenames():
    p = read_args(["--mapname=11110000", FILE1, "--mapname=22220000", FILE2])
    assert p.files[0].name == FILE1
    assert p.files[0].mapname == "11110000"
    assert p.files[1].name == FILE2
    assert p.files[1].mapname == "22220000"


def test_argument_file(tmp_path):
    cfile = (
        "family-id=3081\n"
        "product-id=2601\n"
        "overview-mapname=30810100\n"
        "net\n"
        "gmapsupp\n"
        "tdbfile\n"
        "mapname=11110000\n"
        "description=OSM-AU-Victoria\n"
        "country-name=Australia\n"
        "country-abbr=AUS\n"
        "region-name=Victoria\n"
        "region-abbr=VIC\n"
        "input-file=VIC.osm.gz\n"
        "mapname=22220000\n"
        "description {\nOSM-AU New South Wales}\n"
        "country-name=Australia\n"
        "country-abbr=AUS\n"
        "# Test that comments are ignored til EOL\n"
        "region-name=New-South-Wales\n"
        "region-abbr=NSW\n"
        "input-file=NSW.osm.gz\n"
    )
    f = tmp_path / "args"
    f.write_text(cfile)
    p = read_args(["-c", str(f)])
    a0, a1 = p.files
    assert a0.name.endswith("VIC.osm.gz")
    assert a0.mapname == "11110000"
    assert a0.get("region-abbr") == "VIC"
    assert a1.name.endswith("NSW.osm.gz")
    assert a1.mapname == "22220000"
    assert a1.get("region-abbr") == "NSW"
    assert a1.get("description") == "OSM-AU New South Wales"
    assert a0.get("net") == "" and a0.get("gmapsupp") == ""


def test_complex_mapname():
    p = read_args(["fred.osm", FILE1, "--mapname=12345678", FILE2, FILE3, "other.osm"])
    names = [f.mapname for f in p.files]
    assert names == ["63240001", "00000001", "12345678", "12345679", "12345680"]


def test_arg_reset():
    p = read_args(["--keep-going", FILE1, "--no-keep-going", FILE2, "--keep-going", FILE3])
    assert p.files[0].get("keep-going") == ""
    assert p.files[1].get("keep-going") is None
    assert p.files[2].get("keep-going") == ""
    assert p.files[1].get("invalid-option-does-not-exist") is None


def test_number_of_files_and_aliases():
    p = read_args(["--latin1", "a.osm", "--unicode", "b.osm"])
    assert p.number_of_files == 2
    assert p.files[0].get("code-page") == "1252"
    assert p.files[1].get("code-page") == "65001"
    p = read_args(["--drive-on-left", "a.osm"])
    assert p.files[0].get("drive-on") == "left"
    p = read_args(["-n", "55550000", "a.osm"])
    assert p.files[0].mapname == "55550000"


def test_config_file_read_once(tmp_path):
    f = tmp_path / "args"
    f.write_text("family-id=1\ninput-file=x.osm\n")
    p = read_args(["-c", str(f), "-c", str(f)])
    assert p.number_of_files == 1  # second read ignored


# ------------------------------------------------------ OptionsTest

def test_options_with_values():
    opts = read_option_file("three=3\nfour:4\n")
    assert [(o.option, o.value) for o in opts] == [("three", "3"), ("four", "4")]


def test_options_without_values():
    opts = read_option_file("pool\nocean\n")
    assert [(o.option, o.value) for o in opts] == [("pool", ""), ("ocean", "")]


def test_comments():
    opts = read_option_file(
        "pool\n    # first comment\n# a whole line of comment  \nocean\n"
    )
    assert [o.option for o in opts] == ["pool", "ocean"]
    assert all(o.value == "" for o in opts)


def test_long_values():
    OPT1 = "This is a much longer value\nthat spans several\nlines\n"
    OPT2 = (
        "  and here is another, note that there was no new"
        "line before the option name."
    )
    opts = read_option_file("pool {" + OPT1 + "}" + "ocean {\n" + OPT2 + "}")
    assert [o.option for o in opts] == ["pool", "ocean"]
    assert opts[0].value == OPT1.strip()
    assert opts[1].value == OPT2.strip()


def test_relative_filenames_in_file():
    opts = read_option_file("input-file: foo\n", "/bar/string.args")
    assert opts[0].value == "/bar/foo"


def test_absolute_filenames_in_file():
    opts = read_option_file("input-file: /home/foo\n", "/bar/string.args")
    assert opts[0].value == "/home/foo"


# ------------------------------------------------------- OptionTest

def test_option_without_value():
    o = Option.parse("hello")
    assert o.option == "hello" and o.value == ""


def test_option_with_value():
    o = Option.parse("hello=world")
    assert o.option == "hello" and o.value == "world"
    assert not o.experimental


def test_option_colon_value():
    o = Option.parse("hello:world")
    assert o.option == "hello" and o.value == "world"


def test_is_experimental():
    o = Option.parse("x-hello=world")
    assert o.option == "hello" and o.value == "world"
    assert o.experimental


def test_is_reset():
    o = Option.parse("no-hello")
    assert o.option == "hello" and o.reset and o.value is None
