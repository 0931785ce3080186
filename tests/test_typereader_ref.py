"""Port of test/uk/me/parabola/mkgmap/osmstyle/TypeReaderTest.java.

Level <-> resolution conversion through the LevelInfo table
"0:24 1:20 2:18 3:16 4:14": a `level` attribute is immediately
converted to resolutions (TypeReader.setLevel), and fixLevels derives
the level range back from the resolution range (GType.fixLevels,
called at TypeReader.readType:95).  No Spark session needed.
"""

from mkgmap_spark.rules.parser import parse_rule

LEVELS = [(0, 24), (1, 20), (2, 18), (3, 16), (4, 14)]


def _gtype(spec: str):
    return parse_rule(f"highway=* {spec}", LEVELS).gtype


class TestTypeReader:
    def test_level(self):
        g = _gtype("[0x1 level 2]")
        assert g.min_level == 0
        assert g.max_level == 2
        assert g.min_res == 18
        assert g.max_res == 24

    def test_level_range(self):
        g = _gtype("[0x1 level 1-3]")
        assert g.min_level == 1
        assert g.max_level == 3
        assert g.min_res == 16
        assert g.max_res == 20

    def test_resolution(self):
        g = _gtype("[0x1 resolution 18]")
        assert g.min_level == 0
        assert g.max_level == 2
        assert g.min_res == 18
        assert g.max_res == 24

    def test_resolution_range(self):
        g = _gtype("[0x1 resolution 16-20]")
        assert g.min_res == 16
        assert g.max_res == 20
        assert g.min_level == 1
        assert g.max_level == 3
