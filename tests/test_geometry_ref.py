"""Port of the portable properties of
test/uk/me/parabola/util/Java2DConverterTest.java.

The awt-Area round-trip tests are JVM internals, but the +/-180
cases carry a real engine property: a polygon hugging the antimeridian
clipped against the planet bounds must keep its exact area test value
(ShapeMergeFilter.calcAreaSizeTestVal == shoelace2 here).  No Spark
session needed.
"""

import numpy as np

from mkgmap_spark.functions.geometry import clip_ring, shoelace2

# Utils.toMapUnit: degrees -> garmin map units at 24 bits
def _mu(deg: float) -> int:
    return round(deg * (1 << 24) / 360)


PLANET = (_mu(-90.0), _mu(-180.0), _mu(90.0), _mu(180.0))


def _clip_area(lats, lons):
    cl, co = clip_ring(np.asarray(lats, dtype=np.int64),
                       np.asarray(lons, dtype=np.int64), PLANET)
    return shoelace2(np.rint(cl).astype(np.int64),
                     np.rint(co).astype(np.int64))


def test_polygon_conversion_at_180():
    # Java2DConverterTest.testPolygonConversionAt180
    lats = [_mu(1.0), _mu(0.0), _mu(1.0)]
    lons = [_mu(180.0), _mu(180.0), _mu(179.0)]
    assert _clip_area(lats, lons) == shoelace2(
        np.array(lats, dtype=np.int64), np.array(lons, dtype=np.int64)
    )


def test_polygon_conversion_at_minus_180():
    # Java2DConverterTest.testPolygonConversionAtMinus180
    lats = [_mu(-1.0), _mu(0.0), _mu(-1.0)]
    lons = [_mu(-180.0), _mu(-180.0), _mu(-179.0)]
    assert _clip_area(lats, lons) == shoelace2(
        np.array(lats, dtype=np.int64), np.array(lons, dtype=np.int64)
    )


def test_clip_to_planet_is_identity_inside():
    # any fully-inside ring is untouched (count and area)
    rng = np.random.default_rng(4242)
    for _ in range(20):
        n = rng.integers(3, 12)
        lats = rng.integers(_mu(-89.0), _mu(89.0), size=n)
        lons = rng.integers(_mu(-179.0), _mu(179.0), size=n)
        cl, co = clip_ring(lats.astype(np.int64), lons.astype(np.int64), PLANET)
        got = shoelace2(np.rint(cl).astype(np.int64), np.rint(co).astype(np.int64))
        assert got == shoelace2(lats.astype(np.int64), lons.astype(np.int64))
