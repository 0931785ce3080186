"""The ``test-map:`` synthetic sources.

Reference: reader/test/ElementTestDataSource.java + AllElements.java +
TestPoints.java — ``mkgmap test-map:all-elements`` generates a grid of
every point type/subtype plus sample lines and polygons (drawn twice,
with and without a background wetlands shape), and
``test-map:test-points`` an npoints x npoints grid of POIs with
resolution varying by column plus short lines.  Used by the
reference's functional tests and by users to eyeball a style/TYP.

The generation is deterministic closed-form arithmetic, so the engine
builds it as a DataFrame program over ``spark.range`` — no driver-side
loops; scales to any npoints.  Output is the decoded-features shape
(id, kind, tags, lats, lons, closed, min_res) plus ``type_code`` and
``name``, ready for build_tiles_from_features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mapunits import to_map_unit

ELEMENT_SPACING = 0.002
ELEMENT_SIZE = 0.001
MAX_POINT_TYPE = 0x7F
MAX_POINT_SUB_TYPE = 0x1F
MAX_LINE_TYPE_X = 4
MAX_LINE_TYPE_Y = 16
MAX_SHAPE_TYPE_X = 8
MAX_SHAPE_TYPE_Y = 16


def _fmt_type() -> F.Column:
    """GType.formatType: lower hex, 0x-prefixed, even digit count."""
    s = F.lower(F.conv(F.col("type_code").cast("string"), 10, 16))
    return F.concat(
        F.when(F.length(s) % 2 != 0, F.lit("0x0")).otherwise(F.lit("0x")), s
    )


def _mu(col: F.Column) -> F.Column:
    """Degrees -> 24-bit map units with Utils.toMapUnit rounding."""
    return F.floor(col * (1 << 24) / 360.0 + 0.5).cast("int")


def _range(spark: SparkSession, n: int) -> DataFrame:
    """spark.range sized to the data: the default partitioning gives
    every tiny grid branch defaultParallelism partitions (7 branches x
    32 empty-ish tasks dominated the query wall); ~2k rows per
    partition keeps task counts proportional to the grid instead."""
    parts = max(1, min(spark.sparkContext.defaultParallelism, n // 2048 + 1))
    return spark.range(0, n, 1, parts)


def all_elements(
    spark: SparkSession, base_lat: float = 51.7, base_long: float = 0.24
) -> DataFrame:
    """test-map:all-elements (AllElements.load)."""
    maps = []
    for pass_i, has_background in ((0, False), (1, True)):
        lat0 = base_lat + pass_i * (MAX_POINT_SUB_TYPE + 4) * ELEMENT_SPACING
        maps.append(_one_test_map(spark, lat0, base_long, has_background, pass_i))
    bg_lat = base_lat + (MAX_POINT_SUB_TYPE + 4) * ELEMENT_SPACING
    n_up = MAX_POINT_SUB_TYPE + 3
    n_across = MAX_POINT_TYPE + MAX_LINE_TYPE_X + MAX_SHAPE_TYPE_X + 4
    lats = [bg_lat, bg_lat + n_up * ELEMENT_SPACING,
            bg_lat + n_up * ELEMENT_SPACING, bg_lat, bg_lat]
    lons = [base_long, base_long,
            base_long + n_across * ELEMENT_SPACING,
            base_long + n_across * ELEMENT_SPACING, base_long]
    background = spark.createDataFrame(
        [(10**9, "way", {}, [to_map_unit(a) for a in lats],
          [to_map_unit(o) for o in lons], True, 10, 0x51, "background")],
        "id long, kind string, tags map<string,string>, lats array<int>, "
        "lons array<int>, closed boolean, min_res int, type_code int, name string",
    )
    out = maps[0]
    for m in maps[1:]:
        out = out.unionByName(m)
    return out.unionByName(background)


def _one_test_map(
    spark: SparkSession, lat0: float, lon0: float, has_background: bool, pass_i: int
) -> DataFrame:
    base = pass_i * 10**8

    # points: maintype 0 contributes ONE row (the subtype loop breaks),
    # maintypes 1..0x7f contribute subtype -1..0x1f each; a point gets
    # a name when (subtype < 0) == has_background (drawPoints)
    pts = (
        _range(spark, (MAX_POINT_TYPE + 1) * (MAX_POINT_SUB_TYPE + 2))
        .withColumn("maintype", (F.col("id") / (MAX_POINT_SUB_TYPE + 2)).cast("int"))
        .withColumn("subtype", (F.col("id") % (MAX_POINT_SUB_TYPE + 2)).cast("int") - 1)
        .filter((F.col("maintype") > 0) | (F.col("subtype") == -1))
        .withColumn(
            "type_code",
            F.when(F.col("subtype") < 0, F.col("maintype")).otherwise(
                F.shiftleft(F.col("maintype"), 8) + F.col("subtype")
            ),
        )
        .withColumn("lat", F.lit(lat0 + 0.004) + F.col("subtype") * ELEMENT_SPACING)
        .withColumn("lon", F.lit(lon0 + 0.002) + F.col("maintype") * ELEMENT_SPACING)
        .withColumn(
            "name",
            F.when(
                (F.col("subtype") < 0) == F.lit(has_background), _fmt_type()
            ).otherwise(F.lit(None).cast("string")),
        )
        .select(
            (F.col("id") + base).alias("id"),
            F.lit("node").alias("kind"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.array(_mu(F.col("lat"))).alias("lats"),
            F.array(_mu(F.col("lon"))).alias("lons"),
            F.lit(False).alias("closed"),
            F.lit(10).alias("min_res"),
            "type_code",
            "name",
        )
    )

    lines_lon0 = lon0 + 0.002 + (MAX_POINT_TYPE + 1) * ELEMENT_SPACING
    lines = (
        _range(spark, MAX_LINE_TYPE_X * MAX_LINE_TYPE_Y)
        .withColumn("x", (F.col("id") / MAX_LINE_TYPE_Y).cast("int"))
        .withColumn("y", (F.col("id") % MAX_LINE_TYPE_Y).cast("int"))
        .withColumn("type_code", F.col("id").cast("int"))
        .withColumn("blat", F.lit(lat0 + 0.004) + F.col("y") * ELEMENT_SPACING)
        .withColumn("blon", F.lit(lines_lon0) + F.col("x") * ELEMENT_SPACING)
        .withColumn(
            "name",
            F.when(F.lit(not has_background), _fmt_type()).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .select(
            (F.col("id") + base + 10**6).alias("id"),
            F.lit("way").alias("kind"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.array(
                _mu(F.col("blat")),
                _mu(F.col("blat") + ELEMENT_SIZE),
                _mu(F.col("blat") + ELEMENT_SIZE),
            ).alias("lats"),
            F.array(
                _mu(F.col("blon")),
                _mu(F.col("blon") + ELEMENT_SIZE),
                _mu(F.col("blon") + ELEMENT_SIZE + ELEMENT_SIZE / 2),
            ).alias("lons"),
            F.lit(False).alias("closed"),
            F.lit(10).alias("min_res"),
            "type_code",
            "name",
        )
    )

    shapes_lon0 = lines_lon0 + (MAX_LINE_TYPE_X + 1) * ELEMENT_SPACING
    shapes = (
        _range(spark, MAX_SHAPE_TYPE_X * MAX_SHAPE_TYPE_Y)
        .withColumn("x", (F.col("id") / MAX_SHAPE_TYPE_Y).cast("int"))
        .withColumn("y", (F.col("id") % MAX_SHAPE_TYPE_Y).cast("int"))
        .withColumn("type_code", F.col("id").cast("int"))
        .withColumn("blat", F.lit(lat0 + 0.004) + F.col("y") * ELEMENT_SPACING)
        .withColumn("blon", F.lit(shapes_lon0) + F.col("x") * ELEMENT_SPACING)
        .withColumn(
            "name",
            F.when(F.lit(has_background), _fmt_type()).otherwise(
                F.lit(None).cast("string")
            ),
        )
        .select(
            (F.col("id") + base + 2 * 10**6).alias("id"),
            F.lit("way").alias("kind"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.array(
                _mu(F.col("blat")),
                _mu(F.col("blat") + ELEMENT_SIZE),
                _mu(F.col("blat") + ELEMENT_SIZE),
                _mu(F.col("blat")),
                _mu(F.col("blat")),
            ).alias("lats"),
            F.array(
                _mu(F.col("blon")),
                _mu(F.col("blon")),
                _mu(F.col("blon") + ELEMENT_SIZE),
                _mu(F.col("blon") + ELEMENT_SIZE),
                _mu(F.col("blon")),
            ).alias("lons"),
            F.lit(True).alias("closed"),
            F.lit(10).alias("min_res"),
            "type_code",
            "name",
        )
    )

    return pts.unionByName(lines).unionByName(shapes)


def test_points(
    spark: SparkSession,
    npoints: int = 10,
    base_lat: float = 51.7,
    base_long: float = 0.24,
) -> DataFrame:
    """test-map:test-points (TestPoints.drawTestMap): an
    npoints x npoints POI grid (type 0x2c00 + y&0xf, min_res varying
    with the column) plus short lines of type x*16+y & 0xf."""
    spacing = 0.02
    size = 0.002
    pts = (
        _range(spark, npoints * npoints)
        .withColumn("x", (F.col("id") / npoints).cast("int"))
        .withColumn("y", (F.col("id") % npoints).cast("int"))
        .withColumn("type_code", F.lit(0x2C << 8) + F.col("y").bitwiseAND(0xF))
        .withColumn("blat", F.lit(base_lat) + F.col("y") * spacing)
        .withColumn("blon", F.lit(base_long) + F.col("x") * spacing)
        .select(
            F.col("id").alias("id"),
            F.lit("node").alias("kind"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.array(_mu(F.col("blat"))).alias("lats"),
            F.array(_mu(F.col("blon"))).alias("lons"),
            F.lit(False).alias("closed"),
            (F.lit(24) - F.col("x").bitwiseAND(0x7)).cast("int").alias("min_res"),
            F.col("type_code").cast("int").alias("type_code"),
            F.concat(F.lit("P "), (F.col("x") * npoints + F.col("y")).cast("string")).alias("name"),
        )
    )
    lines = (
        _range(spark, npoints * npoints)
        .withColumn("x", (F.col("id") / npoints).cast("int"))
        .withColumn("y", (F.col("id") % npoints).cast("int"))
        .withColumn("type_code", (F.col("x") * 16 + F.col("y")).bitwiseAND(0xF))
        .withColumn("blat", F.lit(base_lat) + F.col("y") * spacing)
        .withColumn("blon", F.lit(base_long) + F.col("x") * spacing)
        .select(
            (F.col("id") + 10**6).alias("id"),
            F.lit("way").alias("kind"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.array(_mu(F.col("blat")), _mu(F.col("blat") + size)).alias("lats"),
            F.array(_mu(F.col("blon")), _mu(F.col("blon") + size)).alias("lons"),
            F.lit(False).alias("closed"),
            F.lit(10).alias("min_res"),
            F.col("type_code").cast("int").alias("type_code"),
            F.concat(F.lit("0x"), F.lower(F.conv(F.col("type_code").cast("string"), 10, 16))).alias("name"),
        )
    )
    return pts.unionByName(lines)
