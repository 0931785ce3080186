"""Precompiled-sea source (--precomp-sea).

Reference contract (reader/osm/SeaGenerator.java):
- the world is rastered into PRECOMP_RASTER = 1<<15 map-unit square
  cells (SeaGenerator.java:83-84), keyed ``"{lat}_{lon}"`` of the cell
  start (getPrecompTileStart:361-371, getPrecompKeyNames:504-516);
- an ``index.txt`` / ``index.txt.gz`` in the precomp directory maps
  each key to ``sea`` | ``land`` | a mixed-tile file name
  (loadIndex:292-355, updatePrecompSeaTileIndex:546-566);
- a fully-sea / fully-land cell contributes its whole rectangle
  (addPrecompSea:608-613); a mixed cell's file holds OSM ways that are
  land polygons when tagged ``natural=land`` and sea polygons
  otherwise (addPrecompSea:636-646);
- every polygon is then clipped against the map tile's bounding box.

Spark re-expression: the index is a small broadcast dimension (the
whole-planet grid is <= 512x1024 cells); tile->cell coverage is a
``sequence``+``explode`` (no UDF); full cells clip to rectangles with
pure Column min/max arithmetic; mixed-tile files are read ONCE through
the distributed OSM XML source and clipped with the shared
Sutherland-Hodgman kernel in one Arrow-batched pass.  Every join is a
broadcast equi-join on the cell key, so the operator scales with
(tiles x covered cells), never with world size.

Divergence from the reference, documented: the reference merges
adjacent full cells into bigger awt Areas before emitting
(addWithoutCreatingHoles:713-752) purely to reduce polygon count; we
emit one clipped rectangle per covered cell.  Coverage is identical,
the polygon decomposition differs.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PRECOMP_RASTER = 1 << 15  # SeaGenerator.java:84


def precomp_tile_start(v: int) -> int:
    """getPrecompTileStart (SeaGenerator.java:361-371): round towards
    -inf to a raster multiple."""
    rem = v % PRECOMP_RASTER
    return v - rem  # python % is already floor-mod


def precomp_tile_end(v: int) -> int:
    """getPrecompTileEnd (SeaGenerator.java:377-387)."""
    rem = v % PRECOMP_RASTER
    return v if rem == 0 else v - rem + PRECOMP_RASTER


def read_precomp_index(spark: SparkSession, precomp_dir: str) -> DataFrame:
    """Parse index.txt[.gz] into (cell_lat, cell_lon, cell_type,
    file_name) with cell_type in {'sea','land','mixed'}.

    The index is driver-parsed (bounded: the planet grid is ~500k
    lines max) and returned as a DataFrame for broadcast joins."""
    path = os.path.join(precomp_dir, "index.txt.gz")
    if os.path.exists(path):
        fh = gzip.open(path, "rt")
    else:
        path = os.path.join(precomp_dir, "index.txt")
        fh = open(path, "rt")
    rows = []
    with fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            items = line.split(";")
            if len(items) != 2:
                continue  # loadIndex warns + skips
            key, name = items
            parts = key.split("_")
            if len(parts) != 2:
                continue
            lat, lon = int(parts[0]), int(parts[1])
            kind = name if name in ("sea", "land") else "mixed"
            rows.append((lat, lon, kind, None if kind != "mixed" else name))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell_lat", "cell_lon", "cell_type", "file_name"]),
        schema="cell_lat long, cell_lon long, cell_type string, file_name string",
    )


def _tile_cells(bounds: DataFrame) -> DataFrame:
    """(tile_id, cell_lat, cell_lon) for every precomp cell covering
    each tile bbox (getPrecompKeyNames): pure Column sequence+explode."""
    r = F.lit(PRECOMP_RASTER)
    start = lambda c: F.col(c).cast("long") - F.pmod(F.col(c).cast("long"), r)
    end = lambda c: start(c) + F.when(F.pmod(F.col(c).cast("long"), r) == 0, 0).otherwise(r)
    return (
        bounds.select(
            "tile_id", "min_lat", "min_lon", "max_lat", "max_lon",
            F.explode(F.sequence(start("min_lat"), end("max_lat") - r, r)).alias("cell_lat"),
        )
        .select(
            "tile_id", "min_lat", "min_lon", "max_lat", "max_lon", "cell_lat",
            F.explode(F.sequence(start("min_lon"), end("max_lon") - r, r)).alias("cell_lon"),
        )
    )


def precomp_sea_polygons(
    spark: SparkSession,
    precomp_dir: str,
    bounds: DataFrame,
    land_tag: tuple[str, str] = ("natural", "land"),
) -> DataFrame:
    """SeaGenerator.addPrecompSea over Spark: land/sea polygons for
    every tile bbox from a precompiled-sea directory.

    bounds: (tile_id, min_lat, min_lon, max_lat, max_lon) in map units.
    Output: one row per polygon point (tile_id, kind, poly, idx, lat,
    lon) — the generate_sea_polygons schema, so the synthesis and the
    precomp path are drop-in alternatives.  ``poly`` numbers polygons
    per tile in (kind, cell, way id) order, deterministically.
    """
    index = read_precomp_index(spark, precomp_dir)
    cells = _tile_cells(bounds).join(
        F.broadcast(index), ["cell_lat", "cell_lon"], "inner"
    )  # cells missing from the index are skipped (addPrecompSea:596-599)

    # --- full sea/land cells: rectangle ∩ tile bbox, Column-only ----
    full = cells.filter(F.col("cell_type") != "mixed").select(
        "tile_id",
        F.col("cell_type").alias("kind"),
        "cell_lat", "cell_lon",
        F.greatest("min_lat", F.col("cell_lat")).alias("y0"),
        F.greatest("min_lon", F.col("cell_lon")).alias("x0"),
        F.least("max_lat", F.col("cell_lat") + PRECOMP_RASTER).alias("y1"),
        F.least("max_lon", F.col("cell_lon") + PRECOMP_RASTER).alias("x1"),
    ).filter((F.col("y1") > F.col("y0")) & (F.col("x1") > F.col("x0")))
    full_pts = full.select(
        "tile_id", "kind", "cell_lat", "cell_lon",
        F.lit(-1).cast("long").alias("way_id"),
        F.posexplode(
            F.array(
                F.struct(F.col("y0").alias("lat"), F.col("x0").alias("lon")),
                F.struct(F.col("y1").alias("lat"), F.col("x0").alias("lon")),
                F.struct(F.col("y1").alias("lat"), F.col("x1").alias("lon")),
                F.struct(F.col("y0").alias("lat"), F.col("x1").alias("lon")),
                F.struct(F.col("y0").alias("lat"), F.col("x0").alias("lon")),
            )
        ).alias("idx", "p"),
    ).select(
        "tile_id", "kind", "cell_lat", "cell_lon", "way_id", "idx",
        F.col("p.lat").alias("lat"), F.col("p.lon").alias("lon"),
    )

    # --- mixed cells: distributed OSM read, SH clip per (tile, way) --
    mixed = cells.filter(F.col("cell_type") == "mixed")
    mixed_files = [r["file_name"] for r in
                   mixed.select("file_name").distinct().collect()]
    if mixed_files:
        from .o5m import resolve_way_coords
        from .osm_xml import read_osm_xml

        paths = [os.path.join(precomp_dir, f) for f in sorted(mixed_files)]
        elements = read_osm_xml(spark, paths)
        ways = resolve_way_coords(elements).select(
            F.col("id").alias("way_id"),
            F.when(
                F.col("tags")[land_tag[0]] == land_tag[1], F.lit("land")
            ).otherwise(F.lit("sea")).alias("kind"),  # addPrecompSea:640-645
            "lats", "lons",
            # home cell of the way (fixture ways sit inside one cell;
            # general ways are keyed by their first point's cell and
            # clipping handles spill into neighbours via the per-tile
            # bbox, matching loadPrecompTile's whole-file semantics)
            (F.expr("lats[0]").cast("long") - F.pmod(F.expr("lats[0]").cast("long"), F.lit(PRECOMP_RASTER))).alias("cell_lat"),
            (F.expr("lons[0]").cast("long") - F.pmod(F.expr("lons[0]").cast("long"), F.lit(PRECOMP_RASTER))).alias("cell_lon"),
        )
        mw = mixed.select("tile_id", "min_lat", "min_lon", "max_lat", "max_lon",
                          "cell_lat", "cell_lon").join(
            ways, ["cell_lat", "cell_lon"], "inner"
        )

        def clip_kernel(it):
            from ..functions.geometry import clip_ring

            for pdf in it:
                t_o, k_o, cy_o, cx_o, w_o, i_o, la_o, lo_o = [], [], [], [], [], [], [], []
                for r in pdf.itertuples():
                    bbox = (int(r.min_lat), int(r.min_lon), int(r.max_lat), int(r.max_lon))
                    la, lo = clip_ring(np.asarray(r.lats), np.asarray(r.lons), bbox)
                    if len(la) < 3:
                        continue
                    # close the ring like the rectangle path does
                    la = np.append(la, la[0])
                    lo = np.append(lo, lo[0])
                    for i in range(len(la)):
                        t_o.append(int(r.tile_id)); k_o.append(r.kind)
                        cy_o.append(int(r.cell_lat)); cx_o.append(int(r.cell_lon))
                        w_o.append(int(r.way_id)); i_o.append(i)
                        la_o.append(int(la[i])); lo_o.append(int(lo[i]))
                yield pd.DataFrame({
                    "tile_id": t_o, "kind": k_o, "cell_lat": cy_o, "cell_lon": cx_o,
                    "way_id": w_o, "idx": i_o, "lat": la_o, "lon": lo_o,
                })

        mixed_pts = mw.mapInPandas(
            clip_kernel,
            "tile_id long, kind string, cell_lat long, cell_lon long, "
            "way_id long, idx int, lat long, lon long",
        )
        pts = full_pts.unionByName(mixed_pts)
    else:
        pts = full_pts

    # deterministic per-tile polygon numbering: dense_rank over the
    # (kind, cell, way) triple inside each tile
    from pyspark.sql import Window

    w = Window.partitionBy("tile_id").orderBy("kind", "cell_lat", "cell_lon", "way_id")
    return pts.withColumn("poly", (F.dense_rank().over(w) - 1)).select(
        "tile_id", "kind", F.col("poly").cast("int"),
        F.col("idx").cast("int"), F.col("lat").cast("int"), F.col("lon").cast("int"),
    )


def write_precomp_fixture(
    precomp_dir: str,
    cells: list[tuple[int, int, str]],
    mixed_ways: dict[str, list[dict]] | None = None,
    gzip_index: bool = True,
) -> None:
    """Fixture writer in the .bnd/.hgt pattern: builds a precomp-sea
    directory from (cell_lat, cell_lon, 'sea'|'land'|file_name) rows
    plus mixed-tile way definitions (written as real .osm files read
    back through the production XML source).

    mixed_ways: file_name -> element dicts for write_osm_xml_fixture
    (nodes with lat_deg/lon_deg, ways with refs + tags)."""
    from .osm_xml import write_osm_xml_fixture

    os.makedirs(precomp_dir, exist_ok=True)
    lines = ["# precomp-sea fixture index"]
    for lat, lon, name in cells:
        lines.append(f"{lat}_{lon};{name}")
    data = ("\n".join(lines) + "\n").encode()
    if gzip_index:
        # fixed mtime keeps the fixture byte-stable run-over-run
        with open(os.path.join(precomp_dir, "index.txt.gz"), "wb") as fh:
            gz = gzip.GzipFile(fileobj=fh, mode="wb", mtime=0)
            gz.write(data)
            gz.close()
    else:
        with open(os.path.join(precomp_dir, "index.txt"), "wb") as fh:
            fh.write(data)
    for fname, elements in (mixed_ways or {}).items():
        write_osm_xml_fixture(os.path.join(precomp_dir, fname), elements)
