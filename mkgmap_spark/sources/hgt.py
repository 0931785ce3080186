"""HGT raster DEM file source (SRTM elevation grids).

Reference: reader/hgt/HGTReader.java — an ``.hgt`` file is a bare
(res+1) x (res+1) matrix of BIG-ENDIAN int16 elevations in metres,
row 0 being the NORTH edge; ``res = sqrt(size/2) - 1`` (calcRes:219,
odd sizes are rejected); the void value is 0x8000 = -32768 (UNDEF:46);
``getElevation(x, y)`` indexes ``(res - y) * (res + 1) + x`` with y
counting up from the SOUTH edge (:242).  The file name encodes the SW
corner: ``N51E010.hgt`` = lat 51..52, lon 10..11.

Spark form: ``read_hgt`` decodes files (via Spark's binaryFile source)
into one georeferenced raster row each, matching the raster-overlay
operator's table contract (operators/raster.py) — pixels are re-ordered
SOUTH-first there because the overlay's fy axis grows with latitude.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

UNDEF = -32768
_NAME_RE = re.compile(r"([NS])(\d{1,2})([EW])(\d{1,3})", re.IGNORECASE)
_UNITS_PER_DEG = (1 << 24) / 360.0


def parse_hgt_name(name: str) -> tuple[int, int]:
    """SW corner (lat_deg, lon_deg) from an hgt file name."""
    m = _NAME_RE.search(os.path.basename(name))
    if not m:
        raise ValueError(f"not an hgt file name: {name}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def parse_hgt(data: bytes) -> tuple[int, np.ndarray]:
    """(res, grid) — grid shape (res+1, res+1), row 0 = north edge.

    Returns res -1 and an empty grid for invalid sizes (calcRes)."""
    n_vals = int(math.isqrt(len(data) // 2))
    if 2 * n_vals * n_vals != len(data) or n_vals < 2:
        return -1, np.empty((0, 0), dtype=np.int16)
    grid = np.frombuffer(data, dtype=">i2").reshape(n_vals, n_vals)
    return n_vals - 1, grid


def get_elevation(grid: np.ndarray, x: int, y: int) -> int:
    """HGTReader.getElevation:242 — x column west->east, y row counted
    from the SOUTH edge."""
    res = grid.shape[0] - 1
    return int(grid[res - y, x])


def write_hgt(path: str, grid: np.ndarray) -> None:
    """Fixture writer twin: row 0 = north edge, big-endian int16."""
    with open(path, "wb") as f:
        f.write(np.asarray(grid, dtype=">i2").tobytes())


def read_hgt(spark: SparkSession, path: str) -> DataFrame:
    """Decode .hgt files into georeferenced raster rows.

    Output (the operators/raster.py contract): (media_ref, width,
    height, pixels, min_lat, min_lon, max_lat, max_lon) with pixels
    row-major SOUTH-first and bounds in map units.  Invalid files
    (bad size) are dropped like the reference's res = -1 path.
    """
    files = spark.read.format("binaryFile").load(path)

    def kernel(it):
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                res, grid = parse_hgt(bytes(r.content))
                if res < 0:
                    continue
                lat0, lon0 = parse_hgt_name(r.path)
                rows.append(
                    {
                        "media_ref": os.path.basename(r.path),
                        "width": res + 1,
                        "height": res + 1,
                        # south-first for the overlay's fy axis
                        "pixels": grid[::-1].astype(np.int32).ravel().tolist(),
                        "min_lat": int(lat0 * _UNITS_PER_DEG),
                        "min_lon": int(lon0 * _UNITS_PER_DEG),
                        "max_lat": int((lat0 + 1) * _UNITS_PER_DEG),
                        "max_lon": int((lon0 + 1) * _UNITS_PER_DEG),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "width", "height", "pixels",
                    "min_lat", "min_lon", "max_lat", "max_lon",
                ],
            )

    return files.select("path", "content").mapInPandas(
        kernel,
        "media_ref string, width int, height int, pixels array<int>, "
        "min_lat int, min_lon int, max_lat int, max_lon int",
    )
