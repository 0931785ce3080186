"""Raster <-> vector overlay join (DEM semantics).

Reference: HGT elevation rasters joined to vector geometry —
HGTConverter.java:69-110 (readers grid ∩ demArea), :605 getHeights
(lattice sampling), :656-680 (bilinear/bicubic interpolation).

Spark re-expression: raster tiles are rows with a packed pixel array +
georeferencing (cell origin, size); vector features join on the coarse
cell id; the interpolation kernel is vectorized numpy over Arrow
batches.  This is the "raster-thumbnail <-> vector overlay join for
media spans" of the north star: documents' media spans reference
thumbs by media_ref; thumb pixels get sampled at the document's
coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bilinear_sample(pixels: np.ndarray, w: int, h: int, fx: np.ndarray, fy: np.ndarray) -> np.ndarray:
    """Sample row-major pixels at fractional coords (fx, fy in [0, w-1]
    x [0, h-1]) with bilinear interpolation (HGTConverter.interpolate
    semantics: linear in both axes, clamped at edges)."""
    fx = np.clip(fx, 0, w - 1)
    fy = np.clip(fy, 0, h - 1)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    tx = fx - x0
    ty = fy - y0
    p = pixels.reshape(h, w)
    v00 = p[y0, x0]
    v01 = p[y0, x1]
    v10 = p[y1, x0]
    v11 = p[y1, x1]
    return (1 - ty) * ((1 - tx) * v00 + tx * v01) + ty * ((1 - tx) * v10 + tx * v11)


def overlay_sample(
    features: DataFrame,
    rasters: DataFrame,
    media_link: DataFrame | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Sample each feature's raster value at its assignment point.

    features: (id, ay, ax, media_ref)  [or join via media_link
    (id, media_ref)].  rasters: (media_ref, width, height, pixels,
    min_lat, min_lon, max_lat, max_lon) — georeferenced bounds; when
    the fixture provides only cell_id, bounds default to the thumb's
    own pixel grid stretched over the feature's cell.

    Output: (id, media_ref, sampled) with bilinear interpolation.
    """
    f = features
    if media_link is not None:
        f = f.join(media_link, id_col)
    paired = f.join(rasters, "media_ref")

    def kernel(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = np.empty(len(pdf), dtype=np.float64)
            for i, row in enumerate(pdf.itertuples()):
                px = np.asarray(row.pixels, dtype=np.float64)
                w, h = int(row.width), int(row.height)
                # normalize feature coords into the raster's local grid:
                # map the 2^16-unit cell footprint onto [0, w-1]x[0, h-1]
                fx = ((row.ax & 0xFFFF) / 65535.0) * (w - 1)
                fy = ((row.ay & 0xFFFF) / 65535.0) * (h - 1)
                out[i] = bilinear_sample(px, w, h, np.array([fx]), np.array([fy]))[0]
            res = pdf[["id", "media_ref"]].copy()
            res["sampled"] = out
            yield res

    return paired.mapInPandas(kernel, "id long, media_ref string, sampled double")


def bicubic_sample(pixels: np.ndarray, w: int, h: int, fx: np.ndarray, fy: np.ndarray) -> np.ndarray:
    """Catmull-Rom bicubic sampling (HGTConverter.java:656-680
    interpolation family), edge-clamped; falls back to the same values
    as bilinear on the border ring."""
    fx = np.clip(np.asarray(fx, dtype=np.float64), 0, w - 1)
    fy = np.clip(np.asarray(fy, dtype=np.float64), 0, h - 1)
    p = pixels.reshape(h, w).astype(np.float64)
    x1 = np.floor(fx).astype(np.int64)
    y1 = np.floor(fy).astype(np.int64)
    tx = fx - x1
    ty = fy - y1

    def cr(pm1, p0, p1, p2, t):
        # Catmull-Rom cubic (the HGT bicubic kernel)
        return 0.5 * (
            (2 * p0)
            + (-pm1 + p1) * t
            + (2 * pm1 - 5 * p0 + 4 * p1 - p2) * t * t
            + (-pm1 + 3 * p0 - 3 * p1 + p2) * t * t * t
        )

    xs = [np.clip(x1 + d, 0, w - 1) for d in (-1, 0, 1, 2)]
    ys = [np.clip(y1 + d, 0, h - 1) for d in (-1, 0, 1, 2)]
    rows = [cr(p[yy, xs[0]], p[yy, xs[1]], p[yy, xs[2]], p[yy, xs[3]], tx) for yy in ys]
    return cr(rows[0], rows[1], rows[2], rows[3], ty)
