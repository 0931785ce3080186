"""Cell indexing — the engine's spatial hash key.

mkgmap partitions space with fixed rasters + quadtrees
(reader/osm/boundary/BoundaryGrid.java:31-66, util/ElementQuadTreeNode.java).
The Spark-native equivalent is a power-of-2 grid cell id computed with
JVM-side bit arithmetic (``shiftright``/``shiftleft`` on int map units),
so cell assignment stays inside whole-stage codegen — no Python in the
row path.

A cell at granularity-shift ``g`` covers ``2^g x 2^g`` map units.  Cell
ids pack the (arithmetic-shifted) cell row/col into one int64::

    cell = (cy & 0xffffffff) << 32 | (cx & 0xffffffff)   conceptually
    here:  cell = (cy + OFFSET) * SPAN + (cx + OFFSET)   (positive ints)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# lat in [-2^22, 2^22], lon in [-2^23, 2^23] map units; offset keeps the
# packed key positive so DuckDB oracles can reproduce it with plain
# arithmetic (no two's-complement tricks).
CELL_OFFSET = 1 << 24
CELL_SPAN = 1 << 26


def cell_col(lat_col: Column, lon_col: Column, gshift: int) -> Column:
    """JVM-side cell id for point columns (int map units)."""
    cy = F.shiftright(lat_col.cast("long"), gshift)
    cx = F.shiftright(lon_col.cast("long"), gshift)
    return (cy + F.lit(CELL_OFFSET)) * F.lit(CELL_SPAN) + (cx + F.lit(CELL_OFFSET))


def cell_yx_cols(lat_col: Column, lon_col: Column, gshift: int) -> tuple[Column, Column]:
    return (
        F.shiftright(lat_col.cast("long"), gshift),
        F.shiftright(lon_col.cast("long"), gshift),
    )


def cell_id_sql(lat_expr: str, lon_expr: str, gshift: int) -> str:
    """ANSI-SQL equivalent of :func:`cell_col` for DuckDB oracles.

    Uses floor-division (arithmetic shift) semantics explicitly so
    negative coordinates agree with Spark's ``shiftright``.
    """
    g = 1 << gshift
    return (
        f"((CAST(floor(({lat_expr}) / {g}.0) AS BIGINT) + {CELL_OFFSET}) * {CELL_SPAN} "
        f"+ (CAST(floor(({lon_expr}) / {g}.0) AS BIGINT) + {CELL_OFFSET}))"
    )


def cell_np(lat: np.ndarray, lon: np.ndarray, gshift: int) -> np.ndarray:
    """numpy twin of :func:`cell_col` (used inside Arrow kernels)."""
    cy = np.asarray(lat, dtype=np.int64) >> gshift
    cx = np.asarray(lon, dtype=np.int64) >> gshift
    return (cy + CELL_OFFSET) * CELL_SPAN + (cx + CELL_OFFSET)


def unpack_cell(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    cy = cell // CELL_SPAN - CELL_OFFSET
    cx = cell % CELL_SPAN - CELL_OFFSET
    return cy, cx


def ring_cells(cy: int, cx: int, ring: int) -> list[tuple[int, int]]:
    """Cells at Chebyshev distance exactly ``ring`` from (cy, cx).

    Drives kNN cell-ring expansion (the distributed analogue of
    KdTree radius search, util/KdTree.java:116-143 — see operators/knn.py).
    """
    if ring == 0:
        return [(cy, cx)]
    out = []
    for dx in range(-ring, ring + 1):
        out.append((cy - ring, cx + dx))
        out.append((cy + ring, cx + dx))
    for dy in range(-ring + 1, ring):
        out.append((cy + dy, cx - ring))
        out.append((cy + dy, cx + ring))
    return out
