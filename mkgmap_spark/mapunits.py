"""Integer map-unit coordinate model.

mkgmap stores all geometry as 24-bit integer "map units":
    1 map unit = 360 / 2^24 degrees
(reference: /root/reference/src/uk/me/parabola/imgfmt/Utils.java:121
``toMapUnit`` and :176 ``toDegrees``; Coord.java:39-71 for the high-precision
delta model, which we do not need because we keep exact int32 units
end-to-end).

All engine geometry columns are int32 map units; exact integer arithmetic
makes results bit-reproducible across partitionings and cluster sizes.
"""

from __future__ import annotations

import numpy as np

# 2^24 units per 360 degrees (Utils.java:121)
MAP_UNIT_BITS = 24
UNITS_PER_CIRCLE = 1 << MAP_UNIT_BITS  # 16_777_216
MAX_LAT_MU = 1 << (MAP_UNIT_BITS - 2)  # +/-90 deg  -> +/-2^22... (not clamped)

# Level pyramid default "0:24, 1:22, 2:20, 3:18, 4:16"
# (reference: general/LevelInfo.java:40; shift = 24 - resolution,
#  imgfmt/app/trergn/Zoom.java:70-74)
DEFAULT_LEVELS: tuple[tuple[int, int], ...] = ((0, 24), (1, 22), (2, 20), (3, 18), (4, 16))
MAX_RESOLUTION = 24


def shift_for_resolution(resolution: int) -> int:
    """Zoom shift = 24 - resolution (Zoom.java:70-74)."""
    return MAX_RESOLUTION - resolution


def to_map_unit(deg: "float | np.ndarray") -> "int | np.ndarray":
    """Degrees -> integer map units, rounding half away from zero like
    Utils.toMapUnit (Utils.java:121: ``(int)((l + 0.5) / UNIT)`` style)."""
    scaled = np.asarray(deg, dtype=np.float64) * UNITS_PER_CIRCLE / 360.0
    out = np.where(scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)).astype(np.int64)
    if np.isscalar(deg) or getattr(deg, "ndim", 0) == 0:
        return int(out)
    return out


def to_degrees(mu: "int | np.ndarray") -> "float | np.ndarray":
    """Integer map units -> degrees (Utils.java:176)."""
    out = np.asarray(mu, dtype=np.float64) * 360.0 / UNITS_PER_CIRCLE
    if np.isscalar(mu) or getattr(mu, "ndim", 0) == 0:
        return float(out)
    return out


def round_pof2(val: int, shift: int) -> int:
    """Round to a multiple of 2^shift, binary half rounds up.

    Exact port of the rounding rule used when splitting areas
    (imgfmt/app/Area.java:150-158 ``roundPof2``) so that every tile
    boundary our quadtree produces is a multiple of 2^shift.  Works for
    negative values like Java's arithmetic shift.
    """
    if shift <= 0:
        return val
    return (((val >> (shift - 1)) + 1) >> 1) << shift


def floor_pof2(val: int, shift: int) -> int:
    """Floor to a multiple of 2^shift (arithmetic, negative-safe)."""
    if shift <= 0:
        return val
    return (val >> shift) << shift


def ceil_pof2(val: int, shift: int) -> int:
    """Ceil to a multiple of 2^shift (arithmetic, negative-safe)."""
    if shift <= 0:
        return val
    return ((val + (1 << shift) - 1) >> shift) << shift
