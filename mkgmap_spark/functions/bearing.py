"""Rhumb-line bearing (Coord.bearingToOnRhumbLine:577) — the single
shared implementation for the angle-based operators (WrongAngleFixer,
RoadMerger).  Latitudes clamp just inside the poles (map lat +-2^22
units IS +-90 deg, where the Mercator stretch is singular) and dlon
wraps across the antimeridian like the reference."""

from __future__ import annotations

import math

POLE = math.pi / 2 - 1e-9
MU = 2.0 * math.pi / (1 << 24)  # map units -> radians


def rhumb_bearing_rad_deg(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Inputs in radians; bearing in degrees."""
    lat1 = min(max(lat1, -POLE), POLE)
    lat2 = min(max(lat2, -POLE), POLE)
    dlon = lon2 - lon1
    if abs(dlon) > math.pi:
        dlon = -(2 * math.pi - dlon) if dlon > 0 else (2 * math.pi + dlon)
    dphi = math.log(math.tan(lat2 / 2 + math.pi / 4) / math.tan(lat1 / 2 + math.pi / 4))
    return math.degrees(math.atan2(dlon, dphi))


def rhumb_bearing_mu_deg(y1: float, x1: float, y2: float, x2: float) -> float:
    """Inputs in 24-bit map units; bearing in degrees."""
    return rhumb_bearing_rad_deg(y1 * MU, x1 * MU, y2 * MU, x2 * MU)
