"""Access bitmask derivation.

Reference: imgfmt/app/net/AccessTagsAndBits.java:27-44 — per-vehicle
access bits (foot, bicycle, car, truck, bus, taxi, emergency,
delivery) + road flags (oneway, toll, roundabout) packed into an int.

Engine form: pure bitwise Column arithmetic over the tags map; the
packed int column feeds routing attributes the way ConvertedWay
carries them (osmstyle/ConvertedWay.java).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bit positions (AccessTagsAndBits.java:27-35: FOOT=0x01, BIKE=0x02,
# CAR=0x04, DELIVERY=0x08, TRUCK=0x10, BUS=0x20, TAXI=0x40,
# EMERGENCY=0x80)
ACCESS_BITS = {
    "foot": 0,
    "bicycle": 1,
    "car": 2,
    "delivery": 3,
    "truck": 4,
    "bus": 5,
    "taxi": 6,
    "emergency": 7,
}
FLAG_BITS = {"oneway": 8, "toll": 9, "roundabout": 10}

_DENY = ("no", "private", "false", "0")


def access_mask_col(tags: Column) -> Column:
    """Packed access/flag int: bit set = access allowed / flag active.

    Rule (mirroring the reference's tag conventions): a vehicle bit is
    set unless its tag (or blanket ``access``) is a deny value; flag
    bits follow yes-ish values."""
    blanket_deny = tags.getItem("access").isin(*_DENY)
    mask = F.lit(0).cast("long")
    for veh, bit in ACCESS_BITS.items():
        v = tags.getItem(veh)
        denied = F.when(v.isNotNull(), v.isin(*_DENY)).otherwise(blanket_deny)
        allowed = F.coalesce(~denied, F.lit(True))
        mask = mask + F.when(allowed, F.lit(1 << bit).cast("long")).otherwise(F.lit(0).cast("long"))
    yes = ("yes", "true", "1")
    for flag, bit in FLAG_BITS.items():
        v = tags.getItem(flag)
        mask = mask + F.when(
            v.isNotNull() & v.isin(*yes), F.lit(1 << bit).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return mask
