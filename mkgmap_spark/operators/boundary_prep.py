"""Boundary preparer — the precompiled-bounds ETL.

Reference: reader/osm/boundary/BoundaryPreprocessor.java (the
standalone tool behind the shipped ``bounds`` directory),
BoundaryElementSaver.java (the usability filter),
BoundaryLocationPreparer.java (location-info tag parsing),
BoundarySaver/BoundaryUtil (the RASTER=50000-map-unit grid split).
The reference parses an OSM extract of administrative / postal-code
boundaries, assembles multipolygons, splits every boundary along a
fixed raster, and writes per-cell quadtree files that LocationHook
later loads — the producer side of the `.bnd` tables the engine's PIP
join consumes (sources/bnd.py, operators/pip_join.py).

Spark form: the filter and tag parsing are Column/kernel work over the
raw element table; ring assembly reuses the multipolygon stitcher; the
raster split is an explode over covered cells with a vectorized
Sutherland-Hodgman clip per (boundary, cell) inside one Arrow kernel.
Output is partitionable by (cell_lat, cell_lon) — the exact layout a
1000-executor LocationHook wants to prune on.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import clip_ring
from ..functions.locator_config import country_iso_map

RASTER = 50000  # map units per grid cell (BoundaryUtil.RASTER)
UNSET_ADMIN_LEVEL = 100

_FIRST_PART_RE = re.compile(r"[,;]+")
PREFERRED_NAME_TAGS = ("name", "name:en", "int_name")  # Locator:136


def split_begin(value: int) -> int:
    """BoundaryUtil.getSplitBegin: floor to a RASTER multiple."""
    return (value // RASTER) * RASTER


def split_end(value: int) -> int:
    """BoundaryUtil.getSplitEnd: ceil to a RASTER multiple."""
    return -((-value) // RASTER) * RASTER


def _first_part(name: str | None) -> str | None:
    if name is None:
        return None
    parts = _FIRST_PART_RE.split(name)
    return parts[0].strip() if parts else None


def parse_boundary_tags(tags: dict, name_tags=("name",)) -> tuple[int, str | None, str | None]:
    """BoundaryLocationPreparer.parseTags -> (admin_level, name, zip).

    admin_level: int 2..11 when boundary=administrative, else 100.
    name: for admin_level=2 the first preferred name tag, replaced by
    its 3-letter ISO code when LocatorConfig knows the country; zips
    come from postal_code or a boundary=postal_code name."""
    boundary = tags.get("boundary")

    adm = UNSET_ADMIN_LEVEL
    if boundary == "administrative":
        try:
            lv = int(tags.get("admin_level", ""))
            if 2 <= lv <= 11:
                adm = lv
        except ValueError:
            pass

    def name_find():
        for t in name_tags:
            v = tags.get(t)
            if v is not None:
                return v
        return None

    name = None
    if tags.get("admin_level") == "2":
        for t in PREFERRED_NAME_TAGS:
            v = tags.get(t)
            if v is not None:
                name = _first_part(v)
                break
    if name is None:
        name = _first_part(name_find())

    if adm == 2:
        # Locator.addCountry: the ISO code replaces the name when any
        # preferred name tag resolves through LocatorConfig.xml
        iso_map = country_iso_map()
        for t in PREFERRED_NAME_TAGS:
            v = tags.get(t)
            if v is not None:
                iso = iso_map.get(v.upper().strip())
                if iso is not None:
                    name = iso
                    break

    zip_code = tags.get("postal_code")
    if zip_code is None and boundary == "postal_code":
        nm = tags.get("name") or name
        if nm:
            parts = nm.split(" ")
            if parts:
                zip_code = parts[0].strip()
    return adm, name, zip_code


def is_boundary(kind: str, tags: dict, closed: bool) -> bool:
    """BoundaryElementSaver.isBoundary: relations typed
    boundary/multipolygon, ways only when closed — then the
    relevant-tags check (zip set, or a real admin_level with a name;
    levels 3-11 accept any *name* key)."""
    if kind == "relation":
        if tags.get("type") not in ("boundary", "multipolygon"):
            return False
    elif kind == "way":
        if not closed:
            return False
    else:
        return False
    adm, name, zip_code = parse_boundary_tags(tags)
    if zip_code is not None:
        return True
    if adm == UNSET_ADMIN_LEVEL:
        return False
    if name is not None and name != "?":
        return True
    if 3 <= adm <= 11:
        return any("name" in k for k in tags)
    return False


BOUNDARY_SCHEMA = (
    "cell_lat int, cell_lon int, boundary_id string, admin_level int, "
    "name string, zip string, ring_idx int, is_hole boolean, "
    "lats array<int>, lons array<int>"
)


def prepare_boundaries(elements: DataFrame) -> DataFrame:
    """The full preparer: raw elements -> per-raster-cell clipped
    boundary rings with location info.

    Output partitions naturally by (cell_lat, cell_lon); boundary_id
    follows the reference's w<id>/r<id> naming (Boundary.getId)."""
    from ..sources.o5m import resolve_way_coords
    from .relations import assemble_multipolygons

    is_rel_boundary = F.col("tags").getItem("type").isin("boundary", "multipolygon")
    rels = elements.filter((F.col("kind") == "relation") & is_rel_boundary)
    ways = resolve_way_coords(elements)

    closed = (F.size("lats") >= 4) & F.expr(
        "lats[0] = lats[size(lats)-1] and lons[0] = lons[size(lons)-1]"
    )
    way_rings = (
        ways.filter(closed)
        .select(
            F.concat(F.lit("w"), F.col("id")).alias("boundary_id"),
            "tags",
            F.lit(0).alias("ring_idx"),
            F.lit(False).alias("is_hole"),
            "lats",
            "lons",
        )
    )

    rel_rings = (
        assemble_multipolygons(
            rels.select("id", "members"), ways.select("id", "lats", "lons")
        )
        .filter("closed")
        .join(
            rels.select(F.col("id").alias("rel_id"), "tags"), "rel_id"
        )
        .select(
            F.concat(F.lit("r"), F.col("rel_id")).alias("boundary_id"),
            "tags",
            "ring_idx",
            "is_hole",
            "lats",
            "lons",
        )
    )

    rings = way_rings.unionByName(rel_rings)

    def kernel(it):
        iso_cache_warm = country_iso_map()  # force-load once per worker
        del iso_cache_warm
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                tags = dict(r.tags)
                if not is_boundary(
                    "relation" if r.boundary_id.startswith("r") else "way", tags, True
                ):
                    continue
                adm, name, zip_code = parse_boundary_tags(tags)
                la = np.asarray(r.lats, dtype=np.int64)
                lo = np.asarray(r.lons, dtype=np.int64)
                lat0, lat1 = split_begin(int(la.min())), split_end(int(la.max()))
                lon0, lon1 = split_begin(int(lo.min())), split_end(int(lo.max()))
                for cy in range(lat0, max(lat1, lat0 + RASTER), RASTER):
                    for cx in range(lon0, max(lon1, lon0 + RASTER), RASTER):
                        cl, co = clip_ring(
                            la, lo, (cy, cx, cy + RASTER, cx + RASTER)
                        )
                        if len(cl) < 3:
                            continue
                        # clip_ring returns an open float ring; re-close
                        # and round back to integer map units
                        cl = np.round(np.append(cl, cl[0])).astype(np.int64)
                        co = np.round(np.append(co, co[0])).astype(np.int64)
                        rows.append(
                            (
                                cy, cx, r.boundary_id, adm, name, zip_code,
                                int(r.ring_idx), bool(r.is_hole),
                                cl.astype(np.int32).tolist(),
                                co.astype(np.int32).tolist(),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "cell_lat", "cell_lon", "boundary_id", "admin_level",
                    "name", "zip", "ring_idx", "is_hole", "lats", "lons",
                ],
            )

    return rings.mapInPandas(kernel, BOUNDARY_SCHEMA)
