"""LocatorConfig.xml country-name normalization.

Reference: build/LocatorConfig.java loads resources/LocatorConfig.xml
into an ``isoMap`` of UPPERCASE(trim(name | abr | variant)) -> 3-letter
ISO code (loadConfig:108-171, addISO:193-198, last write wins) plus
``defaultCountryNames`` ISO -> canonical name (:126).  Every place's
country passes through Locator.normalizeCountry (Locator.java:71,
97-114) BEFORE any city matching: variant -> ISO -> canonical name,
falling back to the input when unknown; countries declared without an
``abr`` map to the empty ISO whose canonical lookup fails, so they
also pass through unchanged.

Spark re-expression: the alias table is a few hundred rows — a
broadcast dimension joined on upper(trim(country)), pure Column work.
"""

from __future__ import annotations

import os
from functools import lru_cache
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DATA = os.path.join(os.path.dirname(__file__), os.pardir, "data")


@lru_cache(maxsize=1)
def country_aliases() -> tuple[tuple[str, str], ...]:
    """(variant_uppercase, canonical_name) rows from LocatorConfig.xml
    — only countries with a 3-letter ``abr`` normalize (see module
    docstring)."""
    tree = ElementTree.parse(os.path.join(_DATA, "LocatorConfig.xml"))
    iso_map: dict[str, str] = {}
    canonical: dict[str, str] = {}
    for c in tree.getroot().iter("country"):
        name = c.get("name")
        iso = c.get("abr")
        iso = iso.upper().strip() if iso else None
        if iso and name:
            iso_map[name.upper().strip()] = iso
            canonical[iso] = name.strip()
        if iso:
            iso_map[iso] = iso
        if iso is None and name:
            iso_map[name.upper().strip()] = ""
        for v in c.iter("variant"):
            if v.text and iso is not None:
                iso_map[v.text.upper().strip()] = iso
    return tuple(
        (variant, canonical[iso])
        for variant, iso in iso_map.items()
        if iso in canonical
    )


@lru_cache(maxsize=1)
def country_iso_map() -> dict[str, str]:
    """UPPERCASE(trim(name | abr | variant)) -> 3-letter ISO, the
    ``isoMap`` of LocatorConfig.getCountryISOCode — the lookup behind
    the ``country-ISO`` value filter (CountryISOFilter.doFilter)."""
    tree = ElementTree.parse(os.path.join(_DATA, "LocatorConfig.xml"))
    iso_map: dict[str, str] = {}
    for c in tree.getroot().iter("country"):
        iso = (c.get("abr") or "").upper().strip()
        if not iso:
            continue
        name = c.get("name")
        if name:
            iso_map[name.upper().strip()] = iso
        iso_map[iso] = iso
        for v in c.iter("variant"):
            if v.text:
                iso_map[v.text.upper().strip()] = iso
    return iso_map


def normalize_countries(places: DataFrame, col: str = "country") -> DataFrame:
    """Locator.normalizeCountry over a column: broadcast-join the
    alias dimension on upper(trim(col)), keep the input when unknown."""
    spark = places.sparkSession
    alias_df = spark.createDataFrame(
        pd.DataFrame(country_aliases(), columns=["_variant_uc", "_canonical"]),
        schema="_variant_uc string, _canonical string",
    )
    out_cols = places.columns
    j = places.join(
        F.broadcast(alias_df),
        F.upper(F.trim(F.col(col))) == F.col("_variant_uc"),
        "left",
    )
    return j.withColumn(col, F.coalesce("_canonical", F.col(col))).select(*out_cols)
