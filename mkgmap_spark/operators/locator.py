"""Locator: city/region/country autofill for place points.

Reference: build/Locator.java — places that already carry a city
become the city index (name -> points multimap + a kd-tree,
addCity:429-441); the remaining places resolve over up to two runs
(autofillCities:341-421):

1. ``is_in`` match (findCityByIsIn:283-338): the place's ``is_in``
   list (comma-separated, trimmed) is matched against city NAMES; of
   all matching cities the NEAREST by distance wins, and the place
   adopts its city/zip (fill-only), then region/country;
2. places resolved in run 1 join the city index, so run 2 can resolve
   through them (the do/while cascade);
3. in the LAST run, still-unresolved places fall back to the nearest
   known city overall ('nearest' autofill): they adopt its
   region/country and become a city under their OWN name when the
   neighbour has a country; any place still cityless takes its own
   name as city.

Spark re-expression: each run is a split-explode of ``is_in`` joined
against the city-name index plus a min_by(distance) aggregation — all
JVM-side Column work; the final-run nearest fallback reuses the
cell-ring kNN join (operators/knn.py) with k=1 (broadcast-side small
city sets short-circuit to a broadcast join).  Ties on distance break
by the smallest city id — deterministic under any partitioning (the
reference keeps the first-seen minimum, an iteration-order artifact).

The reference's soundslike search is an unimplemented TODO there
(autofillCities:366-368) — nothing to carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import materialize

PLACE_COLS = ("id", "name", "city", "region", "country", "zip", "is_in", "lat", "lon")


def _adopt(df: DataFrame, src_prefix: str) -> DataFrame:
    """Fill-only adoption of city/zip/region/country from matched
    columns ``{src_prefix}city`` etc. (autofillCities:371-383)."""
    return (
        df.withColumn("city", F.coalesce("city", f"{src_prefix}city"))
        .withColumn("zip", F.coalesce("zip", f"{src_prefix}zip"))
        .withColumn("region", F.coalesce("region", f"{src_prefix}region"))
        .withColumn("country", F.coalesce("country", f"{src_prefix}country"))
    )


def _city_index(places: DataFrame) -> DataFrame:
    """Cities = places that carry a city; indexed under their NAME
    (addCity uses p.getName(), Locator.java:75-81)."""
    return places.filter(F.col("city").isNotNull() & F.col("name").isNotNull()).select(
        F.col("id").alias("c_id"),
        F.col("name").alias("c_name"),
        F.col("city").alias("c_city"),
        F.col("zip").alias("c_zip"),
        F.col("region").alias("c_region"),
        F.col("country").alias("c_country"),
        F.col("lat").alias("c_lat"),
        F.col("lon").alias("c_lon"),
    )


def _is_in_match(unresolved: DataFrame, cities: DataFrame) -> DataFrame:
    """(place id -> nearest city matching any is_in component)."""
    cand = unresolved.select(
        "id", "lat", "lon",
        F.explode(F.split(F.col("is_in"), ",")).alias("_c"),
    ).withColumn("_c", F.trim(F.col("_c")))
    joined = cand.join(cities, cand["_c"] == cities["c_name"])
    d2 = (
        (F.col("lat").cast("long") - F.col("c_lat")) ** 2
        + (F.col("lon").cast("long") - F.col("c_lon")) ** 2
    )
    return (
        joined.groupBy("id")
        .agg(
            F.min_by(
                F.struct("c_city", "c_zip", "c_region", "c_country"),
                F.struct(d2.alias("d2"), F.col("c_id")),
            ).alias("_m")
        )
        .select(
            "id",
            F.col("_m.c_city").alias("m_city"),
            F.col("_m.c_zip").alias("m_zip"),
            F.col("_m.c_region").alias("m_region"),
            F.col("_m.c_country").alias("m_country"),
        )
    )


def autofill_cities(
    places: DataFrame,
    runs: int = 2,
    autofill: tuple[str, ...] = ("is_in", "nearest"),
    knn_gshift: int | None = None,  # None: density-auto-tuned (knn.py)
) -> DataFrame:
    """places: (id, name, city, region, country, zip, is_in, lat, lon).
    Returns the same columns with autofilled city/region/country/zip.
    """
    if "is_in" not in autofill and "nearest" not in autofill:
        return places
    # Locator.java:71: setCountry(normalizeCountry(...)) as each place
    # enters, BEFORE any matching — so variants like 'DEU' /
    # 'Deutschland' index and adopt as one country
    from ..functions.locator_config import normalize_countries

    cur = normalize_countries(places.select(*PLACE_COLS)).transform(materialize)
    for run in range(runs):
        last = run == runs - 1
        cities = _city_index(cur)
        unresolved = cur.filter(F.col("city").isNull())
        resolved = cur.filter(F.col("city").isNotNull())
        if "is_in" in autofill:
            m = _is_in_match(unresolved, cities)
            unresolved = _adopt(unresolved.join(m, "id", "left"), "m_").drop(
                "m_city", "m_zip", "m_region", "m_country"
            )
        if last and "nearest" in autofill:
            from .knn import knn_join

            still = unresolved.filter(F.col("city").isNull())
            if not still.isEmpty():
                near = knn_join(
                    still.select("id", F.col("lat").alias("ay"), F.col("lon").alias("ax")),
                    cities.select(
                        F.col("c_id").alias("rid"),
                        F.col("c_lat").alias("ry"),
                        F.col("c_lon").alias("rx"),
                    ),
                    k=1,
                    gshift=knn_gshift,
                ).select("id", "rid")
                attrs = cities.select(
                    F.col("c_id").alias("rid"), "c_city", "c_zip", "c_region",
                    "c_country",
                )
                near = near.join(attrs, "rid").select(
                    "id",
                    # nearest fallback: city becomes the place's OWN
                    # name, only when the neighbour knows its country
                    # (autofillCities:385-393)
                    F.col("c_country").alias("n_country"),
                    F.col("c_region").alias("n_region"),
                )
                unresolved = (
                    unresolved.join(near, "id", "left")
                    .withColumn(
                        "city",
                        F.coalesce(
                            "city",
                            F.when(F.col("n_country").isNotNull(), F.col("name")),
                        ),
                    )
                    .withColumn("region", F.coalesce("region", "n_region"))
                    .withColumn("country", F.coalesce("country", "n_country"))
                    .drop("n_country", "n_region")
                )
            # final fallback: own name (autofillCities:406-409)
            unresolved = unresolved.withColumn("city", F.coalesce("city", "name"))
        cur = resolved.select(*PLACE_COLS).unionByName(
            unresolved.select(*PLACE_COLS)
        ).transform(materialize)
    return cur
