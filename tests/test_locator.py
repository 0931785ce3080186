"""Locator autofill (build/Locator.java autofillCities): is_in match
to the nearest matching city, two-run cascade, nearest fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.operators.locator import autofill_cities

SCHEMA = (
    "id long, name string, city string, region string, country string, "
    "zip string, is_in string, lat int, lon int"
)


def test_is_in_nearest_match(spark):
    rows = [
        # two cities named 'Alt' at different distances + one 'Neu'
        (1, "Alt", "Alt", "R1", "C1", "11", None, 0, 0),
        (2, "Alt", "Alt", "R2", "C2", "22", None, 0, 10000),
        (3, "Neu", "Neu", "R3", "C3", "33", None, 0, 50000),
        # place: is_in matches 'Alt' (both) and 'Nowhere'; nearest is id 2
        (10, "Dorf", None, None, None, None, "Nowhere, Alt", 0, 12000),
        # place matching nothing, no nearest autofill -> own name at the end
        (11, "Weiler", None, None, None, None, "Unknown", 0, 90000),
    ]
    out = autofill_cities(
        spark.createDataFrame(rows, SCHEMA), autofill=("is_in",)
    ).collect()
    by = {r["id"]: r for r in out}
    assert by[10]["city"] == "Alt" and by[10]["region"] == "R2"
    assert by[10]["country"] == "C2" and by[10]["zip"] == "22"
    # no 'nearest' autofill: final own-name fallback does not apply
    assert by[11]["city"] is None


def test_two_run_cascade(spark):
    """A place resolved in run 1 becomes a city for run 2."""
    rows = [
        (1, "Haupt", "Haupt", "R", "C", None, None, 0, 0),
        # resolves via Haupt in run 1 -> becomes city 'Mittel'
        (10, "Mittel", None, None, None, None, "Haupt", 0, 1000),
        # only resolvable through Mittel -> needs run 2
        (11, "Klein", None, None, None, None, "Mittel", 0, 2000),
    ]
    out = autofill_cities(
        spark.createDataFrame(rows, SCHEMA), autofill=("is_in",)
    ).collect()
    by = {r["id"]: r for r in out}
    assert by[10]["city"] == "Haupt"
    assert by[11]["city"] == "Haupt"  # adopted Mittel's resolved city
    assert by[11]["country"] == "C"


def test_nearest_fallback(spark):
    rows = [
        (1, "Stadt", "Stadt", "R", "C", "99", None, 0, 0),
        # no is_in at all: last-run nearest fallback; neighbour has a
        # country -> city = own name, region/country adopted
        (10, "Flecken", None, None, None, None, None, 0, 5000),
    ]
    out = autofill_cities(spark.createDataFrame(rows, SCHEMA)).collect()
    by = {r["id"]: r for r in out}
    assert by[10]["city"] == "Flecken"
    assert by[10]["region"] == "R" and by[10]["country"] == "C"
    # zip is NOT adopted on the nearest path (only is_in adopts zip)
    assert by[10]["zip"] is None


def test_country_aliases_parse():
    """LocatorConfig.xml alias semantics (build/LocatorConfig.java
    loadConfig/addISO): variants, names and ISO codes all normalize to
    the canonical name attribute; lookups are upper+trim."""
    from mkgmap_spark.functions.locator_config import country_aliases

    amap = dict(country_aliases())
    assert amap["DEU"] == "Deutschland"
    assert amap["GERMANY"] == "Deutschland"
    assert amap["DEUTSCHLAND"] == "Deutschland"
    assert amap["FRA"] == "France"
    assert amap["FRANCE"] == "France"
    assert amap["ÅLAND"] == "Åland Islands"
    # a few hundred countries, each with >= 1 variant
    assert len(amap) > 400


def test_normalize_countries_column(spark):
    from mkgmap_spark.functions.locator_config import normalize_countries

    df = spark.createDataFrame(
        [(1, "DEU"), (2, " germany "), (3, "Atlantis"), (4, None), (5, "france")],
        "id int, country string",
    )
    got = {r["id"]: r["country"] for r in normalize_countries(df).collect()}
    assert got == {
        1: "Deutschland",
        2: "Deutschland",  # upper+trim lookup matches -> replaced
        3: "Atlantis",  # unknown -> unchanged
        4: None,
        5: "France",
    }
