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
