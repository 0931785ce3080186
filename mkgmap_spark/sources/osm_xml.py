"""OSM XML source.

Reference: reader/osm/xml/OsmXmlHandler.java — SAX parse of
`.osm` files into nodes/ways/relations (+bounds).  Engine form: one
Arrow kernel per file using the stdlib XML parser — an .osm extract is
a whole-file record, and file-level parallelism matches the
reference's thread-per-input-file model.  Output is the same raw
element table as sources/o5m.py (share `resolve_way_coords` etc.).

Coordinates: degrees -> 24-bit map units (Utils.toMapUnit rounding).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..mapunits import to_map_unit  # canonical Utils.toMapUnit rounding
from .o5m import O5M_SCHEMA, squash_raw_tags


def parse_osm_xml(text: str) -> list[dict]:
    """One .osm document -> element dicts (id, kind, tags, lat/lon map
    units | refs | members).  Element order is preserved."""
    root = ET.fromstring(text)
    out: list[dict] = []
    for el in root:
        if el.tag == "node":
            out.append(
                {
                    "id": int(el.get("id")),
                    "kind": "node",
                    "tags": {t.get("k"): t.get("v") for t in el if t.tag == "tag"},
                    "lat": to_map_unit(float(el.get("lat"))),
                    "lon": to_map_unit(float(el.get("lon"))),
                }
            )
        elif el.tag == "way":
            out.append(
                {
                    "id": int(el.get("id")),
                    "kind": "way",
                    "tags": {t.get("k"): t.get("v") for t in el if t.tag == "tag"},
                    "refs": [int(n.get("ref")) for n in el if n.tag == "nd"],
                }
            )
        elif el.tag == "relation":
            out.append(
                {
                    "id": int(el.get("id")),
                    "kind": "relation",
                    "tags": {t.get("k"): t.get("v") for t in el if t.tag == "tag"},
                    "members": [
                        {
                            "role": m.get("role", ""),
                            "mtype": m.get("type"),
                            "ref": int(m.get("ref")),
                        }
                        for m in el
                        if m.tag == "member"
                    ],
                }
            )
    return out


def read_osm_xml(spark: SparkSession, path: str) -> DataFrame:
    """Read .osm files into the raw element table (O5M_SCHEMA)."""
    files = spark.read.text(path, wholetext=True).select("value")

    def kernel(it):
        for pdf in it:
            rows = []
            for text in pdf["value"]:
                for el in parse_osm_xml(text):
                    rows.append(
                        (
                            el["id"],
                            el["kind"],
                            squash_raw_tags(el.get("tags", {})),
                            el.get("lat"),
                            el.get("lon"),
                            el.get("refs"),
                            el.get("members"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["id", "kind", "tags", "lat", "lon", "refs", "members"]
            )

    return files.mapInPandas(kernel, O5M_SCHEMA)


def _attr(v: str) -> str:
    """Escape an attribute value; tab/newline go out as character
    references so XML attribute-value normalization can't fold them."""
    v = v.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
    return v.replace("\t", "&#9;").replace("\n", "&#10;").replace("\r", "&#13;")


def write_osm_xml_fixture(path: str, elements: list[dict]) -> None:
    """Serialize element dicts back to .osm text (fixture generator;
    coordinates given in degrees via 'lat_deg'/'lon_deg')."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', '<osm version="0.6" generator="fixture">']
    for el in elements:
        tags = "".join(
            f'<tag k="{_attr(k)}" v="{_attr(v)}"/>' for k, v in el.get("tags", {}).items()
        )
        if el["kind"] == "node":
            lines.append(
                f'<node id="{el["id"]}" lat="{el["lat_deg"]:.7f}" lon="{el["lon_deg"]:.7f}">{tags}</node>'
            )
        elif el["kind"] == "way":
            nds = "".join(f'<nd ref="{r}"/>' for r in el["refs"])
            lines.append(f'<way id="{el["id"]}">{nds}{tags}</way>')
        else:
            mem = "".join(
                f'<member type="{m["mtype"]}" ref="{m["ref"]}" role="{m["role"]}"/>'
                for m in el["members"]
            )
            lines.append(f'<relation id="{el["id"]}">{mem}{tags}</relation>')
    lines.append("</osm>")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
