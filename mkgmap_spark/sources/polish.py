"""Polish .mp text format source.

Reference: reader/polish/PolishMapDataSource.java — the alternate
input format ("Polish format", cGPSmapper .mp): an INI-like text file
of sections

    [IMG ID]            map header: ID=, Name=, Levels=, Level0=24 ...
    [POI] / [RGN10]     point:    Type=0x2c, Label=..., Data0=(lat,lon)
    [POLYLINE] / [RGN40] line:    Type=0x06, Data1=(lat,lon),(lat,lon)...
    [POLYGON] / [RGN80]  shape:   same, closed
    [END]

with ';' comments, Type/SubType combination (type<<8|subtype when the
type fits a byte, PolishMapDataSource.point:1xx), coordinates in
degrees converted to map units (Utils.toMapUnit rounding), Data<N>
selecting the level of appearance and EndLevel the last level
(setResolution semantics; default level table mapLevels(): 0:24,
1:22, 2:18, 3:17).

Engine shape: .mp files are whole-file records (multi-line sections
must not split across partitions), exactly how the reference consumes
them — `spark.read.text(wholetext)` gives one row per file and a
mapInPandas kernel parses each file into feature rows.  File-level
parallelism matches the reference's thread-per-input-file model; at
scale the corpus is many .mp tiles, so partitions stay balanced.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..mapunits import to_map_unit  # canonical Utils.toMapUnit rounding

DEFAULT_MP_LEVELS = {0: 24, 1: 22, 2: 18, 3: 17}  # mapLevels():96-104

_POINT_SECTIONS = {"POI", "RGN10", "RGN20"}
_LINE_SECTIONS = {"POLYLINE", "RGN40"}
_SHAPE_SECTIONS = {"POLYGON", "RGN80"}

FEATURE_SCHEMA = (
    "id long, kind string, type_code int, label string, "
    "min_res int, max_res int, lats array<int>, lons array<int>, "
    "attrs map<string,string>, road_id int, road_speed int, road_class int, "
    "oneway boolean, toll boolean, access_allowed int, "
    "nodes array<struct<index: int, node_id: long, boundary: boolean>>, "
    "numbers array<string>"
)

RESTRICTION_SCHEMA = (
    "file string, from_node long, via_node long, to_node long, "
    "from_road long, to_road long"
)


def _parse_coords(value: str) -> tuple[list[int], list[int]]:
    lats: list[int] = []
    lons: list[int] = []
    for part in value.replace("(", "").split(")"):
        part = part.strip().strip(",").strip()
        if not part:
            continue
        a, b = part.split(",", 1)
        lats.append(to_map_unit(float(a.strip())))
        lons.append(to_map_unit(float(b.strip())))
    return lats, lons


# common key=value handlers shared by every element section
# (PolishMapDataSource.isCommonValue:485-520); codepage recode and the
# '~[0x..]' label unescape are byte-encoding niceties not carried over
# (labels pass through raw — documented divergence)
_COMMON_ATTRS = {
    "ZipCode": "zip",
    "CityName": "city",
    "StreetDesc": "street",
    "HouseNumber": "housenumber",
    "is_in": "is_in",
    "Phone": "phone",
    "CountryName": "country",
    "RegionName": "region",
}

METERS_TO_FEET = 3.2808399  # PolishMapDataSource:94
_CONTOUR_TYPES = {0x20, 0x21, 0x22}

# RouteParam denied-vehicle bit order (RoadHelper.setParam:102-117)
_ACCESS_BITS = ("emergency", "delivery", "car", "bus", "taxi", "foot", "bike", "truck")


def parse_mp(
    text: str, levels: dict[int, int] | None = None
) -> tuple[list[dict], list[dict]]:
    """Parse one .mp file (PolishMapDataSource.load line loop: section
    starts on '[...', '[END' closes, 'name=value' lines accumulate the
    current element).

    Returns (features, restrictions).  Features carry the full section
    grammar: Type/SubType combination, Label (+Label2/Label3),
    Data<N>/EndLevel resolution range (multiple Data lines
    concatenate, like the reference's error-tolerant path), Origin,
    the common address attributes (ZipCode/CityName/StreetDesc/
    HouseNumber/is_in/Phone/CountryName/RegionName -> ``attrs``),
    contour-elevation feet conversion for types 0x20-0x22 when the
    header says Elevation=m (fixElevation:440-453), and the routing
    block (RoadID, RouteParam -> speed/class/oneway/toll/allowed-
    vehicle mask, Nod<i> -> (index, node_id, boundary), Numbers<i>,
    DirIndicator — RoadHelper.java).  [Restrict] sections parse
    TraffPoints/TraffRoads/Nod (restriction:773-810; only the 3-node
    form is supported, like the reference)."""
    level_bits = dict(DEFAULT_MP_LEVELS if levels is None else levels)
    feats: list[dict] = []
    restrictions: list[dict] = []
    section = None
    cur: dict | None = None
    elev_units = "m"

    def finish():
        nonlocal cur
        if cur is None:
            return
        if section == "restrict":
            if cur.get("valid", True) and cur.get("from_node") is not None:
                restrictions.append(cur)
            cur = None
            return
        if cur.get("lats"):
            data_level = cur.pop("_data_level", 0)
            end_level = cur.pop("_end_level", None)
            max_res = level_bits.get(data_level, 24)
            min_res = level_bits.get(end_level, max_res) if end_level is not None else max_res
            cur["max_res"] = max_res
            cur["min_res"] = min(min_res, max_res)
            # contour elevation: metres -> feet when units are metres
            if (
                cur["kind"] == "way"
                and cur["type_code"] in _CONTOUR_TYPES
                and elev_units == "m"
                and cur.get("label")
            ):
                try:
                    cur["label"] = str(int(int(cur["label"]) * METERS_TO_FEET))
                except ValueError:
                    pass
            feats.append(cur)
        cur = None

    def new_elem(kind):
        return {
            "kind": kind, "type_code": 0, "label": None, "lats": [], "lons": [],
            "attrs": {}, "road_id": None, "road_speed": None, "road_class": None,
            "oneway": None, "toll": None, "access_allowed": None,
            "nodes": [], "numbers": [],
        }

    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(";"):
            continue
        if line.upper().startswith("[END"):
            finish()
            section = None
            continue
        if line.startswith("["):
            name = line.strip("[]").strip().upper()
            if name in _POINT_SECTIONS:
                section, cur = "node", new_elem("node")
            elif name in _LINE_SECTIONS:
                section, cur = "line", new_elem("way")
            elif name in _SHAPE_SECTIONS:
                section, cur = "shape", new_elem("way")
            elif name == "IMG ID":
                section, cur = "imgid", None
            elif name in ("RESTRICT", "RESTRICTION"):
                section, cur = "restrict", {"valid": True}
            else:
                section, cur = None, None
            continue
        if "=" not in line:
            continue
        key, _, value = line.partition("=")
        key = key.strip()
        value = value.strip()
        if section == "imgid":
            # LevelN=bits lines override the default level table
            if key.upper().startswith("LEVEL") and key[5:].isdigit():
                level_bits[int(key[5:])] = int(value)
            elif key.startswith("Elevation"):
                elev_units = value.lower()[:1] or "m"
            continue
        if cur is None:
            continue
        if section == "restrict":
            if key == "Nod":
                cur["via_node"] = int(value)
            elif key == "TraffPoints":
                pts = value.split(",")
                if len(pts) == 3:
                    cur["from_node"] = int(pts[0])
                    cur["via_node"] = int(pts[1])
                    cur["to_node"] = int(pts[2])
                else:
                    cur["valid"] = False
            elif key == "TraffRoads":
                roads = value.split(",")
                if len(roads) >= 2:
                    cur["from_road"] = int(roads[0])
                    cur["to_road"] = int(roads[1])
            continue
        if key == "Type":
            cur["type_code"] = int(value, 0)
        elif key == "SubType":
            sub = int(value, 0)
            if cur["type_code"] <= 0xFF:
                cur["type_code"] = (cur["type_code"] << 8) | sub
        elif key == "Label":
            cur["label"] = value
        elif key in ("Label2", "Label3"):
            cur["attrs"][key.lower()] = value
        elif key in ("EndLevel", "Levels", "LevelsNumber"):
            try:
                cur["_end_level"] = int(value)
            except ValueError:
                cur["_end_level"] = 0
        elif key in _COMMON_ATTRS:
            cur["attrs"][_COMMON_ATTRS[key]] = value
        elif key.startswith("Data") and key[4:].isdigit():
            if "_data_level" not in cur:
                cur["_data_level"] = int(key[4:])
            la, lo = _parse_coords(value)
            # multiple Data lines concatenate (line():398-403)
            cur["lats"] = cur["lats"] + la
            cur["lons"] = cur["lons"] + lo
        elif key.startswith("Origin"):
            la, lo = _parse_coords(value)
            cur["lats"], cur["lons"] = la, lo
        elif section == "line" and key == "RoadID":
            cur["road_id"] = int(value)
        elif section == "line" and key in ("RouteParam", "RouteParams"):
            f = value.split(",")
            cur["road_speed"] = max(0, min(7, int(f[0])))
            cur["road_class"] = max(0, min(4, int(f[1])))
            cur["oneway"] = len(f) > 2 and int(f[2]) > 0
            cur["toll"] = len(f) > 3 and int(f[3]) > 0
            no_access = 0
            for j in range(max(0, len(f) - 4)):
                if j < len(_ACCESS_BITS) and int(f[4 + j]) != 0:
                    no_access |= 1 << j
            cur["access_allowed"] = (~no_access) & 0xFF
        elif section == "line" and key.startswith("Nod"):
            f = value.split(",")
            cur["nodes"].append(
                {
                    "index": int(f[0]),
                    "node_id": int(f[1]),
                    "boundary": len(f) > 2 and int(f[2]) > 0,
                }
            )
        elif section == "line" and key.startswith("Numbers"):
            cur["numbers"].append(value)
        elif section == "line" and key == "DirIndicator":
            cur["oneway"] = int(value) > 0 if cur["oneway"] is None else cur["oneway"]
    finish()
    return feats, restrictions


def read_polish(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of .mp files into the feature table.

    Whole-file records (sections span lines), parsed in an Arrow
    kernel; ids are deterministic: file-order hash of (file, index)."""
    files = spark.read.text(path, wholetext=True).selectExpr(
        "value", "input_file_name() as fname"
    )

    def kernel(it):
        import zlib

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                feats, _restr = parse_mp(r.value)
                # deterministic file-scoped id base (python hash() is
                # randomized per process)
                base = zlib.crc32(r.fname.encode()) & 0x7FFFFFFF
                for i, f in enumerate(feats):
                    rows.append(
                        (
                            base * 1_000_000 + i,
                            f["kind"],
                            int(f["type_code"]),
                            f["label"],
                            int(f["min_res"]),
                            int(f["max_res"]),
                            f["lats"],
                            f["lons"],
                            f["attrs"],
                            f["road_id"],
                            f["road_speed"],
                            f["road_class"],
                            f["oneway"],
                            f["toll"],
                            f["access_allowed"],
                            f["nodes"],
                            f["numbers"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "kind", "type_code", "label", "min_res", "max_res",
                    "lats", "lons", "attrs", "road_id", "road_speed",
                    "road_class", "oneway", "toll", "access_allowed", "nodes",
                    "numbers",
                ],
            )

    return files.mapInPandas(kernel, FEATURE_SCHEMA)


def read_polish_restrictions(spark: SparkSession, path: str) -> DataFrame:
    """[Restrict] sections as a turn-restriction table (the
    PolishTurnRestriction 3-node form)."""
    files = spark.read.text(path, wholetext=True).selectExpr(
        "value", "input_file_name() as fname"
    )

    def kernel(it):
        import os

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                _feats, restr = parse_mp(r.value)
                for t in restr:
                    rows.append(
                        (
                            os.path.basename(r.fname),
                            t.get("from_node"),
                            t.get("via_node"),
                            t.get("to_node"),
                            t.get("from_road"),
                            t.get("to_road"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["file", "from_node", "via_node", "to_node", "from_road", "to_road"],
            )

    return files.mapInPandas(kernel, RESTRICTION_SCHEMA)


def write_mp_fixture(path: str, features: list[dict]) -> None:
    """Serialize feature dicts back to .mp text (the second fixture
    generator SURVEY §2.1 anticipated) — exercises the full grammar
    incl. comments, SubType, EndLevel and multi-point Data lines."""
    out = ["; generated fixture", "[IMG ID]", "ID=42", "Name=fixture",
           "Levels=4", "Level0=24", "Level1=22", "Level2=18", "Level3=17", "[END-IMG ID]", ""]
    mu = 360.0 / (1 << 24)
    for f in features:
        sec = {"node": "POI", "line": "POLYLINE", "shape": "POLYGON"}[f["sec"]]
        out.append(f"[{sec}]")
        out.append(f"Type={f['type']}")
        if f.get("subtype") is not None:
            out.append(f"SubType={f['subtype']}")
        if f.get("label"):
            out.append(f"Label={f['label']}")
        if f.get("end_level") is not None:
            out.append(f"EndLevel={f['end_level']}")
        pts = ",".join(f"({la * mu:.6f},{lo * mu:.6f})" for la, lo in f["pts"])
        out.append(f"Data{f.get('data_level', 0)}={pts}")
        out.append(f"[END-{sec}]")
        out.append("")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
