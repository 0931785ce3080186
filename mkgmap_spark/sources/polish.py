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
    "min_res int, max_res int, lats array<int>, lons array<int>"
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


def parse_mp(text: str, levels: dict[int, int] | None = None) -> list[dict]:
    """Parse one .mp file into feature dicts (PolishMapDataSource.load
    line loop: section starts on '[...', '[END' closes, 'name=value'
    lines accumulate the current element)."""
    level_bits = dict(DEFAULT_MP_LEVELS if levels is None else levels)
    feats: list[dict] = []
    section = None
    cur: dict | None = None

    def finish():
        nonlocal cur
        if cur is not None and cur.get("lats"):
            data_level = cur.pop("_data_level", 0)
            end_level = cur.pop("_end_level", None)
            max_res = level_bits.get(data_level, 24)
            min_res = level_bits.get(end_level, max_res) if end_level is not None else max_res
            cur["max_res"] = max_res
            cur["min_res"] = min(min_res, max_res)
            feats.append(cur)
        cur = None

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
                section, cur = "node", {"kind": "node", "type_code": 0, "label": None, "lats": [], "lons": []}
            elif name in _LINE_SECTIONS:
                section, cur = "line", {"kind": "way", "type_code": 0, "label": None, "lats": [], "lons": []}
            elif name in _SHAPE_SECTIONS:
                section, cur = "shape", {"kind": "way", "type_code": 0, "label": None, "lats": [], "lons": []}
            elif name == "IMG ID":
                section, cur = "imgid", None
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
            continue
        if cur is None:
            continue
        if key == "Type":
            cur["type_code"] = int(value, 0)
        elif key == "SubType":
            sub = int(value, 0)
            if cur["type_code"] <= 0xFF:
                cur["type_code"] = (cur["type_code"] << 8) | sub
        elif key == "Label":
            cur["label"] = value
        elif key == "EndLevel":
            cur["_end_level"] = int(value)
        elif key.startswith("Data") and key[4:].isdigit():
            cur["_data_level"] = int(key[4:])
            la, lo = _parse_coords(value)
            cur["lats"], cur["lons"] = la, lo
        elif key.startswith("Origin"):
            la, lo = _parse_coords(value)
            cur["lats"], cur["lons"] = la, lo
    finish()
    return feats


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
                feats = parse_mp(r.value)
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
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "kind", "type_code", "label", "min_res", "max_res", "lats", "lons"],
            )

    return files.mapInPandas(kernel, FEATURE_SCHEMA)


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
