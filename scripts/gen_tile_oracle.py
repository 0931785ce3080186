"""Generate the embedded tile table for the tile_assign SQL oracle.

The driver's correctness gate runs oracle SQL at sf0.01; tile_assign's
quadtree is data-dependent, so its DuckDB twin needs the tile tree for
exactly that dataset.  This script derives it with the INDEPENDENT
element-at-a-time oracle (mkgmap_spark/oracle/tiles.py — no engine code
in the loop) over the same synthetic points q_tile_assign builds from
lineitem keys, and stores it as JSON data.  The pytest
tests/test_tiling.py::test_tile_oracle_data_current regenerates and
compares, so the stored table cannot go stale silently.

Usage: python scripts/gen_tile_oracle.py [sf_dir] [out.json.gz]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from mkgmap_spark.oracle.tiles import split_oracle  # noqa: E402

# the synthetic coordinate constants (mkgmap_spark/queries.py:28-33);
# duplicated here so generation does not import queries (whose oracle
# strings load the very file this script writes)
C_LAT = 2654435761
C_LON = 2246822519
LAT_MOD = 1 << 23
LON_MOD = 1 << 24
LAT_OFF = 1 << 22
LON_OFF = 1 << 23


def tile_assign_elements(sf_dir: str) -> list[dict]:
    """The exact point set q_tile_assign derives from lineitem."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT l_orderkey * 8 + l_linenumber AS id "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') ORDER BY id"
    ).fetchall()
    out = []
    for (k,) in rows:
        out.append(
            {
                "id": int(k),
                "kind_i": 0,
                "ay": int((k * C_LAT) % LAT_MOD - LAT_OFF),
                "ax": int((k * C_LON) % LON_MOD - LON_OFF),
                "size_bytes": 9,
            }
        )
    return out


def generate(sf_dir: str) -> list[list[int]]:
    elements = tile_assign_elements(sf_dir)
    tiles, _members = split_oracle(elements, shift=0)
    return [
        [t["tile_id"], t["min_lat"], t["min_lon"], t["max_lat"], t["max_lon"], t["n_slots"]]
        for t in tiles
    ]


def generate_all(sf_dirs: list[str]) -> dict[str, list[list[int]]]:
    """Trees keyed by the dataset's lineitem row count — the SQL
    oracle self-selects the tree matching COUNT(*) FROM lineitem, so
    one static string serves every gate scale."""
    import duckdb

    out = {}
    for sf_dir in sf_dirs:
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/lineitem.parquet')"
        ).fetchone()[0]
        out[str(n)] = generate(sf_dir)
    return out


if __name__ == "__main__":
    import gzip

    sf_dirs = sys.argv[1:-1] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    out = (
        sys.argv[-1]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            os.pardir, "mkgmap_spark", "data", "tile_oracle.json.gz",
        )
    )
    table = generate_all(sf_dirs)
    with gzip.open(out, "wt", compresslevel=9) as f:
        json.dump(table, f)
    for k, v in table.items():
        print(f"lineitem rows {k}: {len(v)} tiles")
    print(f"-> {out}")
