"""Local stand-in for the driver's correctness gate: run each
queries() entry AND its oracle_sql() through DuckDB at sf0.01 and
compare row count, schema (column names), and a canonical value hash
(columns sorted by name, rows sorted, values stringified).

    python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df) -> tuple[int, list[str], str]:
    import math

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False):
        vals = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            elif v is None:
                vals.append("")
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    rows.sort()
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(rows), cols, h


def main(names):
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    from mkgmap_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    names = names or sorted(queries)
    failures = 0
    for name in names:
        if name not in oracles:
            n = queries[name](spark, SF_DIR).count()
            print(f"{name}: rows-only spark_rows={n}")
            continue
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        if not ok:
            failures += 1
        print(
            f"{name}: rows {sn}/{on} {'OK' if sn==on else 'MISMATCH'}; "
            f"schema {'OK' if sc==oc else f'MISMATCH {sc} vs {oc}'}; "
            f"hash {'OK' if sh==oh else 'MISMATCH'}"
        )
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
