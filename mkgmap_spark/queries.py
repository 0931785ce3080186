"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 against the
driver-provided testdata tables (TPC-H-ish star schema + documents +
embeddings).  Spatial inputs are synthesized *deterministically inside
the query* from integer keys (same arithmetic in Spark and in the SQL
oracle), so both sides see identical geometry without external data.

Numeric discipline for oracle parity:
- geometry is exact int64 arithmetic (map units, squared distances);
- money/value sums go through cents (``cast(round(x*100) as bigint)``)
  — float summation order would otherwise make hashes diverge;
- embeddings are quantized to int (``round(x*10000)``) before dot
  products, making similarity ranking exactly reproducible.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cells import CELL_OFFSET, CELL_SPAN
from .plans.materialize import materialize, materialize_lazy

# deterministic key->coordinate scatter (Knuth multiplicative constants)
C_LAT = 2654435761
C_LON = 2246822519
LAT_MOD = 1 << 23  # -> lat in [-2^22, 2^22)
LON_MOD = 1 << 24  # -> lon in [-2^23, 2^23)
LAT_OFF = 1 << 22
LON_OFF = 1 << 23


def lat_col(key) -> F.Column:
    return F.pmod(F.col(key).cast("long") * C_LAT, F.lit(LAT_MOD)) - LAT_OFF


def lon_col(key) -> F.Column:
    return F.pmod(F.col(key).cast("long") * C_LON, F.lit(LON_MOD)) - LON_OFF


def lat_sql(key: str) -> str:
    return f"(({key} * {C_LAT}) % {LAT_MOD} - {LAT_OFF})"


def lon_sql(key: str) -> str:
    return f"(({key} * {C_LON}) % {LON_MOD} - {LON_OFF})"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cell_sql(lat: str, lon: str, g: int) -> str:
    size = 1 << g
    return (
        f"((CAST(floor(({lat}) / {size}.0) AS BIGINT) + {CELL_OFFSET}) * {CELL_SPAN}"
        f" + CAST(floor(({lon}) / {size}.0) AS BIGINT) + {CELL_OFFSET})"
    )


# --------------------------------------------------------------------------
# q: cell indexing (functions/cells.py — BoundaryGrid raster semantics)
# --------------------------------------------------------------------------


def q_cell_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = 16
    cust = _read(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("key"),
        lat_col("c_custkey").alias("lat"),
        lon_col("c_custkey").alias("lon"),
    )
    cy = F.shiftright(F.col("lat"), g)
    cx = F.shiftright(F.col("lon"), g)
    cell = (cy + CELL_OFFSET) * CELL_SPAN + cx + CELL_OFFSET
    return (
        pts.groupBy(cell.alias("cell_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
        )
    )


Q_CELL_INDEX_SQL = f"""
SELECT {cell_sql(lat_sql('c_custkey'), lon_sql('c_custkey'), 16)} AS cell_id,
       COUNT(*) AS n_points,
       MIN({lat_sql('c_custkey')}) AS min_lat,
       MAX({lat_sql('c_custkey')}) AS max_lat
FROM customer
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q: tile histogram over lineitem (the tiling core's first aggregation)
# --------------------------------------------------------------------------


def q_tile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = 18
    li = _read(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber").cast("long")).alias("key")
    pts = li.select(
        key,
        F.pmod((F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber")) * C_LAT, F.lit(LAT_MOD)).alias("_a"),
        F.pmod((F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber")) * C_LON, F.lit(LON_MOD)).alias("_b"),
    ).select(
        "key",
        (F.col("_a") - LAT_OFF).alias("lat"),
        (F.col("_b") - LON_OFF).alias("lon"),
    )
    cy = F.shiftright(F.col("lat"), g)
    cx = F.shiftright(F.col("lon"), g)
    cell = (cy + CELL_OFFSET) * CELL_SPAN + cx + CELL_OFFSET
    return pts.groupBy(cell.alias("cell_id")).agg(F.count(F.lit(1)).alias("n"))


Q_TILE_HISTOGRAM_SQL = f"""
WITH pts AS (
  SELECT {lat_sql('(l_orderkey * 8 + l_linenumber)')} AS lat,
         {lon_sql('(l_orderkey * 8 + l_linenumber)')} AS lon
  FROM lineitem
)
SELECT {cell_sql('lat', 'lon', 18)} AS cell_id, COUNT(*) AS n
FROM pts GROUP BY 1
"""


# --------------------------------------------------------------------------
# q: point-in-rectangle spatial join (LocationHook PIP join, rect case)
# --------------------------------------------------------------------------

RECT_HY = 200_000
RECT_HX = 300_000


def q_pip_rect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        lat_col("c_custkey").alias("lat"),
        lon_col("c_custkey").alias("lon"),
    )
    nat = _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey"),
        F.col("n_name"),
        (lat_col("n_nationkey")).alias("cy"),
        (lon_col("n_nationkey")).alias("cx"),
    )
    joined = cust.join(
        F.broadcast(nat),
        (F.col("lat") >= F.col("cy") - RECT_HY)
        & (F.col("lat") < F.col("cy") + RECT_HY)
        & (F.col("lon") >= F.col("cx") - RECT_HX)
        & (F.col("lon") < F.col("cx") + RECT_HX),
        "inner",
    )
    return joined.groupBy("n_nationkey", "n_name").agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.min("c_custkey").alias("min_custkey"),
    )


Q_PIP_RECT_JOIN_SQL = f"""
WITH pts AS (
  SELECT c_custkey, {lat_sql('c_custkey')} AS lat, {lon_sql('c_custkey')} AS lon FROM customer
), rects AS (
  SELECT n_nationkey, n_name,
         {lat_sql('n_nationkey')} AS cy, {lon_sql('n_nationkey')} AS cx FROM nation
)
SELECT n_nationkey, n_name, COUNT(*) AS n_inside, MIN(c_custkey) AS min_custkey
FROM pts JOIN rects
  ON lat >= cy - {RECT_HY} AND lat < cy + {RECT_HY}
 AND lon >= cx - {RECT_HX} AND lon < cx + {RECT_HX}
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q: kNN join (HousenumberGenerator / KdTree semantics)
# --------------------------------------------------------------------------


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship kNN: the strategy dispatcher.  The supplier side scales
    with sf, so above the broadcast threshold this takes the cell-ring
    path (equi-joins only — no BroadcastNestedLoopJoin at bench sf)."""
    from .operators.knn import knn_join

    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        lat_col("c_custkey").alias("ay"),
        lon_col("c_custkey").alias("ax"),
    )
    supp = _read(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("rid"),
        lat_col("s_suppkey").alias("ry"),
        lon_col("s_suppkey").alias("rx"),
    )
    # the supplier side scales with sf — declare it so the dispatcher
    # skips its limit-257 cardinality probe (one whole extra job per
    # bench run, round-4 verdict bench item 1)
    out = knn_join(cust, supp, k=3, strategy="cells")
    return out.select(
        F.col("id").alias("c_custkey"),
        F.col("rid").alias("s_suppkey"),
        F.col("rank").cast("int").alias("rank"),
        F.col("dist2"),
    )


Q_KNN_SQL = f"""
WITH c AS (
  SELECT c_custkey, {lat_sql('c_custkey')} AS ay, {lon_sql('c_custkey')} AS ax FROM customer
), s AS (
  SELECT s_suppkey, {lat_sql('s_suppkey')} AS ry, {lon_sql('s_suppkey')} AS rx FROM supplier
), d AS (
  SELECT c_custkey, s_suppkey,
         (ay - ry) * (ay - ry) + (ax - rx) * (ax - rx) AS dist2,
         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY (ay - ry) * (ay - ry) + (ax - rx) * (ax - rx), s_suppkey) AS rank
  FROM c CROSS JOIN s
)
SELECT c_custkey, s_suppkey, CAST(rank AS INT) AS rank, dist2 FROM d WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# q: orientation / shoelace semantics (Way.clockwise, exact ints)
# --------------------------------------------------------------------------


def q_triangle_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _read(spark, sf_dir, "part")
    k = F.col("p_partkey").cast("long")
    y1 = F.pmod(k * C_LAT, F.lit(LAT_MOD)) - LAT_OFF
    x1 = F.pmod(k * C_LON, F.lit(LON_MOD)) - LON_OFF
    y2 = F.pmod((k + 7) * C_LAT, F.lit(LAT_MOD)) - LAT_OFF
    x2 = F.pmod((k + 7) * C_LON, F.lit(LON_MOD)) - LON_OFF
    y3 = F.pmod((k + 13) * C_LAT, F.lit(LAT_MOD)) - LAT_OFF
    x3 = F.pmod((k + 13) * C_LON, F.lit(LON_MOD)) - LON_OFF
    area2 = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    return part.select(
        F.col("p_partkey"),
        area2.alias("area2"),
        (area2 > 0).alias("is_ccw"),
    )


Q_TRIANGLE_SQL = f"""
WITH t AS (
  SELECT p_partkey,
         {lat_sql('p_partkey')} AS y1, {lon_sql('p_partkey')} AS x1,
         {lat_sql('(p_partkey + 7)')} AS y2, {lon_sql('(p_partkey + 7)')} AS x2,
         {lat_sql('(p_partkey + 13)')} AS y3, {lon_sql('(p_partkey + 13)')} AS x3
  FROM part
)
SELECT p_partkey,
       (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1) AS area2,
       ((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) > 0 AS is_ccw
FROM t
"""


# --------------------------------------------------------------------------
# q: exact dedup on documents (training-data op)
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    return (
        docs.groupBy(fp.alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


Q_DEDUP_EXACT_SQL = """
SELECT md5(COALESCE(text, '')) AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


# --------------------------------------------------------------------------
# q: token counting + quality proxies (text analysis ops)
# --------------------------------------------------------------------------


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    trimmed = F.trim(t)
    n_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, " "))
    )
    return docs.select(
        "doc_id",
        "lang",
        F.length(t).cast("long").alias("n_chars_obs"),
        n_tokens.cast("long").alias("n_tokens"),
    )


Q_TOKEN_STATS_SQL = """
SELECT doc_id, lang,
       CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars_obs,
       CAST(CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
                 ELSE len(string_split(trim(COALESCE(text, '')), ' ')) END AS BIGINT) AS n_tokens
FROM documents
"""


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0)).cast("long")).alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


Q_LANG_PROFILE_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(CAST(COALESCE(n_chars, 0) AS BIGINT)) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc_id
FROM documents GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q: aggregation discipline (per-area size accounting analogue — TPC-H Q1
#    shape; sums in exact cents so hashes are reproducible)
# --------------------------------------------------------------------------


def q_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(cents).alias("sum_price_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q_LINEITEM_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q: window functions over events (order-sensitive per-key sequences —
#    the engine's analogue of per-feature point-order operations)
# --------------------------------------------------------------------------


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


Q_EVENTS_WINDOW_SQL = """
SELECT event_id, user_id, event_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
FROM events
"""


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    val_cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "purchase", val_cents).otherwise(0)).alias(
            "purchase_cents"
        ),
        F.max(val_cents).alias("max_cents"),
    )


Q_EVENTS_USER_STATS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents,
       MAX(CAST(round(value * 100, 0) AS BIGINT)) AS max_cents
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# q: similarity search — top-k inner product over quantized embeddings
# --------------------------------------------------------------------------

N_QUERY_VECS = 10
EMB_SCALE = 10_000


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(f"transform(embedding, x -> cast(round(x * {EMB_SCALE}, 0) as bigint))").alias("qv"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qe")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    dot = F.expr("aggregate(zip_with(qe, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        pairs.withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "rank", "dot")
    )


Q_EMBEDDING_TOPK_SQL = f"""
WITH qe AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(round(x * {EMB_SCALE}, 0) AS BIGINT)) AS qe
  FROM embeddings WHERE vec_id < {N_QUERY_VECS}
), ne AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * {EMB_SCALE}, 0) AS BIGINT)) AS qv
  FROM embeddings
), d AS (
  SELECT qid, vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(qe) + 1), i -> qe[i] * qv[i])) AS BIGINT) AS dot
  FROM qe CROSS JOIN ne WHERE vec_id <> qid
), r AS (
  SELECT qid, neighbor_id, dot,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, neighbor_id) AS INT) AS rank
  FROM d
)
SELECT qid, neighbor_id, rank, dot FROM r WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# q: flagship tile assignment (no SQL oracle — quadtree driver loop;
#    correctness is covered by the pytest differential oracle)
# --------------------------------------------------------------------------


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import tiling

    li = _read(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber").cast("long"))
    pts = li.select(
        key.alias("id"),
        (F.pmod(key * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int").alias("ay"),
        (F.pmod(key * C_LON, F.lit(LON_MOD)) - LON_OFF).cast("int").alias("ax"),
    ).withColumn("kind_i", F.lit(0)).withColumn("size_bytes", F.lit(9).cast("long")).withColumn(
        "min_res", F.lit(24)
    )
    # one scan, not four: every refinement round's histogram job and
    # the final assignment re-read the prepared features — materialize
    # them once (the flagship pipeline does the same through its
    # checkpoint stage; SparkHistogramProvider's contract says
    # "ideally cached")
    pts = materialize(pts, tag="tile_pts")
    provider = tiling.SparkHistogramProvider(pts)
    res = tiling.split_level(provider, shift=0, level=0)
    return tiling.assign_tiles(pts, res.index, resolution=24, level=0).select(
        "id", "tile_id"
    )


def _tile_assign_sql() -> str:
    """DuckDB twin of q_tile_assign: the data-dependent quadtree cannot
    be derived in SQL, so the tile trees are precomputed ONCE by the
    INDEPENDENT element-at-a-time oracle (mkgmap_spark/oracle/tiles.py
    via scripts/gen_tile_oracle.py — no engine code in that path),
    shipped as data for each gate scale (sf0.001 pytest, sf0.01
    driver), keyed by the dataset's lineitem row count so the static
    SQL self-selects the right tree; membership is then plain bbox
    containment + the round-robin spill formula.  An unknown scale
    selects zero tiles and fails loudly.  Staleness tripwire:
    tests/test_tiling.py::test_tile_oracle_data_current."""
    import gzip
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "tile_oracle.json.gz"
    )
    with gzip.open(path, "rt") as f:
        trees = json.load(f)
    values = ",".join(
        f"({n},{t[0]},{t[1]},{t[2]},{t[3]},{t[4]},{t[5]})"
        for n, tiles in trees.items()
        for t in tiles
    )
    return f"""
WITH alltiles(n_expected, tile_id, min_lat, min_lon, max_lat, max_lon, n_slots) AS (
  VALUES {values}
), tiles AS (
  SELECT tile_id, min_lat, min_lon, max_lat, max_lon, n_slots
  FROM alltiles WHERE n_expected = (SELECT COUNT(*) FROM lineitem)
), pts AS (
  SELECT l_orderkey * 8 + l_linenumber AS id,
         (l_orderkey * 8 + l_linenumber) * {C_LAT} % {LAT_MOD} - {LAT_OFF} AS ay,
         (l_orderkey * 8 + l_linenumber) * {C_LON} % {LON_MOD} - {LON_OFF} AS ax
  FROM lineitem
), based AS (
  SELECT p.id, t.tile_id AS base_tile, t.n_slots
  FROM pts p JOIN tiles t
    ON p.ay >= t.min_lat AND p.ay < t.max_lat
   AND p.ax >= t.min_lon AND p.ax < t.max_lon
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(base_tile + (ROW_NUMBER() OVER (PARTITION BY base_tile ORDER BY id) - 1)
            % n_slots AS BIGINT) AS tile_id
FROM based
"""


Q_TILE_ASSIGN_SQL = _tile_assign_sql()


# --------------------------------------------------------------------------
# q: tile assignment against a FIXED quadtree (driver-gated variant of
#    the graded operator): the data-dependent quadtree driver loop is
#    replaced by a literal two-depth tile tree, so the vectorized
#    assignment kernel (TileIndex.assign searchsorted walk) and the
#    overflow round-robin spill get a plain-SQL containment oracle.
# --------------------------------------------------------------------------

# two-depth fixed tree over the synthetic coordinate domain
# ay in [-2^22, 2^22), ax in [-2^23, 2^23): an 8x8 grid of blocks at
# depth s=41 (2^20 x 2^21 each) with block (3,3) replaced by its four
# children at depth s=39 — the reverse-depth searchsorted walk must
# miss at 41 and hit at 39 for points in that quadrant.  Tiles where
# (by+bx)%7==0 carry 2 slots; the first child carries 3, exercising
# the distLinesIntoNewAreas-style spill (MapArea.java:345-381).
def _fixed_tiles() -> list[tuple[int, int, int, int, int]]:
    tiles = []
    for by in range(8):
        for bx in range(8):
            if (by, bx) == (3, 3):
                continue
            ns = 2 if (by + bx) % 7 == 0 else 1
            tiles.append((1000 + (by * 8 + bx) * 4, 41, by, bx, ns))
    for cy in range(2):
        for cx in range(2):
            ns = 3 if (cy, cx) == (0, 0) else 1
            tiles.append((2000 + (cy * 2 + cx) * 4, 39, 6 + cy, 6 + cx, ns))
    return tiles


def _fixed_index():
    import numpy as np

    from .operators.tiling import TileIndex, _shape

    levels: dict[int, tuple[list, list, list]] = {}
    for tid, s, by, bx, ns in _fixed_tiles():
        lv = levels.setdefault(s, ([], [], []))
        lv[0].append((by << 32) | bx)
        lv[1].append(tid)
        lv[2].append(ns)
    idx_levels = {}
    for s, (ks, tids, slots) in levels.items():
        order = np.argsort(np.asarray(ks, dtype=np.int64))
        idx_levels[s] = (
            np.asarray(ks, dtype=np.int64)[order],
            np.asarray(tids, dtype=np.int64)[order],
            np.asarray(slots, dtype=np.int64)[order],
        )
    # silence the unused-import style check for _shape: the literal
    # keys above encode the same (a, b) block shapes _shape(s) yields
    _ = _shape
    return TileIndex(-LAT_OFF, -LON_OFF, idx_levels)


def q_tile_assign_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import tiling

    cust = _read(spark, sf_dir, "customer")
    pts = (
        cust.select(
            F.col("c_custkey").cast("long").alias("id"),
            lat_col("c_custkey").cast("int").alias("ay"),
            lon_col("c_custkey").cast("int").alias("ax"),
        )
        .withColumn("kind_i", F.lit(0))
        .withColumn("size_bytes", F.lit(9).cast("long"))
        .withColumn("min_res", F.lit(24))
    )
    out = tiling.assign_tiles(pts, _fixed_index(), resolution=24, level=0)
    return out.select("id", F.col("tile_id").cast("long").alias("tile_id"))


def _tile_assign_fixed_sql() -> str:
    from .operators.tiling import _shape

    rows = []
    for tid, s, by, bx, ns in _fixed_tiles():
        a, b = _shape(s)
        min_lat = -LAT_OFF + (by << a)
        min_lon = -LON_OFF + (bx << b)
        rows.append(
            f"({tid}, {min_lat}, {min_lon}, {min_lat + (1 << a)}, {min_lon + (1 << b)}, {ns})"
        )
    values = ",\n  ".join(rows)
    return f"""
WITH tiles(tile_id, min_lat, min_lon, max_lat, max_lon, n_slots) AS (VALUES
  {values}
), pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST((c_custkey * {C_LAT}) % {LAT_MOD} - {LAT_OFF} AS BIGINT) AS ay,
         CAST((c_custkey * {C_LON}) % {LON_MOD} - {LON_OFF} AS BIGINT) AS ax
  FROM customer
), based AS (
  SELECT p.id, t.tile_id AS base_tile, t.n_slots
  FROM pts p JOIN tiles t
    ON p.ay >= t.min_lat AND p.ay < t.max_lat
   AND p.ax >= t.min_lon AND p.ax < t.max_lon
)
SELECT id,
       CAST(base_tile + (ROW_NUMBER() OVER (PARTITION BY base_tile ORDER BY id) - 1)
            % n_slots AS BIGINT) AS tile_id
FROM based
"""


# --------------------------------------------------------------------------
# q: kNN via distributed cell-ring expansion (same oracle as knn_join —
#    validates the scale-path operator against plain SQL)
# --------------------------------------------------------------------------


def q_knn_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.knn import knn_join_cells

    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        lat_col("c_custkey").alias("ay"),
        lon_col("c_custkey").alias("ax"),
    )
    supp = _read(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("rid"),
        lat_col("s_suppkey").alias("ry"),
        lon_col("s_suppkey").alias("rx"),
    )
    out = knn_join_cells(cust, supp, k=3)  # density-auto-tuned cell size
    return out.select(
        F.col("id").alias("c_custkey"),
        F.col("rid").alias("s_suppkey"),
        F.col("rank").cast("int").alias("rank"),
        F.col("dist2"),
    )


# --------------------------------------------------------------------------
# q: point-in-polygon with holes (winding kernel vs SQL rect logic)
# --------------------------------------------------------------------------

DONUT_HY = 600_000
DONUT_HX = 900_000
HOLE_HY = 200_000
HOLE_HX = 300_000


def q_pip_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .operators.pip_join import pip_join_broadcast

    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        lat_col("c_custkey").alias("ay"),
        lon_col("c_custkey").alias("ax"),
    )
    regions = _read(spark, sf_dir, "region").select("r_regionkey", "r_name").toPandas()
    rows = []
    for r in regions.itertuples():
        k = int(r.r_regionkey)
        cy = (k * C_LAT) % LAT_MOD - LAT_OFF
        cx = (k * C_LON) % LON_MOD - LON_OFF
        outer = {
            "lats": [cy - DONUT_HY, cy - DONUT_HY, cy + DONUT_HY, cy + DONUT_HY, cy - DONUT_HY],
            "lons": [cx - DONUT_HX, cx + DONUT_HX, cx + DONUT_HX, cx - DONUT_HX, cx - DONUT_HX],
            "is_hole": False,
        }
        hole = {
            "lats": [cy - HOLE_HY, cy - HOLE_HY, cy + HOLE_HY, cy + HOLE_HY, cy - HOLE_HY],
            "lons": [cx - HOLE_HX, cx + HOLE_HX, cx + HOLE_HX, cx - HOLE_HX, cx - HOLE_HX],
            "is_hole": True,
        }
        rows.append((f"r{k}", 2, r.r_name, f"RP{k}", [outer, hole]))
    # driver-side pandas boundaries: skips the createDataFrame ->
    # toPandas round trip (nested-struct Arrow collect alone costs
    # seconds on a cold session)
    boundaries = pd.DataFrame(
        rows, columns=["boundary_id", "admin_level", "name", "postcode", "rings"]
    )
    out = pip_join_broadcast(cust, boundaries, gshift=20)
    return out.select(
        F.col("id").alias("c_custkey"), "boundary_id", F.col("name").alias("r_name")
    )


Q_PIP_POLYGON_SQL = f"""
WITH pts AS (
  SELECT c_custkey, {lat_sql('c_custkey')} AS ay, {lon_sql('c_custkey')} AS ax FROM customer
), dn AS (
  SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS boundary_id, r_name,
         {lat_sql('r_regionkey')} AS cy, {lon_sql('r_regionkey')} AS cx
  FROM region
)
SELECT c_custkey, boundary_id, r_name
FROM pts JOIN dn
  ON ay > cy - {DONUT_HY} AND ay < cy + {DONUT_HY}
 AND ax > cx - {DONUT_HX} AND ax < cx + {DONUT_HX}
 AND NOT (ay > cy - {HOLE_HY} AND ay < cy + {HOLE_HY}
          AND ax > cx - {HOLE_HX} AND ax < cx + {HOLE_HX})
"""


# --------------------------------------------------------------------------
# q: segment x segment intersection join (exact integer orientation)
# --------------------------------------------------------------------------


def q_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.segment_join import segment_intersection_join

    def seg_ways(df, key, stretch):
        k = F.col(key).cast("long")
        y1 = F.pmod(k * C_LAT, F.lit(LAT_MOD)) - LAT_OFF
        x1 = F.pmod(k * C_LON, F.lit(LON_MOD)) - LON_OFF
        y2 = F.pmod((k + stretch) * C_LAT, F.lit(LAT_MOD)) - LAT_OFF
        x2 = F.pmod((k + stretch) * C_LON, F.lit(LON_MOD)) - LON_OFF
        return df.select(
            k.alias("id"),
            F.array(y1.cast("int"), y2.cast("int")).alias("lats"),
            F.array(x1.cast("int"), x2.cast("int")).alias("lons"),
        )

    supp = seg_ways(_read(spark, sf_dir, "supplier"), "s_suppkey", 3)
    # decorrelate nation keys so no endpoint ever coincides with a
    # supplier endpoint (coincident endpoints = touch-vs-proper
    # semantics the SQL oracle doesn't model)
    nat_src = _read(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("long") * 7919 + 123).alias("nk"),
        F.col("n_nationkey"),
    )
    nat = seg_ways(nat_src, "nk", 5).join(
        nat_src.select(F.col("nk").alias("id"), "n_nationkey"), "id"
    ).select(F.col("n_nationkey").cast("long").alias("id"), "lats", "lons")
    out = segment_intersection_join(supp, nat, gshift=18, broadcast_right=True)
    return out.select(
        F.col("left_id").alias("s_suppkey"), F.col("right_id").alias("n_nationkey")
    )


Q_SEGMENT_JOIN_SQL = f"""
WITH s AS (
  SELECT s_suppkey AS id,
         {lat_sql('s_suppkey')} AS y1, {lon_sql('s_suppkey')} AS x1,
         {lat_sql('(s_suppkey + 3)')} AS y2, {lon_sql('(s_suppkey + 3)')} AS x2
  FROM supplier
), n AS (
  SELECT n_nationkey AS id,
         {lat_sql('(n_nationkey * 7919 + 123)')} AS y1, {lon_sql('(n_nationkey * 7919 + 123)')} AS x1,
         {lat_sql('(n_nationkey * 7919 + 128)')} AS y2, {lon_sql('(n_nationkey * 7919 + 128)')} AS x2
  FROM nation
), d AS (
  SELECT s.id AS s_suppkey, n.id AS n_nationkey,
         (s.x2 - s.x1) * (n.y1 - s.y1) - (s.y2 - s.y1) * (n.x1 - s.x1) AS d1,
         (s.x2 - s.x1) * (n.y2 - s.y1) - (s.y2 - s.y1) * (n.x2 - s.x1) AS d2,
         (n.x2 - n.x1) * (s.y1 - n.y1) - (n.y2 - n.y1) * (s.x1 - n.x1) AS d3,
         (n.x2 - n.x1) * (s.y2 - n.y1) - (n.y2 - n.y1) * (s.x2 - n.x1) AS d4
  FROM s CROSS JOIN n
)
SELECT s_suppkey, n_nationkey FROM d
WHERE ((d1 > 0) <> (d2 > 0)) AND ((d3 > 0) <> (d4 > 0))
  AND d1 <> 0 AND d2 <> 0 AND d3 <> 0 AND d4 <> 0
"""


# --------------------------------------------------------------------------
# q: text-analysis ops with SQL oracles
# --------------------------------------------------------------------------


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import language_id

    docs = _read(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "pred_lang", F.col("hits").cast("bigint").alias("hits"))


def _lang_id_sql() -> str:
    from .operators.text import STOPWORDS

    hit_exprs = []
    for lang, ws in STOPWORDS.items():
        arr = "[" + ", ".join(f"'{w}'" for w in ws) + "]"
        hit_exprs.append(
            f"len(list_intersect(list_distinct(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+')), {arr})) AS h_{lang}"
        )
    langs = list(STOPWORDS)
    best = "GREATEST(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(f"WHEN h_{lg} = {best} THEN '{lg}'" for lg in langs) + " END"
    return f"""
WITH h AS (
  SELECT doc_id, {', '.join(hit_exprs)} FROM documents
)
SELECT doc_id,
       CASE WHEN {best} > 0 THEN {pred} ELSE 'und' END AS pred_lang,
       CAST({best} AS BIGINT) AS hits
FROM h
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import token_counts

    return token_counts(_read(spark, sf_dir, "documents"))


Q_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       CAST(CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
                 ELSE len(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+')) END AS BIGINT) AS n_words,
       GREATEST(
         CAST(CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
                   ELSE len(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+')) END AS BIGINT),
         CAST(ceil(length(COALESCE(text, '')) / 3.3) AS BIGINT)) AS est_subword_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# q: quality scoring (pre-training heuristics — length/char-class/
#    distinct-token ratios, all exact integer arithmetic + IEEE ratios)
# --------------------------------------------------------------------------


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import quality_scores

    return quality_scores(_read(spark, sf_dir, "documents"))


Q_QUALITY_SCORES_SQL = r"""
WITH base AS (
  SELECT doc_id,
         COALESCE(text, '') AS t,
         string_split_regex(lower(trim(COALESCE(text, ''))), '\s+') AS toks
  FROM documents
), m AS (
  SELECT doc_id, t, toks,
         CASE WHEN length(trim(t)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
         len(list_distinct(toks)) AS n_distinct
  FROM base
)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(length(regexp_replace(t, '[^!-/:-@\[-`{-~]', '', 'g')) AS BIGINT) AS n_punct,
       CAST(n_distinct AS BIGINT) AS n_distinct_tokens,
       CASE WHEN n_tokens > 0
            THEN length(regexp_replace(t, '\s+', '', 'g')) / n_tokens
            ELSE 0.0 END AS mean_word_len,
       CASE WHEN n_tokens > 0 THEN n_distinct / n_tokens ELSE 0.0 END AS distinct_ratio
FROM m
"""


# --------------------------------------------------------------------------
# q: document fingerprinting (squash-space normal form + 64-bit hash;
#    md5-prefix variant so the oracle reproduces the bits — the
#    xxhash64 fast path shares the plan shape, covered by pytest)
# --------------------------------------------------------------------------


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import document_fingerprints

    return document_fingerprints(_read(spark, sf_dir, "documents"), hash="md5")


Q_DOC_FINGERPRINTS_SQL = r"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(trim(COALESCE(text, '')), '\s+', ' ', 'g') AS sq
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(lower(sq)), 1, 15)) AS BIGINT) AS fingerprint,
       CAST(length(sq) AS BIGINT) AS norm_len
FROM s
"""


# --------------------------------------------------------------------------
# q: multimodal decode stats — REAL PNG encode + decode round-trip
#    (functions/png.py: zlib deflate/inflate, filter reconstruction)
#    over deterministic gradient images, so channel means and dims have
#    a closed-form SQL oracle.
# --------------------------------------------------------------------------


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from .functions.png import encode_png
    from .operators.multimodal import decode_media_features

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    base = docs.select(
        F.col("doc_id").cast("long").alias("n"),
        (F.lit(4) + F.pmod(F.col("doc_id"), F.lit(13))).cast("int").alias("w"),
        (F.lit(4) + F.pmod(F.col("doc_id"), F.lit(11))).cast("int").alias("h"),
        F.pmod(F.col("doc_id") * 7, F.lit(256)).cast("int").alias("b"),
    )

    @F.pandas_udf("binary")
    def make_png(w: pd.Series, h: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for wi, hi, bi in zip(w.tolist(), h.tolist(), b.tolist()):
            yy, xx = np.mgrid[0:hi, 0:wi]
            img = np.stack(
                [
                    (yy * 255 // (hi - 1)).astype(np.uint8),
                    (xx * 255 // (wi - 1)).astype(np.uint8),
                    np.full((hi, wi), bi, dtype=np.uint8),
                ],
                axis=2,
            )
            out.append(encode_png(img))
        return pd.Series(out)

    media = base.select(
        F.col("n").cast("string").alias("doc_id"),
        F.concat(F.lit("m"), F.col("n").cast("string")).alias("media_ref"),
        F.lit("image").alias("kind"),
        make_png(F.col("w"), F.col("h"), F.col("b")).alias("payload"),
        F.col("w").alias("width"),
        F.col("h").alias("height"),
    )
    out = decode_media_features(media)
    return out.select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")


Q_MEDIA_DECODE_SQL = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS n,
         4 + (doc_id % 13) AS w,
         4 + (doc_id % 11) AS h,
         (doc_id * 7) % 256 AS b
  FROM documents WHERE doc_id % 5 = 0
)
SELECT CAST(n AS VARCHAR) AS doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       list_sum(list_transform(range(0, h), y -> (y * 255) // (h - 1))) / h AS mean_r,
       list_sum(list_transform(range(0, w), x -> (x * 255) // (w - 1))) / w AS mean_g,
       CAST(b AS DOUBLE) AS mean_b
FROM d
"""


# --------------------------------------------------------------------------
# q: rows-only entries (no SQL equivalent; pytest covers correctness)
# --------------------------------------------------------------------------


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, deterministic md5-prefix base hash +
    linear permutations (band-bucket equi-join -> exact Jaccard verify;
    the xxhash64 fast path shares the identical plan shape and is
    covered by pytest)."""
    from .operators.dedup import minhash_pairs_md5

    docs = _read(spark, sf_dir, "documents")
    return minhash_pairs_md5(docs, threshold=0.5)


def _minhash_oracle_sql() -> str:
    from .operators.dedup import minhash_pairs_md5_oracle_sql

    return minhash_pairs_md5_oracle_sql(threshold=0.5)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via the shingle inverted
    index (total recall, no LSH approximation) — the ground truth the
    banded minhash path approximates."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5)


def _ngram_jaccard_oracle_sql() -> str:
    from .operators.dedup import ngram_jaccard_oracle_sql

    return ngram_jaccard_oracle_sql(threshold=0.5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups over the deterministic 60-bit md5-prefix token
    hash; the band join is recall-lossless (bands = max_hamming + 1),
    so the brute-force SQL oracle IS the reference answer."""
    from .operators.dedup import simhash_md5, simhash_near_dups

    docs = _read(spark, sf_dir, "documents")
    return simhash_near_dups(simhash_md5(docs), max_hamming=3).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


def _simhash_oracle_sql() -> str:
    from .operators.dedup import simhash_md5_oracle_sql

    return simhash_md5_oracle_sql(max_hamming=3)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via integer sign-LSH band join + exact quantized-dot
    re-rank — every step int64-exact and SQL-reproducible."""
    from .operators.similarity import lsh_topk_int

    emb = _read(spark, sf_dir, "embeddings")
    # dim shared as a constant with the frozen oracle (see
    # q_embedding_near_dups note)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return lsh_topk_int(emb, q, k=3, dim=64, n_planes=16, bands=4)


def _ann_lsh_oracle_sql() -> str:
    from .operators.similarity import lsh_topk_int_oracle_sql

    return lsh_topk_int_oracle_sql(n_query=10, k=3, dim=64, n_planes=16, bands=4)


# --------------------------------------------------------------------------
# q: ANN via IVF (inverted-file coarse quantizer) — the other classic
#    scale path beside LSH: nearest-centroid buckets, nprobe probing,
#    exact re-rank; all int64 arithmetic so DuckDB reproduces the bits
# --------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 4


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk_int

    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(f"transform(embedding, x -> cast(round(x * {EMB_SCALE}, 0) as bigint))").alias("qv"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("qv")
    )
    return ivf_topk_int(emb, q, k=3, n_centroids=IVF_CENTROIDS, nprobe=IVF_NPROBE)


Q_ANN_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * {EMB_SCALE}, 0) AS BIGINT)) AS qv
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, qv AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}
), assign AS (
  SELECT e.vec_id, e.qv, c.cid,
         CAST(list_sum(list_transform(range(1, len(e.qv) + 1), i -> e.qv[i] * c.cv[i])) AS BIGINT) AS cdot,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           CAST(list_sum(list_transform(range(1, len(e.qv) + 1), i -> e.qv[i] * c.cv[i])) AS BIGINT) DESC,
           c.cid DESC) AS crank
  FROM e CROSS JOIN c
), buckets AS (
  SELECT vec_id AS nid, qv AS v, cid AS bucket FROM assign WHERE crank = 1
), probes AS (
  SELECT vec_id AS qid, qv, cid AS bucket FROM assign
  WHERE vec_id < {N_QUERY_VECS} AND crank <= {IVF_NPROBE}
), cand AS (
  SELECT DISTINCT p.qid, p.qv, b.nid, b.v
  FROM probes p JOIN buckets b USING (bucket)
  WHERE b.nid <> p.qid
), scored AS (
  SELECT qid, nid,
         CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) AS BIGINT) AS dot
  FROM cand
), r AS (
  SELECT qid, nid, dot,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rank
  FROM scored
)
SELECT qid, nid AS neighbor_id, rank, dot FROM r WHERE rank <= 3
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs — the dedup-family member for
    embedding columns (LSH band self-join, exact cos^2 verify)."""
    from .operators.similarity import embedding_near_dups

    emb = _read(spark, sf_dir, "embeddings")
    # dim is a CONSTANT shared with the frozen oracle SQL — deriving it
    # from the data would silently desync the plane weights (and cost
    # an extra job) if the table dimension ever changed
    return embedding_near_dups(emb, threshold=0.3, dim=64)


def _embedding_near_dups_oracle_sql() -> str:
    from .operators.similarity import embedding_near_dups_oracle_sql

    return embedding_near_dups_oracle_sql(threshold=0.3, dim=64)


def q_line_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.merge import merge_lines

    # ways derived from orders: consecutive orders of one customer form
    # touching lines (same synthetic endpoints) -> chains to merge
    o = _read(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    y1 = (F.pmod(F.col("o_custkey").cast("long") * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int")
    x1 = (F.pmod(F.col("o_custkey").cast("long") * C_LON, F.lit(LON_MOD)) - LON_OFF).cast("int")
    y2 = (F.pmod((k + 1) * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int")
    x2 = (F.pmod((k + 1) * C_LON, F.lit(LON_MOD)) - LON_OFF).cast("int")
    lines = o.select(
        k.alias("id"),
        F.pmod(F.col("o_custkey"), F.lit(64)).cast("string").alias("grp"),
        F.array(y1, y2).alias("lats"),
        F.array(x1, x2).alias("lons"),
    )
    return merge_lines(lines, ["grp"]).select("grp", "chain_id", "n_members", "total_points")


# connected components over shared endpoints as a recursive-CTE
# min-label propagation; total_points counts each shared endpoint once
# (a line whose own start == end contributes one endpoint slot)
Q_LINE_MERGE_SQL = f"""
WITH RECURSIVE lines AS (
  SELECT o_orderkey AS id,
         CAST(o_custkey % 64 AS VARCHAR) AS grp,
         {lat_sql('o_custkey')} AS y1, {lon_sql('o_custkey')} AS x1,
         {lat_sql('(o_orderkey + 1)')} AS y2, {lon_sql('(o_orderkey + 1)')} AS x2
  FROM orders
), slots AS (
  SELECT DISTINCT grp, id, ey, ex FROM (
    SELECT grp, id, y1 AS ey, x1 AS ex FROM lines
    UNION ALL
    SELECT grp, id, y2 AS ey, x2 AS ex FROM lines
  )
), edges AS (
  SELECT a.grp, a.id AS ida, b.id AS idb
  FROM slots a JOIN slots b
    ON a.grp = b.grp AND a.ey = b.ey AND a.ex = b.ex AND a.id <> b.id
), comp(grp, id, label) AS (
  SELECT grp, id, id FROM lines
  UNION
  SELECT e.grp, e.ida, c.label FROM comp c JOIN edges e ON c.grp = e.grp AND c.id = e.idb
), labels AS (
  SELECT grp, id, MIN(label) AS root FROM comp GROUP BY 1, 2
), slotc AS (
  SELECT s.grp, lb.root, s.ey, s.ex, COUNT(*) AS c
  FROM slots s JOIN labels lb ON s.grp = lb.grp AND s.id = lb.id
  GROUP BY 1, 2, 3, 4
), saved AS (
  SELECT grp, root, SUM(c - 1) AS sv FROM slotc WHERE c > 1 GROUP BY 1, 2
)
SELECT m.grp, CAST(m.root AS BIGINT) AS chain_id,
       CAST(COUNT(*) AS INT) AS n_members,
       CAST(COUNT(*) * 2 - COALESCE(MAX(s.sv), 0) AS INT) AS total_points
FROM labels m LEFT JOIN saved s ON m.grp = s.grp AND m.root = s.root
GROUP BY m.grp, m.root
"""


# --------------------------------------------------------------------------
# q: style rule engine (compiled Column program vs hand-derived SQL)
# --------------------------------------------------------------------------

STYLE_RULESET = """
highway=motorway [0x01 resolution 12-24]
highway=primary & maxspeed>=60 [0x02 resolution 16-24]
highway=primary [0x03 resolution 18-24 continue]
surface=unpaved { set warn=yes }
warn=yes & highway=* [0x0a resolution 22-24]
highway=* [0x06 resolution 22-24]
"""


def q_style_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .rules import compile_rules, parse_rules

    part = _read(spark, sf_dir, "part")
    hw = F.element_at(
        F.array(*[F.lit(v) for v in ["motorway", "primary", "primary", "residential", "track", "service"]]),
        (F.pmod(F.col("p_partkey"), F.lit(6)) + 1).cast("int"),
    )
    sf = F.element_at(
        F.array(F.lit("paved"), F.lit("unpaved"), F.lit("gravel")),
        (F.pmod(F.col("p_partkey"), F.lit(3)) + 1).cast("int"),
    )
    ms = (F.pmod(F.col("p_partkey"), F.lit(12)) * 10).cast("string")
    tagged = part.select(
        "p_partkey",
        F.create_map(
            F.lit("highway"), hw, F.lit("surface"), sf, F.lit("maxspeed"), ms
        ).alias("tags"),
    )
    out = compile_rules(parse_rules(STYLE_RULESET), tagged)
    return out.select(
        "p_partkey", F.explode("results").alias("r")
    ).select(
        "p_partkey",
        F.col("r.type_code").cast("int").alias("type_code"),
        F.col("r.min_res").cast("int").alias("min_res"),
    )


# hand-derived equivalent of STYLE_RULESET over the same synthetic tags:
#   hw = ['motorway','primary','primary','residential','track','service'][k%6]
#   surface = ['paved','unpaved','gravel'][k%3], maxspeed = (k%12)*10
# rule trace: motorway -> 0x01 stop; primary & ms>=60 -> 0x02 stop;
# primary -> 0x03 continue (no actions); surface=unpaved -> warn=yes;
# warn & highway -> 0x0a stop; highway=* -> 0x06 stop.
Q_STYLE_RULES_SQL = """
WITH t AS (
  SELECT p_partkey,
         (['motorway','primary','primary','residential','track','service'])[(p_partkey % 6) + 1] AS hw,
         (['paved','unpaved','gravel'])[(p_partkey % 3) + 1] AS surface,
         (p_partkey % 12) * 10 AS ms
  FROM part
), fired AS (
  SELECT p_partkey,
         CASE WHEN hw = 'motorway' THEN 1
              WHEN hw = 'primary' AND ms >= 60 THEN 2
              ELSE NULL END AS early_stop,
         hw, surface, ms
  FROM t
)
SELECT p_partkey, CAST(type_code AS INT) AS type_code, CAST(min_res AS INT) AS min_res
FROM (
  -- early terminating rules
  SELECT p_partkey, early_stop AS type_code,
         CASE early_stop WHEN 1 THEN 12 WHEN 2 THEN 16 END AS min_res
  FROM fired WHERE early_stop IS NOT NULL
  UNION ALL
  -- primary (not ms>=60): 0x03 continue ...
  SELECT p_partkey, 3, 18 FROM fired WHERE early_stop IS NULL AND hw = 'primary'
  UNION ALL
  -- ... then warn path or fallback for the same rows
  SELECT p_partkey,
         CASE WHEN surface = 'unpaved' THEN 10 ELSE 6 END,
         22
  FROM fired WHERE early_stop IS NULL
)
"""


# --------------------------------------------------------------------------
# q: full style DSL (filters, addlabel, maxspeedkmh(), !~, routing
#    attrs, continue with_actions) vs a hand-derived SQL oracle
# --------------------------------------------------------------------------

STYLE_FULL_RULESET = """
maxspeedkmh() > 95 [0x01 resolution 18]
highway!~'m.*' & ref=* { name '${ref|substring:1}'; addlabel 'X${ref}' } [0x02 road_class=3 road_speed=5 continue with_actions]
highway=* { set shield='${ref|prefix:R|def:none}' } [0x03]
"""


def q_style_rules_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expanded rule engine end-to-end: value filters (substring /
    prefix / def), name + addlabel label slots, maxspeedkmh() with mph
    conversion, !~ (true on missing), routing attributes, and
    continue-with-actions persistence."""
    from .rules import compile_rules, parse_rules

    part = _read(spark, sf_dir, "part")
    k = F.col("p_partkey")
    hw = F.element_at(
        F.array(*[F.lit(v) for v in ["motorway", "primary", "trunk", "residential", "track", "service"]]),
        (F.pmod(k, F.lit(6)) + 1).cast("int"),
    )
    ms = F.concat(
        (F.pmod(k, F.lit(12)) * 10).cast("string"),
        F.when(F.pmod(k, F.lit(5)) == 0, F.lit(" mph")).otherwise(F.lit("")),
    )
    ref = F.when(F.pmod(k, F.lit(4)) == 0, F.concat(F.lit("A"), F.pmod(k, F.lit(100)).cast("string")))
    tagged = part.select(
        "p_partkey",
        F.map_filter(
            F.create_map(
                F.lit("highway"), hw, F.lit("maxspeed"), ms, F.lit("ref"),
                F.coalesce(ref, F.lit("\x00")),
            ),
            lambda key, v: v != F.lit("\x00"),
        ).alias("tags"),
    )
    out = compile_rules(parse_rules(STYLE_FULL_RULESET), tagged)
    return out.select(
        "p_partkey",
        F.explode("results").alias("r"),
        F.col("tags_out").getItem("shield").alias("shield"),
        F.col("tags_out").getItem("mkgmap:label:1").alias("label1"),
        F.col("tags_out").getItem("mkgmap:label:2").alias("label2"),
    ).select(
        "p_partkey",
        F.col("r.type_code").cast("int").alias("type_code"),
        F.col("r.min_res").cast("int").alias("min_res"),
        F.col("r.road_class").cast("int").alias("road_class"),
        F.col("r.road_speed").cast("int").alias("road_speed"),
        "shield",
        "label1",
        "label2",
    )


# hand-derived rule trace over the synthetic tags:
#   kmh = (k%12)*10 * (1.61 if k%5==0 else 1), formatted to 2dp ->
#   rule1 fires iff floor(kmh*100+0.5)/100 > 95 (terminates; no tags set)
#   else rule2 iff hw NOT LIKE 'm%' AND ref present: label1 =
#   substr(ref, 2), label2 = 'X'||ref, continue-with-actions persists
#   rule3 always: shield = 'R'||ref (or 'none' when ref missing; the
#   prefix filter null-propagates, def rescues), terminates
Q_STYLE_FULL_SQL = """
WITH t AS (
  SELECT p_partkey,
         (['motorway','primary','trunk','residential','track','service'])[(p_partkey % 6) + 1] AS hw,
         (p_partkey % 12) * 10 AS msn,
         (p_partkey % 5) = 0 AS is_mph,
         CASE WHEN p_partkey % 4 = 0 THEN 'A' || CAST(p_partkey % 100 AS VARCHAR) END AS ref
  FROM part
), k AS (
  SELECT *,
         floor((CASE WHEN is_mph THEN msn * 1.61 ELSE CAST(msn AS DOUBLE) END) * 100 + 0.5) / 100 AS kmh
  FROM t
), staged AS (
  SELECT p_partkey, hw, ref,
         kmh > 95 AS r1,
         (hw NOT LIKE 'm%') AND ref IS NOT NULL AS r2
  FROM k
)
SELECT p_partkey, CAST(1 AS INT) AS type_code, CAST(18 AS INT) AS min_res,
       CAST(0 AS INT) AS road_class, CAST(0 AS INT) AS road_speed,
       NULL AS shield, NULL AS label1, NULL AS label2
FROM staged WHERE r1
UNION ALL
SELECT p_partkey, CAST(2 AS INT), CAST(24 AS INT), CAST(3 AS INT), CAST(5 AS INT),
       CASE WHEN ref IS NULL THEN 'none' ELSE 'R' || ref END,
       substr(ref, 2), 'X' || ref
FROM staged WHERE NOT r1 AND r2
UNION ALL
SELECT p_partkey, CAST(3 AS INT), CAST(24 AS INT), CAST(0 AS INT), CAST(0 AS INT),
       CASE WHEN ref IS NULL THEN 'none' ELSE 'R' || ref END,
       CASE WHEN r2 THEN substr(ref, 2) END,
       CASE WHEN r2 THEN 'X' || ref END
FROM staged WHERE NOT r1
"""


# --------------------------------------------------------------------------
# q: apply-to-members (relation tag pushes, SubAction semantics)
# --------------------------------------------------------------------------


def q_apply_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relations (one per customer, members = its orders) push
    route_ref to members via the rule engine's apply action — the
    default relations style's bus-route pattern end-to-end."""
    from .operators.relations import apply_pushed_to_members
    from .rules import compile_rules, parse_rules

    o = _read(spark, sf_dir, "orders")
    members = (
        o.groupBy("o_custkey")
        .agg(F.sort_array(F.collect_list(F.col("o_orderkey").cast("long"))).alias("refs"))
        .select(
            F.col("o_custkey").cast("long").alias("id"),
            F.create_map(
                F.lit("type"), F.lit("route"), F.lit("route"), F.lit("bus"),
                F.lit("ref"), F.concat(F.lit("R"), F.pmod(F.col("o_custkey"), F.lit(50)).cast("string")),
            ).alias("tags"),
            F.expr(
                "transform(refs, r -> named_struct('role', 'stop', 'mtype', 'node', 'ref', r))"
            ).alias("members"),
        )
        # consumed twice (rule compilation -> pushes, and the member
        # resolution join): materialize so the orders aggregation runs
        # once instead of once per consumer
        .transform(materialize)
    )
    feats = o.select(
        F.lit("node").alias("kind"),
        F.col("o_orderkey").cast("long").alias("id"),
        F.map_filter(
            F.create_map(
                F.lit("route_ref"),
                F.when(F.pmod(F.col("o_orderkey"), F.lit(3)) == 0, F.lit("22")).otherwise(F.lit("\x00")),
            ),
            lambda k, v: v != F.lit("\x00"),
        ).alias("tags"),
    )
    rules = parse_rules(
        "type=route & route=bus & ref=* { apply { "
        "set route_ref='$(route_ref);${ref|not-contained:;:route_ref}' | '$(route_ref)' | '${ref}'; } }"
    )
    rel_out = compile_rules(rules, members, is_relation=True, with_pushed=True)
    updated = apply_pushed_to_members(members, feats, rules, relations_out=rel_out)
    return updated.select(
        F.col("id").alias("o_orderkey"), F.col("tags").getItem("route_ref").alias("route_ref")
    )


Q_APPLY_MEMBERS_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0
            THEN '22;R' || CAST(o_custkey % 50 AS VARCHAR)
            ELSE 'R' || CAST(o_custkey % 50 AS VARCHAR) END AS route_ref
FROM orders
"""


# --------------------------------------------------------------------------
# q: road merge (RoadMerger semantics over collinear chains)
# --------------------------------------------------------------------------


def q_road_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collinear per-customer road chains with alternating road_class:
    merge_roads concatenates runs of equal attributes end-to-start
    (angle 0, no loops) — islands of consecutive same-class segments."""
    from pyspark.sql import Window

    from .operators.merge import merge_roads

    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    segs = o.select(
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("o_custkey").cast("long").alias("cust"),
        (F.row_number().over(w) - 1).alias("j"),
        F.pmod(F.col("o_orderkey"), F.lit(2)).cast("int").alias("road_class"),
    )
    lat = (F.pmod(F.col("cust") * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int")
    roads = segs.select(
        "id",
        F.array(lat, lat).alias("lats"),
        F.array((F.col("j") * 1000).cast("int"), ((F.col("j") + 1) * 1000).cast("int")).alias("lons"),
        "road_class",
        F.lit(3).alias("road_speed"),
        F.lit(255).cast("long").alias("access"),
        F.lit(0).cast("long").alias("route_flags"),
        F.create_map(F.lit("mkgmap:label:1"), F.concat(F.lit("C"), F.col("cust").cast("string"))).alias("tags"),
    )
    out = merge_roads(roads)
    return out.select(
        F.col("id").alias("chain_id"),
        F.col("n_members").cast("int").alias("n_members"),
        F.col("road_class").cast("int").alias("road_class"),
        F.size("lats").cast("int").alias("n_points"),
    )


# gaps-and-islands: runs of consecutive (per customer) orders with the
# same parity merge into one road of n+1 points
Q_ROAD_MERGE_SQL = """
WITH segs AS (
  SELECT o_orderkey AS id, o_custkey AS cust,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS j,
         CAST(o_orderkey % 2 AS INT) AS road_class
  FROM orders
), isl AS (
  SELECT *, j - ROW_NUMBER() OVER (PARTITION BY cust, road_class ORDER BY j) AS island
  FROM segs
)
SELECT CAST(MIN(id) AS BIGINT) AS chain_id,
       CAST(COUNT(*) AS INT) AS n_members,
       road_class,
       CAST(COUNT(*) + 1 AS INT) AS n_points
FROM isl GROUP BY cust, road_class, island
"""


# --------------------------------------------------------------------------
# q: turn restrictions (RestrictionRelation validation + except masks)
# --------------------------------------------------------------------------

_TR_KINDS = ["no_left_turn", "no_right_turn", "only_straight_on", "no_u_turn", "no_parking", "only_left_turn"]
_TR_EXCEPT = [None, "bicycle", "bicycle; psv", "hgv,foot"]


def q_turn_restrictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic restriction relations over a node/way chain (way n
    joins node n to node n+1): validation (supported kinds, single
    from/via/to, via must be an endpoint of both ways) + except-mask
    derivation, all Column-side."""
    from .functions.rank import global_rank
    from .operators.routing import turn_restrictions

    o = _read(spark, sf_dir, "orders")
    # dense surrogate 1..N without a single-partition global window:
    # range-partitioned exclusive scan (the count job inside
    # global_rank also gives us N — no extra action on the big table)
    # checkpoint the dense ids once: nodes/ways/rels all derive from n,
    # and without it each branch re-runs the rank window.  Lazy cut:
    # the operator's eager checkpoint of the validated relations is the
    # next action and scans every n partition, persisting these blocks
    # in the same job
    n = global_rank(o.select("o_orderkey"), ["o_orderkey"], out="n").select(
        "n"
    ).transform(materialize_lazy)
    nodes = n.select(
        F.col("n").alias("id"), lat_col("n").cast("int").alias("lat"), lon_col("n").cast("int").alias("lon")
    )
    cnt = o.count()
    ways = n.filter(F.col("n") <= cnt - 1).select(
        F.col("n").alias("id"),
        F.array(lat_col("n").cast("int"), (F.pmod((F.col("n") + 1) * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int")).alias("lats"),
        F.array(lon_col("n").cast("int"), (F.pmod((F.col("n") + 1) * C_LON, F.lit(LON_MOD)) - LON_OFF).cast("int")).alias("lons"),
    )
    k = F.col("n")
    kind = F.element_at(F.array(*[F.lit(x) for x in _TR_KINDS]), (F.pmod(k, F.lit(6)) + 1).cast("int"))
    exc = F.element_at(
        F.array(*[F.lit(x if x is not None else "\x00") for x in _TR_EXCEPT]),
        (F.pmod(k, F.lit(4)) + 1).cast("int"),
    )
    rtype = F.when(F.pmod(k, F.lit(5)) == 0, F.lit("restriction:motorcar")).otherwise(F.lit("restriction"))
    via_ref = F.when(F.pmod(k, F.lit(9)) == 0, k + 2).otherwise(k + 1)
    rels = n.filter(F.col("n") <= cnt - 2).select(
        F.col("n").alias("id"),
        F.map_filter(
            F.create_map(F.lit("type"), rtype, F.lit("restriction"), kind, F.lit("except"), exc),
            lambda key, v: v != F.lit("\x00"),
        ).alias("tags"),
        F.array(
            F.struct(F.lit("from").alias("role"), F.lit("way").alias("mtype"), k.alias("ref")),
            F.struct(F.lit("via").alias("role"), F.lit("node").alias("mtype"), via_ref.alias("ref")),
            F.struct(F.lit("to").alias("role"), F.lit("way").alias("mtype"), (k + 1).alias("ref")),
        ).alias("members"),
    )
    out = turn_restrictions(rels, ways, nodes)
    return out.select(
        "rel_id", "restriction",
        F.col("except_mask").cast("int").alias("except_mask"),
        "via_node", "from_way", "to_way",
    )


# validity: kind supported (n%6 != 4 -> not 'no_parking'); via node
# n+1 always an endpoint of ways n and n+1; the n%9==0 rows point via
# at node n+2, valid only on a (theoretically possible) coordinate
# collision — mirrored exactly with the same scatter arithmetic.
# masks: base 129 (foot|emergency) or 251 (~motorcar) when n%5==0;
# except adds bike(2) / bike+psv(98) / hgv+foot(17)
Q_TURN_RESTRICTIONS_SQL = f"""
WITH nums AS (
  SELECT ROW_NUMBER() OVER (ORDER BY o_orderkey) AS n, COUNT(*) OVER () AS cnt FROM orders
), rels AS (
  SELECT n,
         (['no_left_turn','no_right_turn','only_straight_on','no_u_turn','no_parking','only_left_turn'])[(n % 6) + 1] AS restriction,
         (n % 4) AS exc_i, (n % 5) = 0 AS typed, (n % 9) = 0 AS via_skew, cnt
  FROM nums WHERE n <= cnt - 2
), masked AS (
  SELECT n, restriction, via_skew, cnt,
         CASE WHEN typed THEN 251 ELSE 129 END
         | CASE exc_i WHEN 1 THEN 2 WHEN 2 THEN 98 WHEN 3 THEN 17 ELSE 0 END AS except_mask
  FROM rels
), ok AS (
  SELECT * FROM masked
  WHERE restriction <> 'no_parking'
    AND (NOT via_skew OR
         ({lat_sql('(n + 2)')} = {lat_sql('n')} AND {lon_sql('(n + 2)')} = {lon_sql('n')})
      OR ({lat_sql('(n + 2)')} = {lat_sql('(n + 1)')} AND {lon_sql('(n + 2)')} = {lon_sql('(n + 1)')}))
)
SELECT CAST(n AS BIGINT) AS rel_id, restriction, CAST(except_mask AS INT) AS except_mask,
       CAST(CASE WHEN via_skew THEN n + 2 ELSE n + 1 END AS BIGINT) AS via_node,
       CAST(n AS BIGINT) AS from_way, CAST(n + 1 AS BIGINT) AS to_way
FROM ok
"""


# --------------------------------------------------------------------------
# q: housenumber intervals (HousenumberGenerator numbering model)
# --------------------------------------------------------------------------


def q_house_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Houses (orders) projected onto their customer's road, one
    numbering interval per road side: NumberStyle O/E/B + start/end in
    travel direction."""
    from .operators.housenumbers import housenumber_intervals, project_houses

    c = _read(spark, sf_dir, "customer")
    roads = c.select(
        F.col("c_custkey").cast("long").alias("road_id"),
        F.array(lat_col("c_custkey").cast("int"), lat_col("c_custkey").cast("int")).alias("lats"),
        F.array(lon_col("c_custkey").cast("int"), (lon_col("c_custkey") + 20000).cast("int")).alias("lons"),
    )
    o = _read(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    houses = o.select(
        k.alias("house_id"),
        (F.pmod(k, F.lit(97)) + 1).cast("int").alias("number"),
        F.col("o_custkey").cast("long").alias("road_id"),
        (F.pmod(F.col("o_custkey").cast("long") * C_LAT, F.lit(LAT_MOD)) - LAT_OFF
         + F.when(F.pmod(k, F.lit(2)) == 0, 500).otherwise(-500)).cast("int").alias("hy"),
        (F.pmod(F.col("o_custkey").cast("long") * C_LON, F.lit(LON_MOD)) - LON_OFF
         + F.pmod(k, F.lit(19)) * 1000 + 37).cast("int").alias("hx"),
    )
    proj = project_houses(houses, roads)
    return housenumber_intervals(proj).select(
        "road_id", "side", "style",
        F.col("start_num").cast("int").alias("start_num"),
        F.col("end_num").cast("int").alias("end_num"),
        F.col("n_houses").cast("int").alias("n_houses"),
        "needs_split",
    )


# single-segment west-east roads: t = (hx - x0)/20000, side L iff the
# house sits north of the road (cross = dx * (hy - y) > 0)
Q_HOUSE_NUMBERS_SQL = f"""
WITH houses AS (
  SELECT o_custkey AS road_id,
         o_orderkey AS house_id,
         CAST(o_orderkey % 97 + 1 AS INT) AS number,
         CASE WHEN o_orderkey % 2 = 0 THEN 'L' ELSE 'R' END AS side,
         (o_orderkey % 19) * 1000 + 37 AS t
  FROM orders
), ordered AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY road_id, side ORDER BY t, house_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY road_id, side ORDER BY t DESC, house_id DESC) AS rn_d,
         SIGN(number - LAG(number) OVER (PARTITION BY road_id, side ORDER BY t, house_id)) AS step
  FROM houses
)
SELECT CAST(road_id AS BIGINT) AS road_id, side,
       CASE WHEN MAX(number % 2) = 0 THEN 'E' WHEN MIN(number % 2) = 1 THEN 'O' ELSE 'B' END AS style,
       CAST(MAX(CASE WHEN rn_a = 1 THEN number END) AS INT) AS start_num,
       CAST(MAX(CASE WHEN rn_d = 1 THEN number END) AS INT) AS end_num,
       CAST(COUNT(*) AS INT) AS n_houses,
       SUM(CASE WHEN step > 0 THEN 1 ELSE 0 END) * SUM(CASE WHEN step < 0 THEN 1 ELSE 0 END) > 0 AS needs_split
FROM ordered
GROUP BY road_id, side
"""


def q_locator_autofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locator city autofill (build/Locator.java autofillCities):
    nations are the seed cities; every 50th customer is a place —
    k%3=0 resolves via its is_in city name, k%3=1 carries an unmatched
    is_in and k%3=2 none (both fall back to the nearest known city in
    the last run, which by then includes the run-1-resolved places).

    Seed-city countries are LocatorConfig.xml VARIANTS ('DEU',
    'Germany', 'france') so the Locator.normalizeCountry alias pass
    (Locator.java:71,97-114) is exercised: the output carries the
    canonical names ('Deutschland', 'France')."""
    from .operators.locator import autofill_cities

    n = _read(spark, sf_dir, "nation")
    nk = F.col("n_nationkey").cast("long")
    seed = nk * 13 + 7
    cities = n.select(
        nk.alias("id"),
        F.concat(F.lit("City"), nk).alias("name"),
        F.concat(F.lit("City"), nk).alias("city"),
        F.concat(F.lit("R"), F.pmod(nk, 5)).alias("region"),
        F.when(F.pmod(nk, 3) == 0, F.lit("DEU"))
        .when(F.pmod(nk, 3) == 1, F.lit("Germany"))
        .otherwise(F.lit("france"))
        .alias("country"),
        F.concat(F.lit("Z"), nk).alias("zip"),
        F.lit(None).cast("string").alias("is_in"),
        (F.pmod(seed * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int").alias("lat"),
        (F.pmod(seed * C_LON, F.lit(LON_MOD)) - LON_OFF).cast("int").alias("lon"),
    )
    c = _read(spark, sf_dir, "customer").filter(
        F.pmod(F.col("c_custkey").cast("long"), 50) == 0
    )
    k = F.col("c_custkey").cast("long")
    places = c.select(
        (k + 100000).alias("id"),
        F.concat(F.lit("P"), k).alias("name"),
        F.lit(None).cast("string").alias("city"),
        F.lit(None).cast("string").alias("region"),
        F.lit(None).cast("string").alias("country"),
        F.lit(None).cast("string").alias("zip"),
        F.when(F.pmod(k, 3) == 0, F.concat(F.lit("City"), F.pmod(k, 25), F.lit(", Junk")))
        .when(F.pmod(k, 3) == 1, F.lit("Nowhere"))
        .alias("is_in"),
        lat_col("c_custkey").cast("int").alias("lat"),
        lon_col("c_custkey").cast("int").alias("lon"),
    )
    out = autofill_cities(cities.unionByName(places))
    return out.filter(F.col("id") >= 100000).select(
        "id", "city", "region", "country", "zip"
    )


def _locator_autofill_sql() -> str:
    lat_n = lat_sql("(n_nationkey * 13 + 7)")
    lon_n = lon_sql("(n_nationkey * 13 + 7)")
    return f"""
WITH nat AS (
  SELECT CAST(n_nationkey AS BIGINT) AS cid,
         'City' || CAST(n_nationkey AS VARCHAR) AS cname,
         'City' || CAST(n_nationkey AS VARCHAR) AS city,
         'R' || CAST(n_nationkey % 5 AS VARCHAR) AS region,
         -- normalizeCountry('DEU')='Deutschland',
         -- normalizeCountry('Germany')='Deutschland' (variant of DEU),
         -- normalizeCountry('france')='France' (case-insensitive) —
         -- verified against resources/LocatorConfig.xml:356,388
         CASE n_nationkey % 3 WHEN 2 THEN 'France' ELSE 'Deutschland' END AS country,
         'Z' || CAST(n_nationkey AS VARCHAR) AS zip,
         CAST({lat_n} AS BIGINT) AS lat, CAST({lon_n} AS BIGINT) AS lon
  FROM nation
), pl AS (
  SELECT CAST(c_custkey + 100000 AS BIGINT) AS id,
         'P' || CAST(c_custkey AS VARCHAR) AS name,
         c_custkey % 3 AS v,
         c_custkey % 25 AS cref,
         CAST({lat_sql('c_custkey')} AS BIGINT) AS lat,
         CAST({lon_sql('c_custkey')} AS BIGINT) AS lon
  FROM customer WHERE c_custkey % 50 = 0
), run1 AS (
  SELECT pl.id, pl.name, pl.lat, pl.lon,
         nat.city, nat.region, nat.country, nat.zip
  FROM pl JOIN nat ON pl.v = 0 AND nat.cname = 'City' || CAST(pl.cref AS VARCHAR)
), cand AS (
  SELECT cid, city, region, country, lat, lon FROM nat
  UNION ALL
  SELECT id AS cid, city, region, country, lat, lon FROM run1
), need AS (
  SELECT id, name, lat, lon FROM pl WHERE v IN (1, 2)
), near AS (
  SELECT id, name, region, country,
         ROW_NUMBER() OVER (
           PARTITION BY id
           ORDER BY (n.lat - d.lat) * (n.lat - d.lat)
                  + (n.lon - d.lon) * (n.lon - d.lon), n.cid
         ) AS rn
  FROM need d JOIN cand n ON TRUE
)
SELECT id, city, region, country, zip FROM run1
UNION ALL
SELECT id, name AS city, region, country, CAST(NULL AS VARCHAR) AS zip
FROM near WHERE rn = 1
"""


Q_LOCATOR_AUTOFILL_SQL = _locator_autofill_sql()


def q_dest_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link destination hints end-to-end (LinkDestinationHook): per
    order two chained oneway motorway_links A -> B; B shares A's
    destination for even keys and is dropped by the chain dedup; the
    survivors split into approach/hint/rest parts at the reference's
    20 m / 10-50 m cuts (planar metric: map units as metres)."""
    from .operators.link_destination import process_link_destinations

    # every 4th order (coprime with the %5 length variants): the
    # hint pipeline's cost scales with ways, keep the bench honest
    o = _read(spark, sf_dir, "orders").filter(
        F.pmod(F.col("o_orderkey").cast("long"), 4) == 0
    )
    k = F.col("o_orderkey").cast("long")
    y = lat_col("o_orderkey").cast("int")
    x0 = lon_col("o_orderkey").cast("int")
    la = (F.pmod(k, 5) * 8000 + 4000).cast("int")
    dest_a = F.concat(F.lit("D"), F.pmod(k, 20))
    dest_b = F.when(F.pmod(k, 2) == 0, dest_a).otherwise(F.concat(F.lit("E"), k))
    a = o.select(
        (k * 2).alias("id"),
        F.map_from_arrays(
            F.array(F.lit("highway"), F.lit("oneway"), F.lit("destination")),
            F.array(F.lit("motorway_link"), F.lit("yes"), dest_a),
        ).alias("tags"),
        F.array(y, y).alias("lats"),
        F.array(x0, x0 + la).alias("lons"),
    )
    b = o.select(
        (k * 2 + 1).alias("id"),
        F.map_from_arrays(
            F.array(F.lit("highway"), F.lit("oneway"), F.lit("destination")),
            F.array(F.lit("motorway_link"), F.lit("yes"), dest_b),
        ).alias("tags"),
        F.array(y, y).alias("lats"),
        F.array(x0 + la, x0 + la + 5000).alias("lons"),
    )
    out = process_link_destinations(a.unionByName(b), metric="planar")
    return out.select(
        F.col("id").alias("way_id"),
        "part",
        "role",
        F.expr("lons[0]").alias("x_start"),
        F.expr("element_at(lons, -1)").alias("x_end"),
        F.expr("lats[0]").alias("y"),
        "dest_hint",
    )


def _dest_hints_oracle_sql() -> str:
    """Closed-form parts: a 2-point way of length L >= 4000 units cuts
    at +20 (approach), +30 (hint end), rest to L."""
    base = f"""
  SELECT o_orderkey AS k,
         {lat_sql('o_orderkey')} AS y,
         {lon_sql('o_orderkey')} AS x0,
         o_orderkey % 5 * 8000 + 4000 AS la,
         'D' || CAST(o_orderkey % 20 AS VARCHAR) AS dest_a,
         CASE WHEN o_orderkey % 2 = 0 THEN 'D' || CAST(o_orderkey % 20 AS VARCHAR)
              ELSE 'E' || CAST(o_orderkey AS VARCHAR) END AS dest_b
  FROM orders WHERE o_orderkey % 4 = 0
"""
    tmpl = []
    # way A: id 2k, starts x0, length la
    for part, role, s, e, hint in [
        (0, "approach", "x0", "x0 + 20", "NULL"),
        (1, "hint", "x0 + 20", "x0 + 30", "dest_a"),
        (2, "rest", "x0 + 30", "x0 + la", "NULL"),
    ]:
        tmpl.append(
            f"SELECT k * 2 AS way_id, {part} AS part, '{role}' AS role, "
            f"{s} AS x_start, {e} AS x_end, y, {hint} AS dest_hint FROM t"
        )
    # way B: id 2k+1, starts x0+la, length 5000; only odd keys survive
    for part, role, s, e, hint in [
        (0, "approach", "x0 + la", "x0 + la + 20", "NULL"),
        (1, "hint", "x0 + la + 20", "x0 + la + 30", "dest_b"),
        (2, "rest", "x0 + la + 30", "x0 + la + 5000", "NULL"),
    ]:
        tmpl.append(
            f"SELECT k * 2 + 1, {part}, '{role}', {s}, {e}, y, {hint} "
            f"FROM t WHERE k % 2 = 1"
        )
    u = "\nUNION ALL ".join(tmpl)
    return f"""
WITH t AS ({base})
SELECT CAST(way_id AS BIGINT) AS way_id, CAST(part AS INT) AS part, role,
       CAST(x_start AS INT) AS x_start, CAST(x_end AS INT) AS x_end,
       CAST(y AS INT) AS y, dest_hint
FROM ({u})
"""


Q_DEST_HINTS_SQL = _dest_hints_oracle_sql()


def q_roundabout_flares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flare triangle checks (RouteNode.checkRoundaboutFlares): per
    customer a 4-node roundabout with an outgoing/incoming flare pair
    to an apex, broken per k%5 (good / outgoing backward / incoming
    forward / outgoing not oneway / incoming not oneway); good flares
    with k%3=0 get a continuation arc past the apex."""
    from .operators.flares import check_roundabout_flares

    c = _read(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    base = c.select(
        k.alias("k"),
        (k * 10000).alias("n0"),
        F.pmod(k, 5).alias("v"),
        ((F.pmod(k, 5) == 0) & (F.pmod(k, 3) == 0)).alias("cont"),
    )
    # booleans per variant
    base = base.withColumns(
        {
            "out_fwd": F.col("v") != 1,
            "in_fwd": F.col("v") == 2,
            "out_ow": F.col("v") != 3,
            "in_ow": F.col("v") != 4,
        }
    )

    def s(f, t, road, rab, ow, fwd, ln, fc):
        return F.struct(
            f.alias("from_id"), t.alias("to_id"), road.alias("road_id"),
            rab.alias("roundabout"), ow.alias("oneway"), fwd.alias("forward"),
            ln.alias("length"), fc.alias("flare_check"),
            F.lit(False).alias("synthesised"),
        )

    n0 = F.col("n0")
    T, Fa = F.lit(True), F.lit(False)
    L100, L50 = F.lit(100).cast("long"), F.lit(50).cast("long")
    ring = []
    for i in range(4):
        a_, b_ = n0 + i, n0 + (i + 1) % 4
        rd = n0 + 900
        ring.append(s(a_, b_, rd, T, T, T, L100, Fa))
        ring.append(s(b_, a_, rd, T, T, Fa, L100, Fa))
    apex, ext, ext2 = n0 + 4, n0 + 5, n0 + 6
    r701, r702, r800 = n0 + 701, n0 + 702, n0 + 800
    flare = [
        s(n0, apex, r701, Fa, F.col("out_ow"), F.col("out_fwd"), L50, T),
        s(apex, n0, r701, Fa, F.col("out_ow"), ~F.col("out_fwd"), L50, T),
        s(apex, n0 + 1, r702, Fa, F.col("in_ow"), ~F.col("in_fwd"), L50, T),
        s(n0 + 1, apex, r702, Fa, F.col("in_ow"), F.col("in_fwd"), L50, T),
        s(apex, ext, r800, Fa, Fa, T, L50, T),
        s(ext, apex, r800, Fa, Fa, Fa, L50, T),
    ]
    cont = [
        s(apex, ext2, r701, Fa, F.col("out_ow"), F.col("out_fwd"), L50, T),
        s(ext2, apex, r701, Fa, F.col("out_ow"), ~F.col("out_fwd"), L50, T),
    ]
    arcs = base.select(
        "k",
        F.explode(
            F.when(F.col("cont"), F.array(*ring, *flare, *cont)).otherwise(
                F.array(*ring, *flare)
            )
        ).alias("a"),
    ).select("k", "a.*")
    out = check_roundabout_flares(arcs)
    # canonical triangle only (the 701-out / 702-in pair)
    return (
        out.join(
            base.select("k", "n0"),
            out["node_id"] == F.col("n0"),
        )
        .filter(
            (F.col("out_road") == F.col("n0") + 701)
            & (F.col("in_road") == F.col("n0") + 702)
        )
        .select(
            F.col("k").alias("c_custkey"),
            F.coalesce(F.col("warning"), F.lit("ok")).alias("warning"),
        )
    )


Q_ROUNDABOUT_FLARES_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CASE c_custkey % 5
         WHEN 1 THEN 'outgoing-wrong-direction'
         WHEN 2 THEN 'incoming-wrong-direction'
         WHEN 3 THEN 'outgoing-not-oneway'
         WHEN 4 THEN 'incoming-not-oneway'
         ELSE CASE WHEN c_custkey % 3 = 0
                   THEN 'outgoing-continues-past-flare' ELSE 'ok' END
       END AS warning
FROM customer
"""


def q_sea_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Land/sea synthesis (SeaGenerator.end()): per customer a tile with
    an open W->E coastline, a CCW island ring and a CW lake inside it.
    Expected per tile: island (land), lake (water), border landmass
    (land, walked over the two N corners), sea background rectangle.
    The bbox spans are powers of two so every edge-hit point
    reconstructs exactly in doubles (bit-equal in any engine)."""
    from .operators.sea import generate_sea_polygons

    # every 10th customer: tile counts in the real pipeline are
    # hundreds-to-thousands, not one per customer; the moduli below
    # (11/7/13) are coprime to 10 so every geometry variant still occurs
    c = _read(spark, sf_dir, "customer").filter(
        F.pmod(F.col("c_custkey").cast("long"), 10) == 0
    )
    k = F.col("c_custkey").cast("long")
    yw = (F.pmod(k, 11) * 2000 + 20000).cast("int")
    ym = (F.pmod(k, 7) * 3000 + 30000).cast("int")
    ye = (F.pmod(k, 13) * 1500 + 25000).cast("int")
    coast = c.select(
        k.alias("tile_id"), F.lit(0).alias("chain_id"),
        F.array(yw, ym, ye).alias("lats"),
        F.array(F.lit(0), F.lit(32768), F.lit(65536)).alias("lons"),
    )
    CY, CX, HI, HL = 55000, 52000, 4000, 1000
    island = c.select(
        k.alias("tile_id"), F.lit(1).alias("chain_id"),
        F.array(*[F.lit(v) for v in [CY - HI, CY - HI, CY + HI, CY + HI, CY - HI]]).alias("lats"),
        F.array(*[F.lit(v) for v in [CX - HI, CX + HI, CX + HI, CX - HI, CX - HI]]).alias("lons"),
    )
    lake = c.select(
        k.alias("tile_id"), F.lit(2).alias("chain_id"),
        F.array(*[F.lit(v) for v in [CY + HL, CY + HL, CY - HL, CY - HL, CY + HL]]).alias("lats"),
        F.array(*[F.lit(v) for v in [CX - HL, CX + HL, CX + HL, CX - HL, CX - HL]]).alias("lons"),
    )
    chains = coast.unionByName(island).unionByName(lake)
    bounds = c.select(
        k.alias("tile_id"),
        F.lit(0).alias("min_lat"), F.lit(0).alias("min_lon"),
        F.lit(65536).alias("max_lat"), F.lit(65536).alias("max_lon"),
    )
    out = generate_sea_polygons(chains, bounds, metric="planar")
    return out.select("tile_id", "kind", "poly", "idx", "lat", "lon")


def _sea_polygons_oracle_sql() -> str:
    """Point-template twin of q_sea_polygons: per customer, the 21
    known polygon points (island 5, lake 5, landmass 6, sea rect 5)."""
    CY, CX, HI, HL = 55000, 52000, 4000, 1000
    isl = [(CY - HI, CX - HI), (CY - HI, CX + HI), (CY + HI, CX + HI),
           (CY + HI, CX - HI), (CY - HI, CX - HI)]
    lak = [(CY + HL, CX - HL), (CY + HL, CX + HL), (CY - HL, CX + HL),
           (CY - HL, CX - HL), (CY + HL, CX - HL)]
    sea = [(-1, -1), (65537, -1), (65537, 65537), (-1, 65537), (-1, -1)]
    parts = []
    for i, (y, x) in enumerate(isl):
        parts.append(f"SELECT tile_id, 'land' AS kind, 0 AS poly, {i} AS idx, {y} AS lat, {x} AS lon FROM t")
    for i, (y, x) in enumerate(lak):
        parts.append(f"SELECT tile_id, 'water', 1, {i}, {y}, {x} FROM t")
    # landmass: (yE,65536), NE, NW, (yW,0), (ym,32768), (yE,65536)
    land = [("ye", 65536), (65536, 65536), (65536, 0), ("yw", 0), ("ym", 32768), ("ye", 65536)]
    for i, (y, x) in enumerate(land):
        parts.append(f"SELECT tile_id, 'land', 2, {i}, {y}, {x} FROM t")
    for i, (y, x) in enumerate(sea):
        parts.append(f"SELECT tile_id, 'sea', 3, {i}, {y}, {x} FROM t")
    u = "\nUNION ALL ".join(parts)
    return f"""
WITH t AS (
  SELECT c_custkey AS tile_id,
         CAST(c_custkey % 11 * 2000 + 20000 AS INT) AS yw,
         CAST(c_custkey % 7 * 3000 + 30000 AS INT) AS ym,
         CAST(c_custkey % 13 * 1500 + 25000 AS INT) AS ye
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT CAST(tile_id AS BIGINT) AS tile_id, kind, CAST(poly AS INT) AS poly,
       CAST(idx AS INT) AS idx, CAST(lat AS INT) AS lat, CAST(lon AS INT) AS lon
FROM ({u})
"""


Q_SEA_POLYGONS_SQL = _sea_polygons_oracle_sql()


# --------------------------------------------------------------------------
# q: precompiled-sea mode (--precomp-sea, SeaGenerator.java:83-96 +
#    addPrecompSea:571-690): land/sea from a precompiled tile directory
#    instead of coastline synthesis
# --------------------------------------------------------------------------

PRECOMP_R = 1 << 15  # SeaGenerator.PRECOMP_RASTER


def _precomp_tiles():
    """25 deterministic tile bboxes (one per nation key), cell-ALIGNED
    so full-cell rectangles and mixed-tile ways are never partially
    clipped — the clip path is pytest-covered with controlled geometry
    (tests/test_precomp_sea.py); here alignment keeps every vertex
    derivable in plain SQL."""
    out = []
    for nk in range(25):
        min_lat = (nk % 5) * 4 * PRECOMP_R
        min_lon = (nk // 5) * 4 * PRECOMP_R
        ext = (2 + nk % 2) * PRECOMP_R
        out.append((nk, min_lat, min_lon, min_lat + ext, min_lon + ext))
    return out


def _precomp_cell_type(clat: int, clon: int) -> int:
    """0=sea, 1=land, 2=mixed — pure arithmetic, reproducible in SQL."""
    return ((clat // PRECOMP_R) + 2 * (clon // PRECOMP_R)) % 3


def _precomp_fixture_dir() -> str:
    """Build (once) the deterministic precomp-sea fixture directory:
    index.txt.gz plus one real .osm file per mixed cell, read back
    through the production XML source.  Mixed cells hold one land and
    one sea square at fixed offsets inside the cell."""
    import tempfile

    from .mapunits import to_degrees
    from .sources.precomp_sea import write_precomp_fixture

    d = os.path.join(tempfile.gettempdir(), "mkgmap_precomp_fixture_v1")
    marker = os.path.join(d, ".complete")
    if os.path.exists(marker):
        return d
    cells: dict[tuple[int, int], str] = {}
    mixed: dict[str, list[dict]] = {}
    for nk, y0, x0, y1, x1 in _precomp_tiles():
        for clat in range(y0, y1, PRECOMP_R):
            for clon in range(x0, x1, PRECOMP_R):
                ty = _precomp_cell_type(clat, clon)
                if ty < 2:
                    cells[(clat, clon)] = "sea" if ty == 0 else "land"
                    continue
                fname = f"sea_{clat}_{clon}.osm"
                cells[(clat, clon)] = fname
                if fname in mixed:
                    continue
                ci = (clat // PRECOMP_R) * 64 + (clon // PRECOMP_R)
                els: list[dict] = []
                nid = 1
                for j, (oy0, ox0, oy1, ox1, tags) in enumerate(
                    [
                        (8192, 8192, 16384, 16384, {"natural": "land"}),
                        (20480, 20480, 28672, 28672, {"natural": "sea"}),
                    ]
                ):
                    corners = [
                        (clat + oy0, clon + ox0), (clat + oy1, clon + ox0),
                        (clat + oy1, clon + ox1), (clat + oy0, clon + ox1),
                    ]
                    refs = []
                    for (yy, xx) in corners:
                        els.append(
                            {
                                "kind": "node", "id": ci * 100 + nid,
                                "lat_deg": float(to_degrees(yy)),
                                "lon_deg": float(to_degrees(xx)),
                            }
                        )
                        refs.append(ci * 100 + nid)
                        nid += 1
                    els.append(
                        {"kind": "way", "id": 2 * ci + j, "refs": refs + [refs[0]], "tags": tags}
                    )
                mixed[fname] = els
    import shutil

    tmp = d + ".build"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    write_precomp_fixture(tmp, [(la, lo, n) for (la, lo), n in sorted(cells.items())], mixed)
    with open(os.path.join(tmp, ".complete"), "w") as fh:
        fh.write("v1\n")
    if os.path.exists(d) and not os.path.exists(marker):
        shutil.rmtree(d)  # stale partial build
    try:
        os.rename(tmp, d)
    except OSError:
        pass  # a concurrent builder won the rename; theirs is identical
    return d


def q_sea_precomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precompiled-sea polygons for 25 deterministic tile bboxes: the
    --precomp-sea contract of SeaGenerator (index grid, full sea/land
    cells as rectangles, mixed cells loaded from real .osm files with
    natural=land vs sea ways), emitting the generate_sea_polygons
    point schema.  `nation` anchors the tile count so the driver's
    row-count gate sees a stable table-derived result."""
    from .sources.precomp_sea import precomp_sea_polygons

    d = _precomp_fixture_dir()
    tiles = _precomp_tiles()
    bounds = spark.createDataFrame(
        pd.DataFrame(tiles, columns=["tile_id", "min_lat", "min_lon", "max_lat", "max_lon"]),
        schema="tile_id long, min_lat long, min_lon long, max_lat long, max_lon long",
    )
    # anchor on the nation table (tile per nation key)
    nat = _read(spark, sf_dir, "nation").select(F.col("n_nationkey").cast("long").alias("tile_id"))
    bounds = bounds.join(nat, "tile_id")
    return precomp_sea_polygons(spark, d, bounds)


def _sea_precomp_oracle_sql() -> str:
    """Plain-SQL twin: re-derives cells, types, rectangles and the
    mixed squares from the same arithmetic the fixture generator used
    (the Spark path reads them back through index.txt.gz + .osm files,
    so the comparison proves the whole round trip)."""
    r = PRECOMP_R
    return f"""
WITH t AS (
  SELECT n_nationkey AS tile_id,
         (n_nationkey % 5) * {4 * r} AS min_lat,
         (n_nationkey // 5) * {4 * r} AS min_lon,
         (n_nationkey % 5) * {4 * r} + (2 + n_nationkey % 2) * {r} AS max_lat,
         (n_nationkey // 5) * {4 * r} + (2 + n_nationkey % 2) * {r} AS max_lon
  FROM nation
), cl AS (
  SELECT t.*, unnest(generate_series(min_lat, max_lat - {r}, {r})) AS cell_lat FROM t
), c AS (
  SELECT cl.*, unnest(generate_series(min_lon, max_lon - {r}, {r})) AS cell_lon FROM cl
), typ AS (
  SELECT *, ((cell_lat // {r}) + 2 * (cell_lon // {r})) % 3 AS ty,
         (cell_lat // {r}) * 64 + (cell_lon // {r}) AS ci
  FROM c
), polys AS (
  SELECT tile_id, CASE ty WHEN 0 THEN 'sea' ELSE 'land' END AS kind,
         cell_lat, cell_lon, CAST(-1 AS BIGINT) AS way_id,
         cell_lat AS y0, cell_lon AS x0,
         cell_lat + {r} AS y1, cell_lon + {r} AS x1
  FROM typ WHERE ty < 2
  UNION ALL
  SELECT tile_id, 'land', cell_lat, cell_lon, 2 * ci,
         cell_lat + 8192, cell_lon + 8192, cell_lat + 16384, cell_lon + 16384
  FROM typ WHERE ty = 2
  UNION ALL
  SELECT tile_id, 'sea', cell_lat, cell_lon, 2 * ci + 1,
         cell_lat + 20480, cell_lon + 20480, cell_lat + 28672, cell_lon + 28672
  FROM typ WHERE ty = 2
), pts AS (
  SELECT p.*, i.idx,
         CASE i.idx WHEN 0 THEN y0 WHEN 1 THEN y1 WHEN 2 THEN y1 WHEN 3 THEN y0 ELSE y0 END AS lat,
         CASE i.idx WHEN 0 THEN x0 WHEN 1 THEN x0 WHEN 2 THEN x1 WHEN 3 THEN x1 ELSE x0 END AS lon
  FROM polys p CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS idx) i
)
SELECT tile_id, kind,
       CAST(DENSE_RANK() OVER (PARTITION BY tile_id ORDER BY kind, cell_lat, cell_lon, way_id) - 1 AS INT) AS poly,
       CAST(idx AS INT) AS idx, CAST(lat AS INT) AS lat, CAST(lon AS INT) AS lon
FROM pts
"""


Q_SEA_PRECOMP_SQL = _sea_precomp_oracle_sql()


def q_house_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """addr:interpolation ways (customers as straight E-W ways with an
    addressed node at each end) expanded into synthesized house nodes
    (HousenumberGenerator.interpretInterpolationWay + HousenumberIvl).

    dx is a multiple of 6000, divisible by every steps+1 in {2..6}, so
    each house's true position is an exact integer and the double
    arc-length walk rounds identically in Spark and DuckDB."""
    from .operators.housenumbers import interpolate_housenumbers

    c = _read(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    step = F.when(F.pmod(k, 3) == 2, 1).otherwise(2)
    start = (
        F.when(F.pmod(k, 3) == 0, (F.pmod(k, 20) + 1) * 2)        # even
        .when(F.pmod(k, 3) == 1, F.pmod(k, 20) * 2 + 1)           # odd
        .otherwise(F.pmod(k, 20) + 1)                             # all
    )
    n_intervals = F.pmod(k, 5) + 2  # steps+1 in 2..6
    end = start + step * n_intervals
    dx = (F.pmod(k, 7) + 1) * 6000
    y = lat_col("c_custkey").cast("int")
    x0 = lon_col("c_custkey").cast("int")
    base = c.select(
        k.alias("way_id"),
        F.when(F.pmod(k, 3) == 0, "even")
        .when(F.pmod(k, 3) == 1, "odd")
        .otherwise("all")
        .alias("method"),
        y.alias("y"),
        x0.alias("x0"),
        (x0 + dx).cast("int").alias("x1"),
        start.cast("int").alias("start"),
        end.cast("int").alias("end"),
        F.concat(F.lit("S"), k).alias("street"),
    )
    ways = base.select(
        "way_id", "method",
        F.array("y", "y").alias("lats"),
        F.array("x0", "x1").alias("lons"),
    )
    nodes = base.select(
        F.col("way_id").alias("node_id"), F.col("start").alias("number"),
        "street", F.col("y"), F.col("x0").alias("x"),
    ).unionByName(
        base.select(
            (F.col("way_id") + 10_000_000).alias("node_id"),
            F.col("end").alias("number"),
            "street", F.col("y"), F.col("x1").alias("x"),
        )
    )
    out = interpolate_housenumbers(ways, nodes, metric="planar")
    return out.select(
        "way_id",
        F.col("number"),
        "street",
        F.col("lat"),
        F.col("lon"),
    )


Q_HOUSE_INTERPOLATION_SQL = f"""
WITH w AS (
  SELECT c_custkey AS way_id,
         CASE WHEN c_custkey % 3 = 2 THEN 1 ELSE 2 END AS step,
         CASE WHEN c_custkey % 3 = 0 THEN (c_custkey % 20 + 1) * 2
              WHEN c_custkey % 3 = 1 THEN (c_custkey % 20) * 2 + 1
              ELSE c_custkey % 20 + 1 END AS start,
         c_custkey % 5 + 2 AS n_ivl,
         (c_custkey % 7 + 1) * 6000 AS dx,
         {lat_sql('c_custkey')} AS y,
         {lon_sql('c_custkey')} AS x0,
         'S' || CAST(c_custkey AS VARCHAR) AS street
  FROM customer
), h AS (
  SELECT way_id, step, start, n_ivl, dx, y, x0, street,
         unnest(generate_series(1, CAST(n_ivl - 1 AS BIGINT))) AS kk
  FROM w
)
SELECT CAST(way_id AS BIGINT) AS way_id,
       CAST(start + kk * step AS INT) AS number,
       street,
       CAST(y AS INT) AS lat,
       CAST(x0 + dx * kk / n_ivl AS INT) AS lon
FROM h
"""


# --------------------------------------------------------------------------
# q: MDR-style global index (combiners/MdrBuilder.java — union of every
#    tile's named features, sorted/deduplicated with a collation key)
# --------------------------------------------------------------------------


def q_mdr_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global name index in the reference's REAL collation: the
    cp1252 SRT table (resources/sort/cp1252.txt read per
    mkgmap/srt/SrtTextReader.java) rendered as a 3-strength fixed-hex
    key (functions/collation.py), spaces squashed first
    (Label.squashSpaces).  The global record number is a
    range-partitioned exclusive scan, not a bare Window.orderBy — at
    100 TB the name index never lands on one task."""
    from .functions.collation import collation_key_udf
    from .functions.rank import global_rank

    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("src")
    )
    supp = _read(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("src")
    )
    allnames = cust.unionByName(supp)
    norm = F.regexp_replace(F.trim(F.col("name")), r"\s+", " ")
    key = collation_key_udf(1252)(norm)
    grouped = (
        allnames.withColumn("sort_key", key)
        .groupBy("sort_key", "src")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return global_rank(grouped, ["sort_key", "src"], out="idx")


def _mdr_index_oracle_sql() -> str:
    """DuckDB twin of q_mdr_index: the per-character weight table of
    the parsed cp1252 SRT (one row per contributed weight triple,
    expansion chars contribute several) is embedded as VALUES; the key
    is rebuilt with zero-skip string_agg per strength.  Characters
    outside cp1252 fall back to '?' weights, like the reference's
    codepage encoder replacement (Sort.createSortKey)."""
    from .functions.collation import default_table

    table = default_table(1252)
    rows = table.oracle_weight_rows()
    values = ", ".join(f"({cp}, {seq}, {p}, {s}, {t})" for cp, seq, p, s, t in rows)
    qb = "?".encode("cp1252")[0]
    qp, qs, qt = table.primary[qb], table.secondary[qb], table.tertiary[qb]
    return f"""
WITH a AS (
  SELECT c_name AS name, 'customer' AS src FROM customer
  UNION ALL
  SELECT s_name AS name, 'supplier' AS src FROM supplier
), nm AS (
  SELECT regexp_replace(trim(name), '\\s+', ' ', 'g') AS name, src FROM a
), w(cp, seq, p, s, t) AS (
  VALUES {values}
), pos AS (
  SELECT name, src, unnest(generate_series(1, CAST(length(name) AS BIGINT))) AS i FROM nm
), ch AS (
  SELECT name, src, i, unicode(substr(name, CAST(i AS INT), 1)) AS cp FROM pos
), jw AS (
  SELECT c.name, c.src, c.i, w.seq, w.p, w.s, w.t
  FROM ch c JOIN w ON w.cp = c.cp
  UNION ALL
  SELECT c.name, c.src, c.i, 0 AS seq, {qp} AS p, {qs} AS s, {qt} AS t
  FROM ch c WHERE NOT EXISTS (SELECT 1 FROM w WHERE w.cp = c.cp)
), k AS (
  SELECT name, src,
         COALESCE(string_agg(CASE WHEN p <> 0 THEN printf('%04X', p) END, '' ORDER BY i, seq), '')
         || '-' ||
         COALESCE(string_agg(CASE WHEN s <> 0 THEN printf('%02X', s) END, '' ORDER BY i, seq), '')
         || '-' ||
         COALESCE(string_agg(CASE WHEN t <> 0 THEN printf('%02X', t) END, '' ORDER BY i, seq), '') AS sort_key
  FROM jw GROUP BY name, src
)
SELECT sort_key, src, COUNT(*) AS n,
       CAST(ROW_NUMBER() OVER (ORDER BY sort_key, src) AS BIGINT) AS idx
FROM k GROUP BY sort_key, src
"""


Q_MDR_INDEX_SQL = _mdr_index_oracle_sql()


# mixed-script decorations for the unicode-collation index: one per
# key residue, spanning Latin-1 / Greek / Cyrillic / expansion chars
# so the paged-weight path, the undefined-skip rule, and the expansion
# redirect all exercise (reference tests imgfmt/app/srt/
# UnicodeKeyTest.java, UnicodeCollatorTest.java)
MDR_UNICODE_SUFFIXES = [" Òrsk", " Γαμμα", " Жуков", " ß-Straße", " Ǣther", " élan", " Ømark", " plain"]


def q_mdr_index_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_mdr_index on the UNICODE (cp65001 ``multi``) sort table: the
    paged-weight path of imgfmt/app/srt/Sort.java (pages[ch >>> 8],
    fillKey hasPage skip) keyed by code point with no codepage encode.
    Names are decorated with deterministic mixed-script suffixes since
    the synthetic corpus is ASCII-only."""
    from .functions.collation import collation_key_udf
    from .functions.rank import global_rank

    suf = F.array(*[F.lit(s) for s in MDR_UNICODE_SUFFIXES])
    cust = _read(spark, sf_dir, "customer").select(
        F.concat(
            F.col("c_name"), F.element_at(suf, (F.col("c_custkey") % 8 + 1).cast("int"))
        ).alias("name"),
        F.lit("customer").alias("src"),
    )
    supp = _read(spark, sf_dir, "supplier").select(
        F.concat(
            F.col("s_name"), F.element_at(suf, (F.col("s_suppkey") % 8 + 1).cast("int"))
        ).alias("name"),
        F.lit("supplier").alias("src"),
    )
    allnames = cust.unionByName(supp)
    norm = F.regexp_replace(F.trim(F.col("name")), r"\s+", " ")
    key = collation_key_udf(65001)(norm)
    grouped = (
        allnames.withColumn("sort_key", key)
        .groupBy("sort_key", "src")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return global_rank(grouped, ["sort_key", "src"], out="idx")


def _mdr_index_unicode_oracle_sql() -> str:
    """DuckDB twin of q_mdr_index_unicode.  The weight VALUES table is
    restricted to the query's actual alphabet (printable ASCII + the
    suffix characters) — the full unicode table is 17k rows; the
    restriction changes nothing because every name character is in the
    alphabet.  Characters with no weights contribute NOTHING (plain
    JOIN drops them — the multi path has no '?' fallback)."""
    from .functions.collation import default_table

    table = default_table(65001)
    alphabet = {ord(c) for c in "".join(MDR_UNICODE_SUFFIXES)}
    alphabet |= set(range(0x20, 0x7F))
    rows = table.oracle_weight_rows(restrict=alphabet)
    values = ", ".join(f"({cp}, {seq}, {p}, {s}, {t})" for cp, seq, p, s, t in rows)
    suffixes = ", ".join("'" + s.replace("'", "''") + "'" for s in MDR_UNICODE_SUFFIXES)
    return f"""
WITH suf(j, sfx) AS (
  SELECT * FROM (SELECT unnest(generate_series(1, 8)), unnest([{suffixes}]))
), a AS (
  SELECT c.c_name || s.sfx AS name, 'customer' AS src
  FROM customer c JOIN suf s ON s.j = c.c_custkey % 8 + 1
  UNION ALL
  SELECT p.s_name || s.sfx AS name, 'supplier' AS src
  FROM supplier p JOIN suf s ON s.j = p.s_suppkey % 8 + 1
), nm AS (
  SELECT regexp_replace(trim(name), '\\s+', ' ', 'g') AS name, src FROM a
), w(cp, seq, p, s, t) AS (
  VALUES {values}
), pos AS (
  SELECT name, src, unnest(generate_series(1, CAST(length(name) AS BIGINT))) AS i FROM nm
), ch AS (
  SELECT name, src, i, unicode(substr(name, CAST(i AS INT), 1)) AS cp FROM pos
), jw AS (
  SELECT c.name, c.src, c.i, w.seq, w.p, w.s, w.t
  FROM ch c JOIN w ON w.cp = c.cp
), k AS (
  SELECT name, src,
         COALESCE(string_agg(CASE WHEN p <> 0 THEN printf('%04X', p) END, '' ORDER BY i, seq), '')
         || '-' ||
         COALESCE(string_agg(CASE WHEN s <> 0 THEN printf('%02X', s) END, '' ORDER BY i, seq), '')
         || '-' ||
         COALESCE(string_agg(CASE WHEN t <> 0 THEN printf('%02X', t) END, '' ORDER BY i, seq), '') AS sort_key
  FROM jw GROUP BY name, src
)
SELECT sort_key, src, COUNT(*) AS n,
       CAST(ROW_NUMBER() OVER (ORDER BY sort_key, src) AS BIGINT) AS idx
FROM k GROUP BY sort_key, src
"""


Q_MDR_INDEX_UNICODE_SQL = _mdr_index_unicode_oracle_sql()


# --------------------------------------------------------------------------
# q: POI <-> way linking (--link-pois-to-ways: equi join on a rounded
#    coordinate key, StyledConverter.filterCoordPOI)
# --------------------------------------------------------------------------

POI_ROUND = 12  # round coordinates to 2^12 map units


def q_poi_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--add-pois-to-areas / --add-pois-to-lines (POIGeneratorHook):
    area POIs via label-node priority + centre-of-gravity fallback,
    line POIs at start/end/inner/mid (planar-length midpoint — every
    op IEEE-specified, see operators/poi_gen.py)."""
    from .operators.poi_gen import areas_to_pois, lines_to_pois

    AH, AW = 4000, 6000
    s = _read(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("long")
    cy = lat_col("s_suppkey")
    cx = lon_col("s_suppkey")
    polys = s.select(
        k.alias("id"),
        F.create_map(F.lit("building"), F.lit("yes")).alias("tags"),
        F.array(cy - AH, cy - AH, cy + AH, cy + AH, cy - AH).cast("array<int>").alias("lats"),
        F.array(cx - AW, cx + AW, cx + AW, cx - AW, cx - AW).cast("array<int>").alias("lons"),
    )
    # every 3rd polygon gets a label node at its FIRST corner
    nodes = (
        s.filter(F.pmod(k, F.lit(3)) == 0)
        .select(
            k.alias("id"),
            F.when(F.pmod(k, F.lit(2)) == 0, F.create_map(F.lit("entrance"), F.lit("main")))
            .otherwise(F.create_map(F.lit("entrance"), F.lit("yes")))
            .alias("tags"),
            (cy - AH).cast("int").alias("lat"),
            (cx - AW).cast("int").alias("lon"),
        )
    )
    area_pois = areas_to_pois(polys, nodes).select(
        "id", F.lit("area").alias("poi_type"), "lat", "lon"
    )

    o = _read(spark, sf_dir, "orders")
    ok = F.col("o_orderkey").cast("long")

    def pt(expr):
        return (
            F.pmod(expr * C_LAT, F.lit(LAT_MOD)) - LAT_OFF,
            F.pmod(expr * C_LON, F.lit(LON_MOD)) - LON_OFF,
        )

    y0, x0 = pt(ok)
    y1, x1 = pt(ok + 1)
    y2, x2 = pt(ok + 2)
    lines = o.select(
        ok.alias("id"),
        F.create_map(F.lit("highway"), F.lit("path")).alias("tags"),
        F.array(y0, y1, y2).cast("array<int>").alias("lats"),
        F.array(x0, x1, x2).cast("array<int>").alias("lons"),
    )
    line_pois = lines_to_pois(lines, planar=True).select("id", "poi_type", "lat", "lon")
    return area_pois.unionByName(line_pois)


def _poi_generate_oracle_sql() -> str:
    AH, AW = 4000, 6000
    y = lat_sql("s_suppkey")
    x = lon_sql("s_suppkey")
    ly0, lx0 = lat_sql("o_orderkey"), lon_sql("o_orderkey")
    ly1, lx1 = lat_sql("(o_orderkey + 1)"), lon_sql("(o_orderkey + 1)")
    ly2, lx2 = lat_sql("(o_orderkey + 2)"), lon_sql("(o_orderkey + 2)")
    return f"""
WITH polys AS (
  SELECT CAST(s_suppkey AS BIGINT) AS id, {y} AS cy, {x} AS cx FROM supplier
), ringpts AS (
  SELECT id, 0 AS pos, cy - {AH} AS ly, cx - {AW} AS lx FROM polys
  UNION ALL SELECT id, 1, cy - {AH}, cx + {AW} FROM polys
  UNION ALL SELECT id, 2, cy + {AH}, cx + {AW} FROM polys
  UNION ALL SELECT id, 3, cy + {AH}, cx - {AW} FROM polys
  UNION ALL SELECT id, 4, cy - {AH}, cx - {AW} FROM polys
), labels AS (
  -- label node at the first corner of every 3rd polygon; several
  -- nodes sharing a coordinate keep the best (lowest) order
  SELECT cy - {AH} AS ly, cx - {AW} AS lx,
         MIN(CASE WHEN id % 2 = 0 THEN 0 ELSE 1 END) AS ord
  FROM polys WHERE id % 3 = 0
  GROUP BY 1, 2
), best AS (
  SELECT id, ly, lx,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY ord, pos) AS rn
  FROM ringpts JOIN labels USING (ly, lx)
), areas AS (
  SELECT p.id, 'area' AS poi_type,
         CAST(COALESCE(b.ly,
              CAST(floor((2 * (4 * p.cy) + 4) / 8.0) AS BIGINT)) AS INT) AS lat,
         CAST(COALESCE(b.lx,
              CAST(floor((2 * (4 * p.cx) + 4) / 8.0) AS BIGINT)) AS INT) AS lon
  FROM polys p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (id)
), pts AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id,
         {ly0} AS y0, {lx0} AS x0, {ly1} AS y1, {lx1} AS x1, {ly2} AS y2, {lx2} AS x2
  FROM orders
), dists AS (
  SELECT *, sqrt(CAST((y1-y0)*(y1-y0) + (x1-x0)*(x1-x0) AS DOUBLE)) AS d1,
            sqrt(CAST((y2-y1)*(y2-y1) + (x2-x1)*(x2-x1) AS DOUBLE)) AS d2
  FROM pts
), mids AS (
  SELECT id, 'mid' AS poi_type,
         CASE WHEN (d1+d2)/2 <= d1
              THEN CAST(floor(y0 + (CASE WHEN d1 = 0 THEN 0 ELSE (d1+d2)/2/d1 END) * (y1-y0) + 0.5) AS INT)
              ELSE CAST(floor(y1 + (CASE WHEN d2 = 0 THEN 0 ELSE ((d1+d2)/2 - d1)/d2 END) * (y2-y1) + 0.5) AS INT)
         END AS lat,
         CASE WHEN (d1+d2)/2 <= d1
              THEN CAST(floor(x0 + (CASE WHEN d1 = 0 THEN 0 ELSE (d1+d2)/2/d1 END) * (x1-x0) + 0.5) AS INT)
              ELSE CAST(floor(x1 + (CASE WHEN d2 = 0 THEN 0 ELSE ((d1+d2)/2 - d1)/d2 END) * (x2-x1) + 0.5) AS INT)
         END AS lon
  FROM dists
), linepois AS (
  SELECT id, 'start' AS poi_type, CAST(y0 AS INT) AS lat, CAST(x0 AS INT) AS lon FROM pts
  UNION ALL
  SELECT id, 'end', CAST(y2 AS INT), CAST(x2 AS INT) FROM pts
  UNION ALL
  SELECT id, 'inner', CAST(y1 AS INT), CAST(x1 AS INT) FROM pts
  WHERE NOT (y1 = y0 AND x1 = x0)
  UNION ALL
  SELECT id, poi_type, lat, lon FROM mids
)
SELECT id, poi_type, lat, lon FROM areas
UNION ALL
SELECT id, poi_type, lat, lon FROM linepois
"""


_HEX = [(1000, 0), (500, 866), (-500, 866), (-1000, 0), (-500, -866), (500, -866)]


def q_roundabout_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--check-roundabouts over synthetic hexagonal roundabouts: even
    supplier keys ring clockwise (map view), odd counter-clockwise;
    drive-on-right flags the clockwise ones.  The oracle's votes are
    closed-form: the fixture's cross products depend only on the fixed
    hexagon offsets (centre cancels), so each ring votes exactly ±2."""
    from .operators.roundabouts import check_roundabouts

    s = _read(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("long")
    cy = lat_col("s_suppkey")
    cx = lon_col("s_suppkey")
    cwr = _HEX + [_HEX[0]]
    ccw = list(reversed(cwr))
    lats = F.when(
        F.pmod(k, F.lit(2)) == 0, F.array(*[(cy + dy).cast("int") for dy, _ in cwr])
    ).otherwise(F.array(*[(cy + dy).cast("int") for dy, _ in ccw]))
    lons = F.when(
        F.pmod(k, F.lit(2)) == 0, F.array(*[(cx + dx).cast("int") for _, dx in cwr])
    ).otherwise(F.array(*[(cx + dx).cast("int") for _, dx in ccw]))
    rings = s.select(k.alias("id"), lats.alias("lats"), lons.alias("lons"))
    return check_roundabouts(rings, drive_on_left=False, planar=True)


Q_ROUNDABOUT_CHECK_SQL = """
SELECT CAST(s_suppkey AS BIGINT) AS id,
       CASE WHEN s_suppkey % 2 = 0 THEN 2 ELSE -2 END AS dir_votes,
       s_suppkey % 2 = 0 AS clockwise,
       s_suppkey % 2 = 0 AS wrong_direction
FROM supplier
"""


def q_road_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing-graph arcs (RoadNetwork.addRoad): 3-point ways chained
    through shared scatter points — consecutive order keys share
    endpoints, so junctions split ways into arcs."""
    from .operators.road_network import road_network

    o = _read(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")

    def pt(e):
        return (
            (F.pmod(e * C_LAT, F.lit(LAT_MOD)) - LAT_OFF).cast("int"),
            (F.pmod(e * C_LON, F.lit(LON_MOD)) - LON_OFF).cast("int"),
        )

    y0, x0 = pt(2 * k)
    y1, x1 = pt(2 * k + 1)
    y2, x2 = pt(2 * k + 2)
    roads = o.select(
        k.alias("id"),
        F.array(y0, y1, y2).alias("lats"),
        F.array(x0, x1, x2).alias("lons"),
        F.pmod(k, F.lit(5)).cast("int").alias("road_class"),
        F.pmod(k, F.lit(8)).cast("int").alias("road_speed"),
    )
    _nodes, arcs = road_network(roads)
    return arcs


def _road_network_oracle_sql() -> str:
    p = [
        (lat_sql("(2 * o_orderkey)"), lon_sql("(2 * o_orderkey)")),
        (lat_sql("(2 * o_orderkey + 1)"), lon_sql("(2 * o_orderkey + 1)")),
        (lat_sql("(2 * o_orderkey + 2)"), lon_sql("(2 * o_orderkey + 2)")),
    ]
    selects = "\n  UNION ALL ".join(
        f"SELECT CAST(o_orderkey AS BIGINT) AS way_id, {i} AS pos, "
        f"{y} AS y, {x} AS x, CAST(o_orderkey % 5 AS INT) AS road_class, "
        f"CAST(o_orderkey % 8 AS INT) AS road_speed FROM orders"
        for i, (y, x) in enumerate(p)
    )
    return f"""
WITH pts AS (
  {selects}
), usage AS (
  SELECT y, x, COUNT(*) AS uses FROM pts GROUP BY 1, 2
), marked AS (
  SELECT p.*, (p.pos = 0 OR p.pos = 2 OR u.uses >= 2) AS is_node
  FROM pts p JOIN usage u USING (y, x)
), seg AS (
  SELECT way_id, pos, y, x, road_class, road_speed,
         SUM(CASE WHEN is_node THEN 1 ELSE 0 END) OVER (
           PARTITION BY way_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS marks_before,
         LAG(y) OVER (PARTITION BY way_id ORDER BY pos) AS py,
         LAG(x) OVER (PARTITION BY way_id ORDER BY pos) AS px
  FROM marked
)
SELECT way_id, CAST(marks_before - 1 AS INT) AS arc_idx,
       CAST(arg_min(py, pos) AS INT) AS from_y,
       CAST(arg_min(px, pos) AS INT) AS from_x,
       CAST(arg_max(y, pos) AS INT) AS to_y,
       CAST(arg_max(x, pos) AS INT) AS to_x,
       CAST(COUNT(*) + 1 AS INT) AS n_points,
       CAST(SUM(ABS(y - py) + ABS(x - px)) AS BIGINT) AS cost,
       FIRST(road_class) AS road_class,
       FIRST(road_speed) AS road_speed
FROM seg WHERE pos > 0
GROUP BY way_id, marks_before
"""


def q_poi_way_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = POI_ROUND
    pois = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("poi_id"),
        F.shiftright(lat_col("c_custkey"), g).alias("ry"),
        F.shiftright(lon_col("c_custkey"), g).alias("rx"),
    )
    way_pts = _read(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("way_id"),
        F.shiftright(lat_col("s_suppkey"), g).alias("ry"),
        F.shiftright(lon_col("s_suppkey"), g).alias("rx"),
    )
    return pois.join(way_pts, ["ry", "rx"]).select("poi_id", "way_id", "ry", "rx")


Q_POI_WAY_LINK_SQL = f"""
WITH p AS (
  SELECT c_custkey AS poi_id,
         CAST(floor({lat_sql('c_custkey')} / {1 << POI_ROUND}.0) AS BIGINT) AS ry,
         CAST(floor({lon_sql('c_custkey')} / {1 << POI_ROUND}.0) AS BIGINT) AS rx
  FROM customer
), w AS (
  SELECT s_suppkey AS way_id,
         CAST(floor({lat_sql('s_suppkey')} / {1 << POI_ROUND}.0) AS BIGINT) AS ry,
         CAST(floor({lon_sql('s_suppkey')} / {1 << POI_ROUND}.0) AS BIGINT) AS rx
  FROM supplier
)
SELECT poi_id, way_id, p.ry, p.rx FROM p JOIN w USING (ry, rx)
"""


# --------------------------------------------------------------------------
# q: access bitmask derivation (AccessTagsAndBits.java:27-44)
# --------------------------------------------------------------------------


def q_access_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.access import access_mask_col

    part = _read(spark, sf_dir, "part")
    k = F.col("p_partkey")
    acc = F.element_at(
        F.array(F.lit("yes"), F.lit("no"), F.lit("private"), F.lit("designated")),
        (F.pmod(k, F.lit(4)) + 1).cast("int"),
    )
    foot = F.element_at(
        F.array(F.lit("yes"), F.lit("no"), F.lit("__none__")),
        (F.pmod(k, F.lit(3)) + 1).cast("int"),
    )
    truck = F.element_at(
        F.array(F.lit("yes"), F.lit("no"), F.lit("__none__"), F.lit("private"), F.lit("__none__")),
        (F.pmod(k, F.lit(5)) + 1).cast("int"),
    )
    oneway = F.element_at(
        F.array(F.lit("yes"), F.lit("__none__")), (F.pmod(k, F.lit(2)) + 1).cast("int")
    )
    tags = F.map_filter(
        F.create_map(
            F.lit("access"), acc, F.lit("foot"), foot, F.lit("truck"), truck,
            F.lit("oneway"), oneway
        ),
        lambda key, v: v != F.lit("__none__"),
    )
    return part.select("p_partkey", access_mask_col(tags).alias("access_mask"))


# hand-derived oracle: vehicles all follow blanket `access` except foot
# (own tag when k%3 != 2, bit 0) and truck (own tag when k%5 in {0,1,3},
# bit 4 per AccessTagsAndBits: DELIVERY=bit3, TRUCK=bit4); oneway bit
# when k%2 == 0
Q_ACCESS_MASK_SQL = """
WITH t AS (
  SELECT p_partkey,
         (['yes','no','private','designated'])[(p_partkey % 4) + 1] AS acc,
         (['yes','no','__none__'])[(p_partkey % 3) + 1] AS foot,
         (['yes','no','__none__','private','__none__'])[(p_partkey % 5) + 1] AS truck,
         (p_partkey % 2) = 0 AS ow
  FROM part
), bits AS (
  SELECT p_partkey,
         CASE WHEN foot <> '__none__'
              THEN CASE WHEN foot IN ('no','private','false','0') THEN 0 ELSE 1 END
              ELSE CASE WHEN acc IN ('no','private','false','0') THEN 0 ELSE 1 END END AS foot_bit,
         CASE WHEN truck <> '__none__'
              THEN CASE WHEN truck IN ('no','private','false','0') THEN 0 ELSE 1 END
              ELSE CASE WHEN acc IN ('no','private','false','0') THEN 0 ELSE 1 END END AS truck_bit,
         CASE WHEN acc IN ('no','private','false','0') THEN 0 ELSE 1 END AS veh_bit,
         CASE WHEN ow THEN 1 ELSE 0 END AS ow_bit
  FROM t
)
SELECT p_partkey,
       CAST(foot_bit
            + truck_bit * 16
            + veh_bit * (2 + 4 + 8 + 32 + 64 + 128)
            + ow_bit * 256 AS BIGINT) AS access_mask
FROM bits
"""




def q_typ_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TYP text source round trip: one synthetic [_polygon]/[_line]/
    [_point] section per part row through sources/typ_txt.parse_typ —
    the full-type split (>= 0x100 -> type = v >> 8, subtype = v & 0xff),
    label language decode, and FontStyle mapping, oracled by the same
    arithmetic in SQL."""
    from .sources.typ_txt import parse_typ

    part = _read(spark, sf_dir, "part").select("p_partkey")

    def kernel(it):
        import pandas as _pd

        sections = ["_polygon", "_line", "_point"]
        fonts = ["NoLabel", "Small", "NormalFont", "Large", "Default"]
        for pdf in it:
            rows = []
            for k in pdf["p_partkey"]:
                k = int(k)
                fulltype = 0x100 + (k % 0x2FF)
                sec = sections[k % 3]
                text = (
                    f"[{sec}]\n"
                    f"Type=0x{fulltype:x}\n"
                    f"String1=0x{k % 10:x},P{k}\n"
                    f"FontStyle={fonts[k % 5]}\n"
                    "[end]\n"
                )
                d = parse_typ(text)
                el = (d["polygons"] + d["lines"] + d["points"])[0]
                rows.append(
                    (k, sec[1:], el["type"], el["subtype"], el["font_style"],
                     el["labels"][0][0], el["labels"][0][1])
                )
            yield _pd.DataFrame(
                rows,
                columns=["p_partkey", "kind", "type_code", "subtype",
                         "font_style", "lang", "label"],
            )

    return part.mapInPandas(
        kernel,
        "p_partkey long, kind string, type_code int, subtype int, "
        "font_style int, lang int, label string",
    )


Q_TYP_ELEMENTS_SQL = """
SELECT p_partkey,
       CASE p_partkey % 3 WHEN 0 THEN 'polygon' WHEN 1 THEN 'line' ELSE 'point' END AS kind,
       CAST((256 + p_partkey % 767) // 256 AS int) AS type_code,
       CAST((256 + p_partkey % 767) % 256 AS int) AS subtype,
       CAST(CASE p_partkey % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3
                               WHEN 3 THEN 4 ELSE 0 END AS int) AS font_style,
       CAST(p_partkey % 10 AS int) AS lang,
       'P' || CAST(p_partkey AS varchar) AS label
FROM part
"""




def q_test_map_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The test-map:all-elements synthetic source
    (reader/test/AllElements.java) aggregated per (kind, type_code):
    row counts and named counts — the full generation arithmetic
    (maintype/subtype grid with the maintype-0 break, two passes with
    complementary naming, lines/shapes grids, background) reproduced
    by a closed-form SQL oracle.  sf_dir is unused (the source is
    self-generating, like the reference's test-map: inputs)."""
    from .sources.test_source import all_elements

    del sf_dir
    ae = all_elements(spark)
    return ae.groupBy("kind", "type_code").agg(
        F.count(F.lit(1)).alias("n"), F.count("name").alias("named")
    )


Q_TEST_MAP_GRID_SQL = """
WITH passes AS (SELECT unnest([0,1]) AS p),
grid AS (SELECT mt.range AS mt, s.range AS sub FROM range(0,128) mt, range(-1,32) s
         WHERE mt.range > 0 OR s.range = -1),
pts AS (
  SELECT p, CAST(CASE WHEN sub < 0 THEN mt ELSE mt*256+sub END AS int) AS type_code,
         CASE WHEN (sub < 0) = (p = 1) THEN 1 ELSE 0 END AS named
  FROM passes, grid),
lines AS (SELECT p, CAST(t.range AS int) AS type_code, CASE WHEN p=0 THEN 1 ELSE 0 END AS named
          FROM passes, range(0,64) t),
shapes AS (SELECT p, CAST(t.range AS int) AS type_code, CASE WHEN p=1 THEN 1 ELSE 0 END AS named
           FROM passes, range(0,128) t),
allr AS (
  SELECT 'node' AS kind, type_code, named FROM pts
  UNION ALL SELECT 'way', type_code, named FROM lines
  UNION ALL SELECT 'way', type_code, named FROM shapes
  UNION ALL SELECT 'way', CAST(81 AS int), 1)
SELECT kind, type_code, CAST(COUNT(*) AS bigint) AS n,
       CAST(SUM(named) AS bigint) AS named
FROM allr GROUP BY kind, type_code
"""


# --------------------------------------------------------------------------
# q: NET numbering bit-stream round trip (imgfmt/app/net/NumberPreparer.java
#    + NumberReader.java — encode per-road house-number intervals into the
#    Garmin bit stream and decode them back; round trip is identity for
#    parity-consistent records, the reference's own NumberPreparerTest
#    property)
# --------------------------------------------------------------------------


def q_number_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize deterministic per-road interval records (1-4 nodes per
    road; odd/even sides, side-swapped roads, descending-left roads),
    push each road through the NET bit-stream encoder and reader, and
    return the decoded records.  The oracle regenerates the same records
    in SQL — the codec must reproduce its input exactly."""
    from .operators.housenumbers import roundtrip_number_streams

    c = _read(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    base = c.select(
        k.alias("road_id"),
        F.explode(F.sequence(F.lit(0), F.pmod(k, 4))).alias("node"),
    )
    kk = F.col("road_id")
    j = F.col("node").cast("long")
    ls = F.pmod(kk * 7 + j * 13, F.lit(50)) * 2 + 1
    le = ls + (F.pmod(kk + 3 * j, F.lit(10)) + 1) * 2
    rs = F.pmod(kk * 11 + j * 17, F.lit(50)) * 2 + 2
    re_ = rs + (F.pmod(kk + 5 * j, F.lit(10)) + 1) * 2
    swapped = F.pmod(kk, F.lit(3)) == 1     # left even, right odd
    descending = F.pmod(kk, F.lit(6)) == 3  # left range runs downhill
    intervals = base.select(
        "road_id",
        F.col("node").cast("int").alias("node"),
        F.when(swapped, "E").otherwise("O").alias("l_style"),
        F.when(swapped, rs).when(descending, le).otherwise(ls)
        .cast("int").alias("l_start"),
        F.when(swapped, re_).when(descending, ls).otherwise(le)
        .cast("int").alias("l_end"),
        F.when(swapped, "O").otherwise("E").alias("r_style"),
        F.when(swapped, ls).otherwise(rs).cast("int").alias("r_start"),
        F.when(swapped, le).otherwise(re_).cast("int").alias("r_end"),
    )
    return roundtrip_number_streams(intervals)


Q_NUMBER_STREAMS_SQL = """
WITH n AS (
  SELECT c_custkey AS road_id,
         unnest(generate_series(0, CAST(c_custkey % 4 AS BIGINT))) AS node
  FROM customer
), v AS (
  SELECT road_id, node,
         ((road_id*7 + node*13) % 50) * 2 + 1 AS ls,
         ((road_id*7 + node*13) % 50) * 2 + 1
           + ((road_id + 3*node) % 10 + 1) * 2 AS le,
         ((road_id*11 + node*17) % 50) * 2 + 2 AS rs,
         ((road_id*11 + node*17) % 50) * 2 + 2
           + ((road_id + 5*node) % 10 + 1) * 2 AS re,
         road_id % 3 = 1 AS swapped,
         road_id % 6 = 3 AS descending
  FROM n
)
SELECT CAST(road_id AS BIGINT) AS road_id,
       CAST(node AS INT) AS node,
       CASE WHEN swapped THEN 'E' ELSE 'O' END AS l_style,
       CAST(CASE WHEN swapped THEN rs WHEN descending THEN le ELSE ls END
            AS INT) AS l_start,
       CAST(CASE WHEN swapped THEN re WHEN descending THEN ls ELSE le END
            AS INT) AS l_end,
       CASE WHEN swapped THEN 'O' ELSE 'E' END AS r_style,
       CAST(CASE WHEN swapped THEN ls ELSE rs END AS INT) AS r_start,
       CAST(CASE WHEN swapped THEN le ELSE re END AS INT) AS r_end
FROM v
"""


# --------------------------------------------------------------------------
# q: Garmin format-6 label round trip (imgfmt/app/labelenc/
#    Format6Encoder.java + Format6Decoder.java — 6-bit packing with
#    symbol shifts; decode(encode(s)) == upper(s) for ascii labels and
#    the encoded byte length is closed-form)
# --------------------------------------------------------------------------


def q_label_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode part and customer names into the 6-bit LBL stream and
    decode them back; emit the decoded text and encoded length.  The
    oracle computes upper(name) and (sixes*6)//8+1 in SQL, where
    non-[A-Z0-9 space] chars cost an extra six for the symbol shift."""
    from .functions.labelenc import label_roundtrip6_col

    p = _read(spark, sf_dir, "part").select(
        F.lit("part").alias("src"),
        F.col("p_partkey").cast("long").alias("key"),
        F.col("p_name").alias("name"),
    )
    c = _read(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").cast("long").alias("key"),
        F.col("c_name").alias("name"),
    )
    rt = p.unionByName(c).withColumn("rt", label_roundtrip6_col(F.col("name")))
    return rt.select(
        "src", "key",
        F.col("rt.decoded").alias("decoded"),
        F.col("rt.enc_len").alias("enc_len"),
    )


Q_LABEL_ROUNDTRIP_SQL = """
WITH names AS (
  SELECT 'part' AS src, CAST(p_partkey AS BIGINT) AS key, p_name AS name
  FROM part
  UNION ALL
  SELECT 'customer', CAST(c_custkey AS BIGINT), c_name FROM customer
)
SELECT src, key,
       upper(name) AS decoded,
       CAST(((length(name)
              + length(regexp_replace(upper(name), '[A-Z0-9 ]', '', 'g'))
             ) * 6) // 8 + 1 AS INT) AS enc_len
FROM names
"""


def q_dem_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize deterministic 16x16 elevation tiles (five terrain
    regimes: smooth, rough, plateau-stepped, void-pocked, constant),
    push every tile through the Garmin DEM bit-stream encoder and
    decoder (DEMTile.java's adaptive predictive coder), and re-emit
    the cells with the derived header fields.  The oracle regenerates
    the heights in SQL (codec identity) and recomputes base /
    max_delta / enc_type per tile from scratch (header parity)."""
    from .operators.dem import roundtrip_dem_tiles

    s = _read(spark, sf_dir, "supplier")
    t = F.col("tile_id")
    i = F.col("idx")
    cells = s.select(
        F.col("s_suppkey").cast("long").alias("tile_id"),
        F.explode(F.sequence(F.lit(0), F.lit(255))).alias("idx"),
    ).select(
        "tile_id",
        i.cast("int").alias("idx"),
        F.when(t % 5 == 0,
               (t % 97) + ((i * 31 + t) % 7) - 3)
         .when(t % 5 == 1,
               (i * 7919 + t * 104729) % 4001)
         .when(t % 5 == 2,
               (((F.expr("idx div 8") * 13) + t) % 50) * 7)
         .when(t % 5 == 3,
               F.when((i * 13 + t) % 11 == 0, F.lit(-32768))
                .otherwise((i * 5 + t * 3) % 300))
         .otherwise(t % 100)
         .cast("int").alias("height"),
    )
    return roundtrip_dem_tiles(cells, 16, 16)


Q_DEM_TILES_SQL = """
WITH cells AS (
  SELECT CAST(s_suppkey AS BIGINT) AS tile_id,
         unnest(generate_series(0, 255)) AS idx
  FROM supplier
), h AS (
  SELECT tile_id, idx,
    CASE tile_id % 5
      WHEN 0 THEN (tile_id % 97) + ((idx * 31 + tile_id) % 7) - 3
      WHEN 1 THEN (idx * 7919 + tile_id * 104729) % 4001
      WHEN 2 THEN (((idx // 8) * 13 + tile_id) % 50) * 7
      WHEN 3 THEN CASE WHEN (idx * 13 + tile_id) % 11 = 0 THEN -32768
                       ELSE (idx * 5 + tile_id * 3) % 300 END
      ELSE tile_id % 100
    END AS height
  FROM cells
), hdr AS (
  SELECT tile_id,
         MIN(height) FILTER (WHERE height <> -32768) AS vmin,
         MAX(height) FILTER (WHERE height <> -32768) AS vmax,
         BOOL_OR(height = -32768) AS has_void
  FROM h GROUP BY tile_id
)
SELECT h.tile_id AS tile_id,
       CAST(h.idx AS INT) AS idx,
       CAST(h.height AS INT) AS height,
       CAST(hdr.vmin AS INT) AS base,
       CAST(hdr.vmax - hdr.vmin
            + CASE WHEN hdr.has_void THEN 1 ELSE 0 END AS INT) AS max_delta,
       CAST(CASE WHEN hdr.has_void THEN 2 ELSE 0 END AS INT) AS enc_type
FROM h JOIN hdr ON h.tile_id = hdr.tile_id
"""


def q_dem_section(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carve synthetic DEM sections (25 maps x 3 zoom levels with
    deterministic extents; every fifth map hits the exact-multiple
    remainder edge) into their Garmin tile grids — DEMSection's
    getTileInfo/calcTiles arithmetic: one-sample overlap pad,
    half-tile remainder promotion, 65..95-point fold-in on the last
    row/column.  The oracle replays the same integer arithmetic in
    SQL."""
    from .operators.dem import section_tile_grid

    n = _read(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    zoomed = n.select(
        k.alias("map_id"),
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("zoom"),
    ).select(
        "map_id", "zoom",
        (F.lit(16) * F.when(F.col("zoom") == 0, 1)
                       .when(F.col("zoom") == 1, 2)
                       .otherwise(4)).alias("point_dist"),
    )
    mid = F.col("map_id")
    secs = zoomed.select(
        "map_id", "zoom", "point_dist",
        ((mid % 10) * 10000).alias("area_top"),
        ((mid % 7) * 12000).alias("area_left"),
        F.when(mid % 5 == 0, F.lit(191) * F.col("point_dist"))
         .otherwise(F.lit(3000) + (mid * 977) % 90000).alias("area_height"),
        (F.lit(2500) + (mid * 1409) % 110000).alias("area_width"),
    )
    grid = section_tile_grid(secs)
    return grid.select(
        "map_id",
        F.col("zoom").cast("int").alias("zoom"),
        F.col("point_dist").cast("int").alias("point_dist"),
        F.col("tiles_lat").cast("int").alias("tiles_lat"),
        F.col("tiles_lon").cast("int").alias("tiles_lon"),
        F.col("nonstd_lat").cast("int").alias("nonstd_lat"),
        F.col("nonstd_lon").cast("int").alias("nonstd_lon"),
        F.col("tile_row").cast("int").alias("tile_row"),
        F.col("tile_col").cast("int").alias("tile_col"),
        F.col("lat_off").cast("long").alias("lat_off"),
        F.col("lon_off").cast("long").alias("lon_off"),
        F.col("tile_height").cast("int").alias("tile_height"),
        F.col("tile_width").cast("int").alias("tile_width"),
    )


Q_DEM_SECTION_SQL = """
WITH z AS (
  SELECT CAST(n_nationkey AS BIGINT) AS map_id,
         unnest(generate_series(0, 2)) AS zoom
  FROM nation
), s AS (
  SELECT map_id, zoom,
         16 * CASE zoom WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS point_dist
  FROM z
), a AS (
  SELECT *,
    (map_id % 10) * 10000 AS area_top,
    (map_id % 7) * 12000 AS area_left,
    CASE WHEN map_id % 5 = 0 THEN 191 * point_dist
         ELSE 3000 + (map_id * 977) % 90000 END AS area_height,
    2500 + (map_id * 1409) % 110000 AS area_width
  FROM s
), g AS (
  SELECT *,
    (area_height + point_dist) // (64 * point_dist) AS nfull_lat,
    (area_height + point_dist) % (64 * point_dist) AS rest_lat,
    (area_width + point_dist) // (64 * point_dist) AS nfull_lon,
    (area_width + point_dist) % (64 * point_dist) AS rest_lon
  FROM a
), t AS (
  SELECT *,
    rest_lat // point_dist
      + CASE WHEN rest_lat % point_dist <> 0 THEN 1 ELSE 0 END AS ns0_lat,
    rest_lon // point_dist
      + CASE WHEN rest_lon % point_dist <> 0 THEN 1 ELSE 0 END AS ns0_lon
  FROM g
), gg AS (
  SELECT *,
    GREATEST(nfull_lat + CASE WHEN ns0_lat >= 32 THEN 1 ELSE 0 END,
             1) AS tiles_lat,
    CASE WHEN ns0_lat >= 32 THEN ns0_lat
         ELSE ns0_lat + CASE WHEN nfull_lat > 0 THEN 64 ELSE 0 END
    END AS nonstd_lat,
    GREATEST(nfull_lon + CASE WHEN ns0_lon >= 32 THEN 1 ELSE 0 END,
             1) AS tiles_lon,
    CASE WHEN ns0_lon >= 32 THEN ns0_lon
         ELSE ns0_lon + CASE WHEN nfull_lon > 0 THEN 64 ELSE 0 END
    END AS nonstd_lon
  FROM t
), rows_lat AS (
  SELECT *, unnest(generate_series(0, tiles_lat - 1)) AS tile_row FROM gg
), cells AS (
  SELECT *, unnest(generate_series(0, tiles_lon - 1)) AS tile_col
  FROM rows_lat
)
SELECT map_id,
       CAST(zoom AS INT) AS zoom,
       CAST(point_dist AS INT) AS point_dist,
       CAST(tiles_lat AS INT) AS tiles_lat,
       CAST(tiles_lon AS INT) AS tiles_lon,
       CAST(nonstd_lat AS INT) AS nonstd_lat,
       CAST(nonstd_lon AS INT) AS nonstd_lon,
       CAST(tile_row AS INT) AS tile_row,
       CAST(tile_col AS INT) AS tile_col,
       CAST(area_top - tile_row * point_dist * 64 AS BIGINT) AS lat_off,
       CAST(area_left + tile_col * point_dist * 64 AS BIGINT) AS lon_off,
       CAST(CASE WHEN tile_row = tiles_lat - 1 THEN nonstd_lat
                 ELSE 64 END AS INT) AS tile_height,
       CAST(CASE WHEN tile_col = tiles_lon - 1 THEN nonstd_lon
                 ELSE 64 END AS INT) AS tile_width
FROM cells
"""


def q_cycleway_hooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HighwayHooks + StyledConverter.makeCycleWay over a deterministic
    tag mix: implicit roundabout oneway, the opposite-cycleway flag
    ladder, and the synthesised reverse cycleway duplicate (access=no /
    bicycle=yes / oneway=no, vehicle-class tags dropped).  The oracle
    replays the ladder as CASE arithmetic and emits the duplicate row
    via UNION ALL."""
    from .operators.highway_hooks import (
        highway_hooks_ways,
        synthesize_cycleways,
    )

    c = _read(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    hw = (F.when(k % 7 == 0, "residential").when(k % 7 == 1, "motorway")
           .when(k % 7 == 2, "cycleway").when(k % 7 == 3, F.lit(None))
           .when(k % 7 == 4, "primary").when(k % 7 == 5, "secondary")
           .otherwise("trunk"))
    ow = (F.when(k % 6 == 0, "yes").when(k % 6 == 1, "-1")
           .when(k % 6 == 2, "no").when(k % 6 == 3, F.lit(None))
           .when(k % 6 == 4, "true").otherwise("reverse"))
    ways = c.select(
        k.alias("id"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("highway"), F.lit("route"), F.lit("junction"),
                        F.lit("oneway"), F.lit("oneway:bicycle"),
                        F.lit("cycleway"), F.lit("cycleway:left"),
                        F.lit("motorcar"), F.lit("foot"), F.lit("name")),
                F.array(
                    hw,
                    F.when(k % 7 == 3, "ferry"),
                    F.when(k % 5 == 0, "roundabout"),
                    ow,
                    F.when(k % 4 == 1, "no"),
                    F.when(k % 3 == 1, "opposite")
                     .when(k % 3 == 2, "lane"),
                    F.when(k % 11 == 0, "opposite_track"),
                    F.when(k % 2 == 0, "yes"),
                    F.when(k % 3 == 0, "yes"),
                    F.concat(F.lit("W"), k.cast("string")),
                ),
            ),
            lambda kk, v: v.isNotNull(),
        ).alias("tags"),
    )
    out = synthesize_cycleways(
        highway_hooks_ways(ways, make_opposite_cycleways=True))
    t = F.col("tags")
    return out.select(
        "id",
        F.coalesce(t.getItem("mkgmap:synthesised") == "yes", F.lit(False))
         .alias("synthesized"),
        t.getItem("oneway").alias("oneway_out"),
        t.getItem("access").alias("access_out"),
        t.getItem("bicycle").alias("bicycle_out"),
        t.getItem("motorcar").alias("motorcar_out"),
        t.getItem("foot").alias("foot_out"),
        t.getItem("name").alias("name_out"),
        t.getItem("mkgmap:make-cycle-way").isNotNull().alias("flag_left"),
    )


Q_CYCLEWAY_HOOKS_SQL = """
WITH w AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
    CASE c_custkey % 7 WHEN 0 THEN 'residential' WHEN 1 THEN 'motorway'
         WHEN 2 THEN 'cycleway' WHEN 3 THEN NULL WHEN 4 THEN 'primary'
         WHEN 5 THEN 'secondary' ELSE 'trunk' END AS highway,
    CASE WHEN c_custkey % 7 = 3 THEN 'ferry' END AS route,
    CASE WHEN c_custkey % 5 = 0 THEN 'roundabout' END AS junction,
    CASE c_custkey % 6 WHEN 0 THEN 'yes' WHEN 1 THEN '-1' WHEN 2 THEN 'no'
         WHEN 3 THEN NULL WHEN 4 THEN 'true' ELSE 'reverse' END AS oneway,
    CASE WHEN c_custkey % 4 = 1 THEN 'no' END AS oneway_bicycle,
    CASE WHEN c_custkey % 3 = 1 THEN 'opposite'
         WHEN c_custkey % 3 = 2 THEN 'lane' END AS cycleway,
    CASE WHEN c_custkey % 11 = 0 THEN 'opposite_track' END AS cycleway_left,
    CASE WHEN c_custkey % 2 = 0 THEN 'yes' END AS motorcar,
    CASE WHEN c_custkey % 3 = 0 THEN 'yes' END AS foot,
    'W' || CAST(c_custkey AS VARCHAR) AS name
  FROM customer
), eff AS (
  SELECT *,
    highway IS NOT NULL OR route = 'ferry' AS is_road,
    CASE WHEN (highway IS NOT NULL OR route = 'ferry')
              AND junction = 'roundabout' AND oneway IS NULL
         THEN 'yes' ELSE oneway END AS oneway_eff
  FROM w
), flag AS (
  SELECT *,
    is_road
    AND (highway IS NULL OR highway <> 'cycleway')
    AND COALESCE(oneway_eff IN ('yes','true','1','-1','reverse'), FALSE)
    AND (COALESCE(oneway_bicycle = 'no', FALSE)
         OR COALESCE(cycleway IN ('opposite','opposite_lane',
                                  'opposite_track'), FALSE)
         OR COALESCE(cycleway_left IN ('opposite_lane','opposite_track'),
                     FALSE)) AS make_cycle
  FROM eff
)
SELECT id, FALSE AS synthesized, oneway_eff AS oneway_out,
       CAST(NULL AS VARCHAR) AS access_out,
       CAST(NULL AS VARCHAR) AS bicycle_out,
       motorcar AS motorcar_out, foot AS foot_out, name AS name_out,
       FALSE AS flag_left
FROM flag
UNION ALL
SELECT id, TRUE, 'no', 'no', 'yes', NULL, NULL, name, FALSE
FROM flag WHERE make_cycle
"""


def q_exit_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HighwayHooks exit handling: junction nodes gain mkgmap:osmid and
    inherit exit:road_ref from the lowest-id ref-tagged motorway/trunk
    way containing them; pre-tagged exits keep their ref.  The oracle
    rebuilds the way->node containment arithmetically and arg_min's
    the ref."""
    from .operators.highway_hooks import exit_road_refs

    s = _read(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("long")
    nodes = s.select(
        k.alias("id"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("highway"), F.lit("exit:road_ref"),
                        F.lit("name")),
                F.array(
                    F.when(k % 3 == 0, "motorway_junction")
                     .when(k % 3 == 1, "services")
                     .otherwise("bus_stop"),
                    F.when(k % 5 == 0, F.concat(F.lit("A"), k.cast("string"))),
                    F.concat(F.lit("N"), k.cast("string")),
                ),
            ),
            lambda kk, v: v.isNotNull(),
        ).alias("tags"),
    )
    ways = s.select(
        (k + 100000).alias("id"),
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("highway"), F.lit("ref")),
                F.array(
                    F.when(k % 2 == 0, "motorway").otherwise("trunk"),
                    F.when(k % 4 != 1, F.concat(F.lit("M"),
                                                (k % 40).cast("string"))),
                ),
            ),
            lambda kk, v: v.isNotNull(),
        ).alias("tags"),
        F.array(k, (k * 3) % 97 + 1, (k * 7) % 97 + 1).alias("refs"),
    )
    out = exit_road_refs(nodes, ways)
    t = F.col("tags")
    return out.select(
        "id",
        t.getItem("mkgmap:osmid").alias("osmid_tag"),
        t.getItem("exit:road_ref").alias("road_ref_out"),
        t.getItem("highway").alias("highway_out"),
    )


Q_EXIT_REFS_SQL = """
WITH n AS (
  SELECT CAST(s_suppkey AS BIGINT) AS id,
    CASE s_suppkey % 3 WHEN 0 THEN 'motorway_junction'
         WHEN 1 THEN 'services' ELSE 'bus_stop' END AS highway,
    CASE WHEN s_suppkey % 5 = 0
         THEN 'A' || CAST(s_suppkey AS VARCHAR) END AS pre_ref
  FROM supplier
), wn AS (
  SELECT CAST(s_suppkey + 100000 AS BIGINT) AS way_id,
         CASE WHEN s_suppkey % 4 <> 1
              THEN 'M' || CAST(s_suppkey % 40 AS VARCHAR) END AS ref,
         unnest([CAST(s_suppkey AS BIGINT),
                 CAST((s_suppkey * 3) % 97 + 1 AS BIGINT),
                 CAST((s_suppkey * 7) % 97 + 1 AS BIGINT)]) AS node_id
  FROM supplier
), best AS (
  SELECT node_id, arg_min(ref, way_id) AS road_ref
  FROM wn WHERE ref IS NOT NULL GROUP BY node_id
)
SELECT n.id,
       CAST(n.id AS VARCHAR) AS osmid_tag,
       COALESCE(n.pre_ref, best.road_ref) AS road_ref_out,
       n.highway AS highway_out
FROM n LEFT JOIN best ON n.id = best.node_id
WHERE n.highway IN ('motorway_junction', 'services')
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "style_rules": q_style_rules,
    "style_rules_full": q_style_rules_full,
    "apply_members": q_apply_members,
    "road_merge": q_road_merge,
    "turn_restrictions": q_turn_restrictions,
    "house_numbers": q_house_numbers,
    "house_interpolation": q_house_interpolation,
    "sea_polygons": q_sea_polygons,
    "sea_precomp": q_sea_precomp,
    "roundabout_flares": q_roundabout_flares,
    "dest_hints": q_dest_hints,
    "locator_autofill": q_locator_autofill,
    "mdr_index": q_mdr_index,
    "mdr_index_unicode": q_mdr_index_unicode,
    "poi_way_link": q_poi_way_link,
    "access_mask": q_access_mask,
    "knn_cells": q_knn_cells,
    "pip_polygon": q_pip_polygon,
    "segment_join": q_segment_join,
    "lang_id": q_lang_id,
    "token_counts": q_token_counts,
    "minhash_pairs": q_minhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash_pairs": q_simhash_pairs,
    "ann_lsh": q_ann_lsh,
    "line_merge": q_line_merge,
    "cell_index": q_cell_index,
    "tile_histogram": q_tile_histogram,
    "pip_rect_join": q_pip_rect_join,
    "knn_join": q_knn,
    "triangle_orientation": q_triangle_orientation,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "lang_profile": q_lang_profile,
    "lineitem_agg": q_lineitem_agg,
    "events_window": q_events_window,
    "events_user_stats": q_events_user_stats,
    "embedding_topk": q_embedding_topk,
    "tile_assign": q_tile_assign,
    "tile_assign_fixed": q_tile_assign_fixed,
    "quality_scores": q_quality_scores,
    "doc_fingerprints": q_doc_fingerprints,
    "media_decode": q_media_decode,
    "ann_ivf": q_ann_ivf,
    "embedding_near_dups": q_embedding_near_dups,
    "poi_generate": q_poi_generate,
    "road_network": q_road_network,
    "roundabout_check": q_roundabout_check,
    "typ_elements": q_typ_elements,
    "test_map_grid": q_test_map_grid,
    "number_streams": q_number_streams,
    "label_roundtrip": q_label_roundtrip,
    "dem_tiles": q_dem_tiles,
    "dem_section": q_dem_section,
    "cycleway_hooks": q_cycleway_hooks,
    "exit_refs": q_exit_refs,
}

ORACLES: dict[str, str] = {
    "style_rules": Q_STYLE_RULES_SQL,
    "style_rules_full": Q_STYLE_FULL_SQL,
    "apply_members": Q_APPLY_MEMBERS_SQL,
    "road_merge": Q_ROAD_MERGE_SQL,
    "turn_restrictions": Q_TURN_RESTRICTIONS_SQL,
    "house_numbers": Q_HOUSE_NUMBERS_SQL,
    "house_interpolation": Q_HOUSE_INTERPOLATION_SQL,
    "sea_polygons": Q_SEA_POLYGONS_SQL,
    "sea_precomp": Q_SEA_PRECOMP_SQL,
    "roundabout_flares": Q_ROUNDABOUT_FLARES_SQL,
    "dest_hints": Q_DEST_HINTS_SQL,
    "locator_autofill": Q_LOCATOR_AUTOFILL_SQL,
    "mdr_index": Q_MDR_INDEX_SQL,
    "mdr_index_unicode": Q_MDR_INDEX_UNICODE_SQL,
    "poi_way_link": Q_POI_WAY_LINK_SQL,
    "access_mask": Q_ACCESS_MASK_SQL,
    "knn_cells": Q_KNN_SQL,
    "pip_polygon": Q_PIP_POLYGON_SQL,
    "segment_join": Q_SEGMENT_JOIN_SQL,
    "lang_id": _lang_id_sql(),
    "token_counts": Q_TOKEN_COUNTS_SQL,
    "minhash_pairs": _minhash_oracle_sql(),
    "ngram_jaccard": _ngram_jaccard_oracle_sql(),
    "simhash_pairs": _simhash_oracle_sql(),
    "ann_lsh": _ann_lsh_oracle_sql(),
    "line_merge": Q_LINE_MERGE_SQL,
    "cell_index": Q_CELL_INDEX_SQL,
    "tile_histogram": Q_TILE_HISTOGRAM_SQL,
    "pip_rect_join": Q_PIP_RECT_JOIN_SQL,
    "knn_join": Q_KNN_SQL,
    "triangle_orientation": Q_TRIANGLE_SQL,
    "dedup_exact": Q_DEDUP_EXACT_SQL,
    "token_stats": Q_TOKEN_STATS_SQL,
    "lang_profile": Q_LANG_PROFILE_SQL,
    "lineitem_agg": Q_LINEITEM_AGG_SQL,
    "events_window": Q_EVENTS_WINDOW_SQL,
    "events_user_stats": Q_EVENTS_USER_STATS_SQL,
    "embedding_topk": Q_EMBEDDING_TOPK_SQL,
    # tile_assign: the tree itself cannot be derived in SQL (quadtree
    # driver loop), so its oracle embeds the tree PRECOMPUTED at the
    # driver's sf0.01 gate scale by the independent element-at-a-time
    # oracle (see _tile_assign_sql / scripts/gen_tile_oracle.py);
    # tile_assign_fixed keeps the literal-tree variant
    "tile_assign": Q_TILE_ASSIGN_SQL,
    "tile_assign_fixed": _tile_assign_fixed_sql(),
    "quality_scores": Q_QUALITY_SCORES_SQL,
    "doc_fingerprints": Q_DOC_FINGERPRINTS_SQL,
    "media_decode": Q_MEDIA_DECODE_SQL,
    "ann_ivf": Q_ANN_IVF_SQL,
    "embedding_near_dups": _embedding_near_dups_oracle_sql(),
    "poi_generate": _poi_generate_oracle_sql(),
    "road_network": _road_network_oracle_sql(),
    "roundabout_check": Q_ROUNDABOUT_CHECK_SQL,
    "typ_elements": Q_TYP_ELEMENTS_SQL,
    "test_map_grid": Q_TEST_MAP_GRID_SQL,
    "number_streams": Q_NUMBER_STREAMS_SQL,
    "label_roundtrip": Q_LABEL_ROUNDTRIP_SQL,
    "dem_tiles": Q_DEM_TILES_SQL,
    "dem_section": Q_DEM_SECTION_SQL,
    "cycleway_hooks": Q_CYCLEWAY_HOOKS_SQL,
    "exit_refs": Q_EXIT_REFS_SQL,
}
