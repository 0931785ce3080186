"""Similarity search over embedding columns.

- brute_force_topk: exact top-k by cosine (or quantized inner product)
  — broadcast the query set, one window per query.  The baseline.
- lsh_topk: random-hyperplane LSH buckets (sign bits of fixed seeded
  projections) -> candidates join on bucket band -> exact re-rank.
  The scale path: no cross join; buckets shard the shuffle.

Projections are seeded deterministic (numpy RandomState), computed in
an Arrow-batched pandas UDF (matrix multiply per batch — the vector
math Spark's built-ins can't express efficiently).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.materialize import materialize


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbours for each query vector.

    queries: (qid, qv).  Dot products via zip_with/aggregate (JVM);
    cosine normalizes by precomputed norms.  Deterministic tie-break on
    neighbour id.
    """
    dot = F.expr("aggregate(zip_with(qv, v, (a, b) -> cast(a as double) * b), 0D, (acc, x) -> acc + x)")
    nrm = F.expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + cast(x as double) * x))")
    qnrm = F.expr("sqrt(aggregate(qv, 0D, (acc, x) -> acc + cast(x as double) * x))")
    e = embeddings.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v"))
    pairs = e.crossJoin(F.broadcast(queries)).filter(F.col("nid") != F.col("qid"))
    if metric == "cosine":
        score = dot / (nrm * qnrm)
    else:
        score = dot
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col("nid"))
    return (
        pairs.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "score")
    )


def _int_sig_udf(planes: list[list[int]]):
    """Sign-LSH signature as one Arrow kernel: the JVM form evaluated
    n_planes interpreted zip_with/aggregate folds per row; numpy does
    the (rows x planes) integer matmul in one pass.  Exact: quantized
    components and the +-500 plane weights bound every dot far below
    2^63, and the signature bit is just (dot >= 0)."""
    P = np.asarray(planes, dtype=np.int64)
    W = np.int64(1) << np.arange(len(planes), dtype=np.int64)

    @F.pandas_udf("long")
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        M = np.vstack([np.asarray(a, dtype=np.int64) for a in vs])
        bits = (M @ P.T) >= 0
        return pd.Series((bits * W[None, :]).sum(axis=1))

    return sig


def lsh_plane_weights(dim: int, n_planes: int, seed: int = 0xA11CE) -> list[list[int]]:
    """Deterministic integer hyperplane weights in [-500, 500] — shared
    by the Spark expression and the SQL oracle builder so both engines
    compute identical sign bits (exact int arithmetic, no float order
    sensitivity)."""
    import random as _random

    rng = _random.Random(seed)
    return [[rng.randint(-500, 500) for _ in range(dim)] for _ in range(n_planes)]


def lsh_topk_int(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with quantized-int vectors and integer LSH
    planes: sign-bucket band join -> exact integer-dot re-rank.  Same
    scale shape as lsh_topk (no cross join), but every step is exact
    int64 arithmetic reproducible in ANSI SQL (the driver oracle).
    Output: (qid, neighbor_id, rank, dot)."""
    planes = lsh_plane_weights(dim, n_planes)
    bits_per_band = n_planes // bands
    qv = f"transform({{c}}, x -> cast(round(x * {scale}, 0) as bigint))"
    sig_udf = _int_sig_udf(planes)

    def banded(df, idc, vc_in, out_id, out_v):
        d = df.select(
            F.col(idc).alias(out_id), F.expr(qv.format(c=vc_in)).alias(out_v)
        ).withColumn("_sig", sig_udf(F.col(out_v)))
        return d.select(
            out_id,
            out_v,
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("_sig"), b * bits_per_band).bitwiseAND(
                            F.lit((1 << bits_per_band) - 1).cast("long")
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    # band join + dedup on ids only; vectors re-attach afterwards
    # (guide §8 — the candidate decision needs no payload).  The
    # neighbour side re-quantizes from the source scan; the query side
    # is small and re-derives the same way.
    e = banded(embeddings, id_col, vec_col, "neighbor_id", "v")
    qb = banded(queries, "qid", "qv", "qid", "qvq")
    cand_ids = (
        e.select("neighbor_id", "band", "bucket")
        .join(qb.select("qid", "band", "bucket"), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id")
        .dropDuplicates(["qid", "neighbor_id"])
    )
    # re-attach by BROADCASTING the deduped id pairs into the
    # neighbour scan (the candidate set is bounded by the small query
    # side, so the big table is never shuffled — it streams through
    # two broadcast hash joins straight into the per-query top-k)
    cands = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.expr(qv.format(c=vec_col)).alias("v")
        )
        .join(F.broadcast(cand_ids), "neighbor_id")
        .join(
            F.broadcast(
                queries.select(F.col("qid"), F.expr(qv.format(c="qv")).alias("qvq"))
            ),
            "qid",
        )
    )
    dot = F.expr("aggregate(zip_with(qvq, v, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.col("neighbor_id"))
    return (
        cands.withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "neighbor_id", "rank", "dot")
    )


def lsh_topk_int_oracle_sql(
    n_query: int = 10,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    scale: int = 10_000,
) -> str:
    """DuckDB equivalent of lsh_topk_int over the embeddings view."""
    planes = lsh_plane_weights(dim, n_planes)
    bits_per_band = n_planes // bands
    bits = []
    for p, w in enumerate(planes):
        warr = "[" + ", ".join(str(x) for x in w) + "]"
        dot = f"list_sum(list_transform(range(1, {dim} + 1), i -> qv[i] * ({warr})[i]))"
        bits.append(f"CASE WHEN {dot} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    sig = "(" + " + ".join(bits) + ")"
    mask = (1 << bits_per_band) - 1
    return f"""
WITH qvs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {scale}, 0) AS BIGINT)) AS qv
  FROM embeddings
), sigs AS (
  SELECT vec_id, qv, {sig} AS sig FROM qvs
), banded AS (
  SELECT vec_id, qv, b.band, (sig >> (b.band * {bits_per_band})) & {mask} AS bucket
  FROM sigs, (SELECT unnest(range(0, {bands})) AS band) b
), cands AS (
  SELECT DISTINCT q.vec_id AS qid, q.qv AS qvq, e.vec_id AS neighbor_id, e.qv AS v
  FROM banded q JOIN banded e ON q.band = e.band AND q.bucket = e.bucket
  WHERE q.vec_id < {n_query} AND e.vec_id <> q.vec_id
), scored AS (
  SELECT qid, neighbor_id,
         CAST(list_sum(list_transform(range(1, {dim} + 1), i -> qvq[i] * v[i])) AS BIGINT) AS dot
  FROM cands
), ranked AS (
  SELECT qid, neighbor_id, dot,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT qid, neighbor_id, rank, dot FROM ranked WHERE rank <= {k}
"""


def _projection_udf(dim: int, n_planes: int, seed: int):
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float64)

    @F.pandas_udf("long")
    def project(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        bits = (m @ planes) > 0
        out = np.zeros(len(m), dtype=np.int64)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    return project


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join + exact re-rank.

    A candidate matches if it shares any of ``bands`` bucket bands
    (n_planes/bands bits each) with the query. Recall grows with bands;
    no O(N*Q) cross join ever materializes.
    """
    project = _projection_udf(dim, n_planes, seed)
    bits_per_band = n_planes // bands

    def banded(df, idc, vc):
        d = df.withColumn("_sig", project(F.col(vc)))
        return d.select(
            F.col(idc),
            F.col(vc),
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("_sig"), b * bits_per_band).bitwiseAND(
                            F.lit((1 << bits_per_band) - 1).cast("long")
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    e = banded(embeddings.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v")), "nid", "v")
    q = banded(queries.select(F.col("qid"), F.col("qv")), "qid", "qv")

    cands = (
        e.join(q, ["band", "bucket"])
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "qv", "nid", "v")
        .dropDuplicates(["qid", "nid"])
    )
    dot = F.expr("aggregate(zip_with(qv, v, (a, b) -> cast(a as double) * b), 0D, (acc, x) -> acc + x)")
    nrm = F.expr("sqrt(aggregate(v, 0D, (acc, x) -> acc + cast(x as double) * x))")
    qnrm = F.expr("sqrt(aggregate(qv, 0D, (acc, x) -> acc + cast(x as double) * x))")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col("nid"))
    return (
        cands.withColumn("score", dot / (nrm * qnrm))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "score")
    )


def ivf_topk_int(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "qv",
) -> DataFrame:
    """IVF (inverted-file) ANN over quantized-int vectors.

    The coarse quantizer is the first ``n_centroids`` data vectors (a
    deterministic sampling init — k-means++ without refinement keeps
    every step exact-int and SQL-reproducible).  Every vector lands in
    the bucket of its nearest centroid by integer dot product; queries
    probe their ``nprobe`` nearest buckets and re-rank candidates
    exactly.

    100-TB shape: the centroid table is tiny and broadcast; bucket
    assignment is a per-row argmax over a literal centroid array (no
    shuffle), the candidate join is a plain equi join on bucket id,
    and the only window partitions by query id.  Inputs must carry
    int64 vectors (``qv``); queries: (qid, qv).
    Output: (qid, neighbor_id, rank, dot)."""
    cent = (
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    if not cent:
        raise ValueError("no centroid rows (need vec ids < n_centroids)")

    def dot(a: str, b: str) -> str:
        return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

    # Bucket assignment / probe ranking run vectorized in Arrow (guide
    # §4.2): the JVM form was n_centroids interpreted zip_with/aggregate
    # folds PER ROW.  Exact equivalence with the SQL oracle's
    # "ORDER BY dot DESC, cid DESC" pick: centroid dots are < 2^43 for
    # quantized inputs and cid < 2^20, so key = dot * 2^20 + cid orders
    # (dot, cid) lexicographically in int64 with no overflow; numpy
    # argmax / argsort on the keys reproduce array_max / array_sort
    # bit-for-bit (keys are unique because cids are).
    C = np.asarray([[int(x) for x in r["cv"]] for r in cent], dtype=np.int64)
    CIDS = np.asarray([int(r["cid"]) for r in cent], dtype=np.int64)
    _KEY_SHIFT = np.int64(1 << 20)

    def _dots(vs: pd.Series) -> np.ndarray:
        return np.vstack([np.asarray(a, dtype=np.int64) for a in vs]) @ C.T

    @F.pandas_udf("long")
    def _bucket_of(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        keys = _dots(vs) * _KEY_SHIFT + CIDS[None, :]
        return pd.Series(CIDS[np.argmax(keys, axis=1)])

    @F.pandas_udf("array<long>")
    def _probes_of(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        keys = _dots(vs) * _KEY_SHIFT + CIDS[None, :]
        order = np.argsort(keys, axis=1)[:, ::-1][:, :nprobe]
        return pd.Series(list(CIDS[order]))

    e = embeddings.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("v")
    ).withColumn("bucket", _bucket_of("v"))
    # nprobe nearest buckets per query: (dot, cid) desc, slice
    q = (
        queries.select("qid", F.col(vec_col).alias("qv"))
        .withColumn("_probes", _probes_of("qv"))
        .select("qid", "qv", F.explode("_probes").alias("bucket"))
    )
    cands = (
        q.join(e, "bucket")
        .filter(F.col("nid") != F.col("qid"))
        .dropDuplicates(["qid", "nid"])
        .withColumn("dot", F.expr(dot("qv", "v")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.col("nid"))
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("nid").alias("neighbor_id"), "rank", "dot")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    scale: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup family member
    for embedding columns): sign-LSH band SELF-join -> exact cosine
    verify, no cross join anywhere.

    Determinism: vectors quantize to int64; the cosine test compares
    dot^2 >= t^2 * |a|^2 * |b|^2 in doubles whose operands are exact
    integers — identical IEEE ops in Spark and the SQL oracle (sqrt
    never enters).  Output: (vec_a, vec_b, cos2) with vec_a < vec_b.
    """
    planes = lsh_plane_weights(dim, n_planes)
    bits_per_band = n_planes // bands
    qv = f"transform({vec_col}, x -> cast(round(x * {scale}, 0) as bigint))"
    sig_udf = _int_sig_udf(planes)

    base = (
        embeddings.select(F.col(id_col).alias("vid"), F.expr(qv).alias("v"))
        .withColumn("_sig", sig_udf(F.col("v")))
        .withColumn(
            "_n2",
            F.expr("aggregate(v, 0L, (acc, x) -> acc + x * x)"),
        )
    )
    # self-join ahead: materialize the signatures once
    base = base.transform(materialize)
    # the band self-join and the pair dedup only DECIDE which id pairs
    # are candidates — ship ids, not the 64-long vectors (guide §8:
    # every shuffle but the last moves a lightweight proxy); vectors
    # re-attach afterwards from the materialized base, id-keyed
    banded = base.select(
        "vid",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_sig"), b * bits_per_band).bitwiseAND(
                        F.lit((1 << bits_per_band) - 1).cast("long")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("vid").alias("vec_a"), "band", "bucket")
    b = banded.select(F.col("vid").alias("vec_b"), "band", "bucket")
    pair_ids = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    pairs = pair_ids.join(
        base.select(
            F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("_n2").alias("na")
        ),
        "vec_a",
    ).join(
        base.select(
            F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("_n2").alias("nb")
        ),
        "vec_b",
    )
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, (acc, z) -> acc + z)")
    t2 = float(threshold) * float(threshold)
    return (
        pairs.withColumn("_dot", dot)
        .filter(
            (F.col("_dot") > 0)
            & (
                F.col("_dot").cast("double") * F.col("_dot").cast("double")
                >= F.lit(t2) * F.col("na").cast("double") * F.col("nb").cast("double")
            )
        )
        .select(
            "vec_a",
            "vec_b",
            (
                F.col("_dot").cast("double") * F.col("_dot").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("cos2"),
        )
    )


def embedding_near_dups_oracle_sql(
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    scale: int = 10_000,
) -> str:
    """DuckDB equivalent of embedding_near_dups over the embeddings
    view — replicates the banding (recall-for-recall) and the exact
    squared-cosine verify."""
    planes = lsh_plane_weights(dim, n_planes)
    bits_per_band = n_planes // bands
    bits = []
    for p, w in enumerate(planes):
        warr = "[" + ", ".join(str(x) for x in w) + "]"
        dot = f"list_sum(list_transform(range(1, {dim} + 1), i -> qv[i] * ({warr})[i]))"
        bits.append(f"CASE WHEN {dot} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    sig = "(" + " + ".join(bits) + ")"
    mask = (1 << bits_per_band) - 1
    t2 = float(threshold) * float(threshold)
    return f"""
WITH qvs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(x * {scale}, 0) AS BIGINT)) AS qv
  FROM embeddings
), sigs AS (
  SELECT vec_id, qv, {sig} AS sig,
         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
  FROM qvs
), banded AS (
  SELECT vec_id, qv, n2, b.band, (sig >> (b.band * {bits_per_band})) & {mask} AS bucket
  FROM sigs, (SELECT unnest(range(0, {bands})) AS band) b
), pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, a.qv AS va, a.n2 AS na,
                  b.vec_id AS vec_b, b.qv AS vb, b.n2 AS nb
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT vec_a, vec_b, na, nb,
         CAST(list_sum(list_transform(range(1, {dim} + 1), i -> va[i] * vb[i])) AS BIGINT) AS dot
  FROM pairs
)
SELECT vec_a, vec_b,
       CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cos2
FROM scored
WHERE dot > 0
  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE)
      >= {t2!r} * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
"""
