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
