"""Document deduplication operators (training-data pipeline ops).

Exact dedup is a hash groupBy.  Near-dup detection:

- MinHash + LSH: shingle -> 64 minhashes -> b bands of r rows ->
  band-bucket join -> candidate pairs -> exact Jaccard verify.
  Everything before the verify is JVM-side (xxhash64 on shingles via
  F.transform + F.aggregate for the per-permutation min).
- SimHash: 64-bit fingerprint from token hash bit-votes; near-dups =
  Hamming distance <= k via bucketed bands of the fingerprint.
- n-gram Jaccard: exact verification kernel (also used standalone for
  small candidate sets).

All operators take documents(doc_id, text) and are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# odd multipliers for the minhash permutation family (splitmix-style)
_MH_A = [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93]


def _shingles_col(text_col: str, k: int) -> F.Column:
    """k-word shingles as strings, JVM-side."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.expr(
            f"transform(sequence(1, size(split(trim(coalesce({text_col}, '')), '\\\\s+')) - {k} + 1),"
            f" i -> concat_ws(' ', slice(split(trim(coalesce({text_col}, '')), '\\\\s+'), i, {k})))"
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents; keeper = min id.
    (hash-groupBy; mkgmap analogue: coord dedup maps, MapBuilder.java:822)"""
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    return (
        docs.groupBy(fp.alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.collect_list(id_col).alias("member_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signature_col(shingles_expr: str, n_hashes: int = 64) -> F.Column:
    """Column form: array of n_hashes int64 minhashes over a shingles
    array expression.

    Each shingle string is hashed ONCE (one full xxhash64 pass over the
    bytes); permutation i then re-mixes the prehashed 8-byte long with
    xxhash64(h, seed=i) — O(1) per permutation instead of re-hashing
    the whole string 64 times (same prehash-once trick as simhash)."""
    pre = f"transform({shingles_expr}, s -> xxhash64(s))"
    return F.array(
        *[
            F.expr(
                f"aggregate({pre}, cast(9223372036854775807 as bigint),"
                f" (acc, v) -> least(acc, xxhash64(v, {i})))"
            )
            for i in range(n_hashes)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    n_hashes: int = 64,
) -> DataFrame:
    """doc -> array of n_hashes int64 minhashes, all JVM-side.
    The prehash array is materialized once per row so the 64
    permutation folds share it (no re-tokenization per permutation)."""
    sh = _shingles_col(text_col, shingle_k)
    d = docs.select(F.col(id_col).alias("doc_id"), sh.alias("_sh")).withColumn(
        "_pre", F.expr("transform(_sh, s -> xxhash64(s))")
    )
    sig = F.array(
        *[
            F.expr(
                f"aggregate(_pre, cast(9223372036854775807 as bigint),"
                f" (acc, v) -> least(acc, xxhash64(v, {i})))"
            )
            for i in range(n_hashes)
        ]
    )
    return d.select("doc_id", sig.alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band-bucket join -> distinct candidate pairs (doc_a < doc_b)."""
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> xxhash64(concat_ws(',', slice(signature, b * {rows_per_band} + 1, {rows_per_band})), b))"
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs (JVM set ops)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.array_distinct(_shingles_col(text_col, shingle_k)).alias("sh")
    )
    j = (
        candidates.join(sh.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def minhash_dedup(
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> verify."""
    sig = minhash_signatures(docs, text_col, id_col, shingle_k, n_hashes)
    cands = minhash_lsh_candidates(sig, bands, n_hashes // bands)
    return jaccard_verify(cands, docs, threshold, text_col, id_col, shingle_k)


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash fingerprint per doc, fully JVM-side.

    Token hash bit-votes: bit j of the fingerprint is 1 iff more token
    hashes have bit j set than not.
    """
    # hash each token ONCE, then 64 cheap bit-vote folds over the
    # prehashed array (rehashing per bit was 64x the hashing work)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"transform(split(trim(coalesce({text_col}, '')), '\\\\s+'), t -> xxhash64(t))"
        ).alias("_h"),
    )
    votes = [
        F.expr(
            f"aggregate(_h, 0, (acc, v) -> acc + cast(shiftright(v, {j}) & 1 as int) * 2 - 1)"
        )
        for j in range(64)
    ]
    fp = F.lit(0).cast("long")
    for j in range(64):
        bit = -(1 << 63) if j == 63 else (1 << j)
        fp = fp + F.when(votes[j] > 0, F.lit(bit).cast("long")).otherwise(F.lit(0).cast("long"))
    return d.select("doc_id", fp.alias("simhash"))


def simhash_near_dups(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance via band bucketing.

    Pigeonhole: a pair within distance d differs in at most d bands, so
    with ``bands = d + 1`` bands at least one band is identical — the
    band count is derived from ``max_hamming`` (recall would silently
    drop for d >= bands otherwise).  Output: (doc_a, doc_b, hamming)."""
    bands = max_hamming + 1
    if bands > 64:
        raise ValueError("max_hamming must be <= 63")
    width = 64 // bands
    cuts = [b * width for b in range(bands)]
    widths = [width] * (bands - 1) + [64 - cuts[-1]]  # last band takes the remainder
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), cuts[b]).bitwiseAND(
                        F.lit(-1 if widths[b] >= 64 else (1 << widths[b]) - 1).cast("long")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
