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

from ..plans.materialize import materialize

# odd multipliers for the minhash permutation family (splitmix-style)
_MH_A = [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93]


def _tokens_col(text_col: str) -> F.Column:
    return F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")


def _shingles_from_tokens(toks: str, k: int) -> F.Column:
    """k-word shingles over a PRECOMPUTED tokens column.  (Building
    them straight off the text would re-split the whole string inside
    the per-shingle lambda — O(tokens^2) per document.)"""
    return F.expr(
        f"if(size({toks}) < {k}, array(concat_ws(' ', {toks})), "
        f"transform(sequence(1, size({toks}) - {k} + 1),"
        f" i -> concat_ws(' ', slice({toks}, i, {k}))))"
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


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard via a shingle inverted index —
    the non-approximate sibling of minhash_dedup.

    Any pair with jaccard > 0 shares at least one distinct shingle, so
    the inverted-index candidate join has total recall for every
    threshold > 0; |A∩B| is the per-pair shared-shingle count (one
    aggregation), |A∪B| = |A| + |B| − |A∩B| from per-doc sizes.  Every
    step is an equi-join or aggregation on a shingle / pair key
    (AQE-skew-splittable) — never an all-pairs product.

    ``max_df`` (scale knob): drop shingles occurring in more than
    max_df documents.  A stop-shingle appearing in f docs creates
    O(f^2) candidate pairs; capping df bounds the blowup at the price
    of underestimating Jaccard for pairs ONLY connected by
    stop-shingles.  Leave None for exact results (the oracled
    setting).

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("_toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(_shingles_from_tokens("_toks", shingle_k))
            ).alias("shingle"),
        )
    )
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(df_counts.filter(F.col("_df") <= max_df).select("shingle"), "shingle")
    # used three times (sizes + both join sides): materialize once
    sh = sh.transform(materialize)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "n_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_oracle_sql(threshold: float = 0.5, shingle_k: int = 3) -> str:
    """DuckDB twin of ngram_jaccard_pairs over the documents view."""
    k = shingle_k
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(COALESCE(text, '')), '\\s+') AS t FROM documents
), sh0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < {k} THEN [array_to_string(t, ' ')]
              ELSE list_transform(range(1, len(t) - {k} + 2),
                                  i -> array_to_string(t[i:i+{k - 1}], ' ')) END AS shingles
  FROM toks
), sh AS (
  SELECT doc_id, unnest(list_distinct(shingles)) AS shingle FROM sh0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), j AS (
  SELECT doc_a, doc_b,
         CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


def minhash_signature_col(shingles_expr: str, n_hashes: int = 64) -> F.Column:
    """Column form: array of n_hashes int64 minhashes over a shingles
    array expression.

    CAVEAT: the prehash ``transform`` is textually inlined into every
    permutation's aggregate — higher-order functions get no codegen
    subexpression elimination, so the shingle hashing runs n_hashes
    times.  In any hot path, materialize the prehash as its own column
    (``withColumn("_pre", transform(sh, s -> xxhash64(s)))`` — a
    non-cheap alias used n times survives CollapseProject) and use
    ``minhash_signature_from_prehash``; measured ~15% faster for the
    flagship doc-features stage at n_hashes=32."""
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


def minhash_signature_from_prehash(pre_expr: str, n_hashes: int = 64) -> F.Column:
    """Minhash signature over an ALREADY-prehashed array<bigint> column
    (each element = xxhash64 of one shingle).  Permutation i re-mixes
    each 8-byte prehash with xxhash64(h, seed=i) — O(1) per permutation
    (MinHashLSH semantics; same prehash-once trick as simhash)."""
    return F.array(
        *[
            F.expr(
                f"aggregate({pre_expr}, cast(9223372036854775807 as bigint),"
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
    d = (
        docs.select(F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("_toks"))
        .withColumn("_sh", _shingles_from_tokens("_toks", shingle_k))
        .withColumn("_pre", F.expr("transform(_sh, s -> xxhash64(s))"))
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
    # self-join below: materialize so the signature pipeline runs once
    signatures = signatures.transform(materialize)
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
        F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("_toks")
    ).select(
        "doc_id", F.array_distinct(_shingles_from_tokens("_toks", shingle_k)).alias("sh")
    )
    # joined twice (a and b side) — compute the shingle sets once
    sh = sh.transform(materialize)
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


# ---------------------------------------------------------------------
# Deterministic (oracle-able) variants: the same LSH shapes with a
# base hash (md5 prefix) and permutation family (linear int mixes)
# that ANSI SQL engines can reproduce exactly — these back the driver
# correctness gate, while the xxhash64 paths above stay the fast
# defaults.  Permutation params come from one shared PRNG so the SQL
# builder and the Spark expression are generated from the SAME values.
# ---------------------------------------------------------------------

MD5_PREFIX_SQL_SPARK = "cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)"
MD5_PREFIX_SQL_DUCK = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def mh_params(n: int, seed: int = 0x5EED) -> list[tuple[int, int, int]]:
    """n (A, B, C) linear-mix params, all < 2^30 so A*(h & 2^32-1) +
    B*(h >> 32) + C never overflows int64 for 60-bit base hashes."""
    import random as _random

    rng = _random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30) | 1, rng.randrange(1, 1 << 30) | 1, rng.randrange(1 << 30))
        for _ in range(n)
    ]


def _perm_sql(a: int, b: int, c: int, v: str) -> str:
    return f"({a} * ({v} & 4294967295) + {b} * ({v} >> 32) + {c})"


def minhash_pairs_md5(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with the deterministic md5-prefix
    base hash and linear permutations — same distributed shape as
    minhash_dedup (banded bucket equi-join -> exact Jaccard verify),
    reproducible in DuckDB for the driver oracle.
    Output: (doc_a, doc_b, jaccard)."""
    rows = n_hashes // bands
    params = mh_params(n_hashes)
    base = MD5_PREFIX_SQL_SPARK.format(s="s")
    d = (
        docs.select(F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("_toks"))
        .withColumn("_sh", _shingles_from_tokens("_toks", shingle_k))
        .withColumn("_pre", F.expr(f"transform(_sh, s -> {base})"))
    )
    # the n_hashes permutation minima as ONE vectorized Arrow kernel
    # over the JVM-computed prehash (guide §4.2): the per-permutation
    # aggregate() folds are interpreted lambdas with no subexpression
    # sharing, n_hashes passes over every prehash array; numpy does the
    # (shingles x permutations) broadcast in one pass.  Exact-int64
    # equivalence: A/B/C are bounded so no term overflows for 60-bit
    # prehashes — the values match the SQL fold bit-for-bit.
    A = np.asarray([p[0] for p in params], dtype=np.int64)
    B = np.asarray([p[1] for p in params], dtype=np.int64)
    C = np.asarray([p[2] for p in params], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sig_udf(pre: pd.Series) -> pd.Series:
        sentinel = np.full(len(A), np.iinfo(np.int64).max, dtype=np.int64)
        out = []
        for arr in pre:
            h = np.asarray(arr, dtype=np.int64)
            if len(h) == 0:  # fold identity, matching the SQL sentinel
                out.append(sentinel)
                continue
            lo = h & np.int64(0xFFFFFFFF)
            hi = h >> np.int64(32)
            m = (lo[:, None] * A[None, :] + hi[:, None] * B[None, :] + C[None, :]).min(axis=0)
            out.append(m)
        return pd.Series(out)

    sigs = d.select(
        "doc_id", F.array_distinct("_sh").alias("_shd"), _sig_udf("_pre").alias("signature")
    )
    # banded self-joins below: materialize once or the shingle+md5+
    # signature pipeline (the expensive part) runs for BOTH join sides
    sigs = sigs.transform(materialize)
    # the band join + pair dedup only decide WHICH id pairs are
    # candidates: ship doc ids, not the shingle arrays (guide §8);
    # shingle sets re-attach afterwards from the materialized sigs
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"concat_ws(',', transform(slice(signature, b * {rows} + 1, {rows}), x -> cast(x as string))))"
            )
        ).alias("band", "bucket"),
    )
    a_side = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b_side = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand_ids = (
        a_side.join(b_side, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cands = cand_ids.join(
        sigs.select(F.col("doc_id").alias("doc_a"), F.col("_shd").alias("sh_a")), "doc_a"
    ).join(
        sigs.select(F.col("doc_id").alias("doc_b"), F.col("_shd").alias("sh_b")), "doc_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.withColumn("jaccard", inter.cast("double") / uni)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_pairs_md5_oracle_sql(
    threshold: float = 0.5, shingle_k: int = 3, n_hashes: int = 16, bands: int = 4
) -> str:
    """DuckDB equivalent of minhash_pairs_md5 over the documents view."""
    rows = n_hashes // bands
    params = mh_params(n_hashes)
    base = MD5_PREFIX_SQL_DUCK.format(s="s")
    k = shingle_k
    mins = ",\n       ".join(
        f"list_min(list_transform(pre, v -> {_perm_sql(a, b, c, 'v')})) AS m{i}"
        for i, (a, b, c) in enumerate(params)
    )
    sig_arr = "[" + ", ".join(f"m{i}" for i in range(n_hashes)) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(COALESCE(text, '')), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) < {k} THEN [array_to_string(t, ' ')]
              ELSE list_transform(range(1, len(t) - {k} + 2),
                                  i -> array_to_string(t[i:i+{k - 1}], ' ')) END AS shingles
  FROM toks
), pre AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {base}) AS pre
  FROM sh
), sigs AS (
  SELECT doc_id, list_distinct(shingles) AS shd, {mins}
  FROM pre
), banded AS (
  SELECT doc_id, shd, b.band,
         array_to_string(({sig_arr})[b.band * {rows} + 1 : b.band * {rows} + {rows}], ',') AS bucket
  FROM sigs, (SELECT unnest(range(0, {bands})) AS band) b
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.shd AS sh_a, b.shd AS sh_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
), j AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
         (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))) AS jaccard
  FROM cands
)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


def _bitvote_udf(n_bits: int):
    """Vectorized SimHash bit-vote kernel over JVM-prehashed token
    arrays.  The pure-SQL form folds the token array once PER BIT
    (n_bits interpreted lambda walks per doc — measured ~60x the
    hashing cost); here one Arrow crossing ships the int64 hashes and
    numpy does per-bit segment sums (np.add.reduceat over the
    flattened batch), integer-exact so the SQL oracles still match."""

    @F.pandas_udf("long")
    def kernel(h: pd.Series) -> pd.Series:
        n = len(h)
        if n == 0:
            return pd.Series([], dtype="int64")
        arrs = [np.asarray(x, dtype=np.int64) for x in h]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        out = np.zeros(n, dtype=np.uint64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate([a for a in arrs if len(a)]).view(np.uint64)
            starts = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            fps = np.zeros(int(nz.sum()), dtype=np.uint64)
            for j in range(n_bits):
                bit = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int32)
                votes = np.add.reduceat(2 * bit - 1, starts)
                fps |= (votes > 0).astype(np.uint64) << np.uint64(j)
            out[nz] = fps
        return pd.Series(out.view(np.int64))

    return kernel


def simhash_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_bits: int = 60
) -> DataFrame:
    """SimHash over the deterministic 60-bit md5-prefix token hash
    (SQL-reproducible variant of simhash())."""
    base = MD5_PREFIX_SQL_SPARK.format(s="t")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"transform(split(trim(coalesce({text_col}, '')), '\\\\s+'), t -> {base})").alias("_h"),
    )
    return d.select("doc_id", _bitvote_udf(n_bits)(F.col("_h")).alias("simhash"))


def simhash_md5_oracle_sql(max_hamming: int = 3, n_bits: int = 60) -> str:
    """DuckDB brute-force equivalent of simhash_md5 +
    simhash_near_dups: the band join is recall-lossless (pigeonhole
    with bands = max_hamming + 1), so hamming <= d over all pairs IS
    the reference answer."""
    base = MD5_PREFIX_SQL_DUCK.format(s="t")
    votes = ",\n       ".join(
        f"list_sum(list_transform(h, v -> CASE WHEN (v >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) AS v{j}"
        for j in range(n_bits)
    )
    fp = " + ".join(f"CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(n_bits))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(COALESCE(text, '')), '\\s+') AS t FROM documents
), hashes AS (
  SELECT doc_id, list_transform(t, t -> {base}) AS h FROM toks
), votes AS (
  SELECT doc_id, {votes} FROM hashes
), fps AS (
  SELECT doc_id, ({fp}) AS fp FROM votes
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
FROM fps a JOIN fps b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash fingerprint per doc, fully JVM-side.

    Token hash bit-votes: bit j of the fingerprint is 1 iff more token
    hashes have bit j set than not.
    """
    # hash each token ONCE (JVM xxhash64), then one Arrow pass does
    # all 64 bit votes vectorized (the per-bit aggregate() fold walked
    # the array 64 times in interpreted lambdas)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"transform(split(trim(coalesce({text_col}, '')), '\\\\s+'), t -> xxhash64(t))"
        ).alias("_h"),
    )
    return d.select("doc_id", _bitvote_udf(64)(F.col("_h")).alias("simhash"))


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
    # the band join is a SELF-join: without materializing, both sides
    # re-run the upstream fingerprint computation (token hashing is
    # the expensive part).  The fingerprint table is 2 narrow columns
    # per doc — tiny next to the corpus it came from.
    fps = fps.transform(materialize)
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
