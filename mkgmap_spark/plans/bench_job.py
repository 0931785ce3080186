"""The benched flagship job: the full north-star pipeline over the
interleaved documents corpus.

    documents.parquet
      -> decode spans -> prepared features           (checkpoint)
      -> doc features: span fingerprint, token stats,
         minhash signature                           (sink)
      -> PIP location join vs boundary lattice       (sink)
      -> histogram -> quadtree split -> assignment   (sinks)

Invoked in a fresh process per parallelism level by
scripts/scaling_bench.py so each run gets its own JVM.

    python -m mkgmap_spark.plans.bench_job --cpus 8 \
        --corpus /path/docs_dir --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd


def run(cpus: int, corpus: str, out_dir: str, shuffle_partitions: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from ..operators import tiling
    from ..operators.decode import decode_documents, span_sequence_fingerprint
    from ..operators.dedup import minhash_signatures
    from ..operators.pip_join import pip_join_broadcast
    from ..session import get_spark
    from .checkpoint import CheckpointManager

    spark = get_spark(
        app_name=f"bench_job_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # per-core memory parity across parallelism levels: a real
            # cluster scales executor memory with cores, so the scaling
            # protocol must too — a fixed total heap hands the wide leg
            # 1/4 the per-task memory and measures allocation/GC
            # starvation instead of scaling (measured ~10% on the wide
            # leg at local[32]).  Override with SPARK_GRAFT_DRIVER_MEM.
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", f"{max(8, 2 * cpus)}g"
            ),
            # synthetic corpora are small on disk but CPU-heavy to
            # decode: cap split size so the scan fans out to all cores
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    docs = spark.read.parquet(corpus)

    # boundary lattice for the location join (deterministic, small)
    import pyarrow.parquet as pq

    from ..fixtures.generator import generate_boundaries

    bpath = f"{out_dir}/boundaries.parquet"
    pq.write_table(generate_boundaries(k=6, seed=43), bpath)
    boundaries = spark.read.parquet(bpath)

    from ..operators.dedup import minhash_signature_from_prehash

    def doc_features(d):
        """span fingerprint, token stats, 32-hash minhash signature —
        JVM-side projections, no joins.  The shingle prehash is
        materialized as its own column so the 32 permutation folds
        share one xxhash64 pass (HOFs get no codegen subexpression
        elimination; ~15% faster than inlining, measured A/B)."""
        text_col = F.expr(
            "array_join(transform(filter(spans, s -> s.kind = 'text'), s -> s.text), ' ')"
        )
        span_seq = F.expr(
            "array_join(transform("
            "  sort_array(transform(spans, s -> struct(s.offset as o,"
            "    concat_ws('\\u0001', s.kind, coalesce(s.text, ''), coalesce(s.media_ref, '')) as v))),"
            "  p -> p.v), '\\u0002')"
        )
        # tokens materialize as their own column for the same reason as
        # the prehash: the shingle lambda would otherwise re-split the
        # whole text once PER SHINGLE (O(tokens^2) per doc — split is
        # non-cheap, so CollapseProject keeps the alias shared).
        # Shingle identity is then the xxhash64-combine of THREE
        # CONSECUTIVE TOKEN HASHES, never a materialized shingle
        # string: building the 3-word strings allocates ~3x the text
        # per doc and turns the stage memory-bandwidth/GC-bound — at
        # local[16] the string variant ran 67s vs 23s for the hash
        # combine on the 4M-doc corpus (scaling eff 0.47 -> ~1.0),
        # identical dedup power (minhash only needs a deterministic
        # shingle fingerprint).
        doc_text = d.select(
            "doc_id",
            F.md5(span_seq).alias("span_fp"),
            text_col.alias("text"),
        ).select(
            "doc_id",
            "span_fp",
            "text",
            F.split(F.trim("text"), r"\s+").alias("_toks"),
        ).select(
            "doc_id",
            "span_fp",
            F.when(F.length(F.trim("text")) == 0, 0)
            .otherwise(F.size("_toks"))
            .cast("long")
            .alias("n_tokens"),
            F.expr("transform(_toks, t -> xxhash64(t))").alias("_th"),
            "text",
        )
        return doc_text.withColumn(
            "_pre",
            F.expr(
                "case when size(_th) < 3 then array(xxhash64(text)) "
                "else transform(sequence(0, size(_th) - 3),"
                " i -> xxhash64(_th[i], _th[i+1], _th[i+2])) end"
            ),
        ).select(
            "doc_id", "span_fp", "n_tokens",
            minhash_signature_from_prehash("_pre", 32).alias("signature"),
        )

    # Warm-up outside the measured window: JIT-compile the codegen'd
    # paths of EVERY stage (decode, the doc-features projection incl.
    # the 32-hash minhash expressions, the PIP match kernel) and fork
    # the Arrow python workers once.  A 100-TB job runs for hours —
    # steady-state throughput is the honest metric, not the first 30
    # seconds of C2/analysis: measured floors at 100k docs were
    # ~23s (doc features) and ~7.7s (pip) of size-independent cost.
    warm = decode_documents(docs.limit(20_000))
    warm_prep = tiling.prepare_features(
        warm.filter(F.col("kind").isin("node", "way"))
    ).select("id", "kind_i", "ay", "ax", "size_bytes")
    warm_prep.write.mode("overwrite").parquet(f"{out_dir}/_warmup")
    doc_features(docs.limit(20_000)).write.mode("overwrite").parquet(
        f"{out_dir}/_warmup_docfeat"
    )
    pip_join_broadcast(
        warm_prep.filter(F.col("kind_i") == tiling.POINT_KIND)
        .withColumn("min_res", F.lit(24)),
        boundaries,
        gshift=17,
    ).count()

    @F.pandas_udf("long")
    def _warm_udf(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 100_000, 1, cpus).select(_warm_udf(F.col("id"))).count()

    t0 = time.perf_counter()
    ckpt = CheckpointManager(spark, f"{out_dir}/checkpoints", collect_partition_metrics=False)

    def _build_prepared():
        features = decode_documents(docs).filter(F.col("kind").isin("node", "way"))
        return tiling.prepare_features(features).select(
            "id", "kind_i", "ay", "ax", "size_bytes", "min_res"
        )

    # checkpointed stage: later stages re-scan columnar output instead
    # of recomputing the decode
    prepared = ckpt.stage("prepared", _build_prepared, inputs=[corpus], coalesce=cpus * 2)
    n_features = prepared.count()  # metadata-only over the checkpoint
    t_decode = time.perf_counter()

    # doc-features pass: span-sequence fingerprint (the per-row
    # invariant artifact), token stats over text spans, 32-hash minhash
    # signature — one projection, one sink, no joins
    feats_out = doc_features(docs)
    feats_out.coalesce(cpus * 2).write.mode("overwrite").parquet(f"{out_dir}/doc_features")
    t_docfeat = time.perf_counter()

    # the remaining stages (PIP probe, one histogram aggregation per
    # quadtree refine round, the assignment join) all re-scan
    # `prepared`.  Deliberately NOT .persist()ed: the checkpoint is a
    # narrow 6-column parquet whose scans are pruned+vectorized, and a
    # measured A/B at 16M docs put the cached-relation variant 8x
    # SLOWER on the histogram rounds (112.9s vs 13.6s split stage) —
    # the in-memory columnar scan beats parquet only when the scan
    # itself dominates, which it does not here.

    # location join (LocationHook): nodes vs the boundary lattice
    pts = prepared.filter(F.col("kind_i") == tiling.POINT_KIND)
    located = pip_join_broadcast(pts, boundaries, gshift=17)
    located.coalesce(cpus).write.mode("overwrite").parquet(f"{out_dir}/located")
    t_pip = time.perf_counter()

    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, shift=0, level=0)
    t_split = time.perf_counter()

    members = tiling.assign_tiles(prepared, res.index, resolution=24, level=0)
    members.coalesce(cpus * 2).write.mode("overwrite").parquet(f"{out_dir}/membership")
    tiles_df = tiling.tiles_to_df(spark, res.tiles)
    tiles_df.write.mode("overwrite").parquet(f"{out_dir}/tiles")
    t_end = time.perf_counter()

    if os.path.isdir(corpus):
        n_docs = sum(
            pq.ParquetFile(os.path.join(corpus, f)).metadata.num_rows
            for f in os.listdir(corpus)
            if f.endswith(".parquet")
        )
    else:
        n_docs = pq.ParquetFile(corpus).metadata.num_rows
    wall = t_end - t0
    result = {
        "cpus": cpus,
        "n_docs": n_docs,
        "n_features": n_features,
        "n_tiles": len(res.tiles),
        "refine_rounds": res.refine_rounds,
        "t_decode_s": round(t_decode - t0, 3),
        "t_docfeat_s": round(t_docfeat - t_decode, 3),
        "t_pip_s": round(t_pip - t_docfeat, 3),
        "t_split_s": round(t_split - t_pip, 3),
        "t_assign_write_s": round(t_end - t_split, 3),
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "tiles_per_sec": round(len(res.tiles) / wall, 1),
    }
    spark.stop()
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    # scratch on tmpfs when available: the measured job writes several
    # GB of sinks, and on a shared single-disk host the writeback flush
    # of one leg's output contaminates the NEXT leg's wall (observed as
    # multi-minute load-average tails with zero running processes).
    # RAM-backed scratch removes that cross-leg coupling; on a real
    # cluster the sinks are a distributed store, not one local disk.
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = args.out or tempfile.mkdtemp(prefix="bench_out_", dir=shm)
    os.makedirs(out, exist_ok=True)
    try:
        print(json.dumps(run(args.cpus, args.corpus, out)))
    finally:
        if args.out is None:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
