"""The benched flagship job: documents parquet -> decode -> tile split
-> assignment -> parquet sinks.  Invoked in a fresh process per
parallelism level by scripts/scaling_bench.py so each run gets its own
JVM (no warm-cache bleed between cluster sizes).

    python -m mkgmap_spark.plans.bench_job --cpus 8 \
        --corpus /path/docs.parquet --out /tmp/out
"""

from __future__ import annotations

import argparse
import json

import pandas as pd
import os
import shutil
import sys
import tempfile
import time


def run(cpus: int, corpus: str, out_dir: str, shuffle_partitions: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from ..operators import tiling
    from ..operators.decode import decode_documents
    from ..session import get_spark

    spark = get_spark(
        app_name=f"bench_job_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions or cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
            # synthetic corpora are small on disk but CPU-heavy to
            # decode: cap split size so the scan fans out to all cores
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    from .checkpoint import CheckpointManager

    docs = spark.read.parquet(corpus)

    # Warm-up outside the measured window: JIT-compile the codegen'd
    # decode path and fork the Arrow python workers once.  A 100-TB job
    # runs for hours — steady-state throughput is the honest metric,
    # not the first 10 seconds of C2 compilation.
    warm = decode_documents(docs.limit(20_000))
    tiling.prepare_features(warm.filter(F.col("kind").isin("node", "way"))).select(
        "id", "kind_i", "ay", "ax", "size_bytes"
    ).write.mode("overwrite").parquet(f"{out_dir}/_warmup")

    @F.pandas_udf("long")
    def _warm_udf(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 100_000, 1, cpus).select(_warm_udf(F.col("id"))).count()

    t0 = time.perf_counter()
    ckpt = CheckpointManager(spark, f"{out_dir}/checkpoints", collect_partition_metrics=False)

    def _build_prepared() -> "F.DataFrame":
        features = decode_documents(docs).filter(F.col("kind").isin("node", "way"))
        return tiling.prepare_features(features).select(
            "id", "kind_i", "ay", "ax", "size_bytes", "min_res"
        )

    # checkpointed stage: later stages (histograms, assignment) re-scan
    # the columnar output instead of recomputing the decode
    prepared = ckpt.stage("prepared", _build_prepared, inputs=[corpus], coalesce=cpus * 2)
    n_features = prepared.count()
    t_decode = time.perf_counter()

    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, shift=0, level=0)
    t_split = time.perf_counter()

    members = tiling.assign_tiles(prepared, res.index, resolution=24, level=0)
    members.coalesce(cpus * 2).write.mode("overwrite").parquet(f"{out_dir}/membership")
    tiles_df = tiling.tiles_to_df(spark, res.tiles)
    tiles_df.write.mode("overwrite").parquet(f"{out_dir}/tiles")
    t_end = time.perf_counter()

    # corpus row count from parquet footers (no Spark job)
    import pyarrow.parquet as pq

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
        "t_split_s": round(t_split - t_decode, 3),
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
    out = args.out or tempfile.mkdtemp(prefix="bench_out_")
    try:
        print(json.dumps(run(args.cpus, args.corpus, out)))
    finally:
        if args.out is None:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
