"""Streaming ingest: incremental assignment equals the batch result,
and a second incremental batch only processes new files (exactly-once
via the stream checkpoint)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from mkgmap_spark.fixtures.bulk import write_bulk_corpus
from mkgmap_spark.operators import tiling
from mkgmap_spark.operators.decode import decode_documents
from mkgmap_spark.streaming.ingest import run_available_now, stream_assign


def test_stream_assign_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "stream_in")
    out_dir = str(tmp_path / "stream_out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    write_bulk_corpus(in_dir, 5000, seed=5, docs_per_file=2500)

    # tile index built from the seed corpus (batch)
    docs = spark.read.parquet(in_dir)
    feats = decode_documents(docs).filter(F.col("kind").isin("node", "way"))
    prepared = tiling.prepare_features(feats).select(
        "id", "kind_i", "ay", "ax", "size_bytes", "min_res"
    )
    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, 0)
    batch_members = {
        (r["id"], r["tile_id"])
        for r in tiling.assign_tiles(prepared, res.index, 24, 0).collect()
    }

    sdf = stream_assign(spark, in_dir, res.index)
    run_available_now(sdf, out_dir, ck_dir)
    got = {(r["id"], r["tile_id"]) for r in spark.read.parquet(out_dir).collect()}
    # streaming path has no overflow-slot window (stateless per batch):
    # compare on base tiles
    slots = {t.tile_id: t.n_slots for t in res.tiles}
    def base(t):
        while t > 0 and slots.get(t) is None:
            t -= 1
        return t
    batch_base = {(i, base(t)) for i, t in batch_members}
    assert got == batch_base

    # incremental: add one more file, drain again -> only new rows added
    n1 = spark.read.parquet(out_dir).count()
    extra_dir = str(tmp_path / "extra")
    write_bulk_corpus(extra_dir, 1000, seed=9, docs_per_file=1000)
    for f in os.listdir(extra_dir):
        shutil.copy(os.path.join(extra_dir, f), os.path.join(in_dir, "zz-" + f))
    run_available_now(stream_assign(spark, in_dir, res.index), out_dir, ck_dir)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 > n1
    assert n2 - n1 < 1001  # only the new file was processed
