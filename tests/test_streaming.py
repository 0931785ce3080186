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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup keeps one row per fingerprint across
    micro-batches (bounded state via the watermark)."""
    import os

    from mkgmap_spark.streaming.ingest import run_available_now, stream_dedup

    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    rows1 = [("d1", "same text", "2024-01-01 00:00:00"), ("d2", "same text", "2024-01-01 00:00:10"),
             ("d3", "other", "2024-01-01 00:00:20")]
    spark.createDataFrame(rows1, "doc_id string, text string, ts_s string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    ).drop("ts_s").write.parquet(src + "/batch1")
    stream = spark.readStream.schema("doc_id string, text string, ts timestamp").parquet(src + "/*")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_available_now(stream_dedup(stream), out, ck)
    got = spark.read.parquet(out)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["other", "same text"]


def test_stream_tile_monitor_state(spark, tmp_path):
    """The stateful per-tile counter accumulates ACROSS micro-batches
    and flags cap violations."""
    import os

    from mkgmap_spark.streaming.ingest import run_available_now_update, stream_tile_monitor

    src = str(tmp_path / "members_in")
    os.makedirs(src)
    # batch 1: tile 1 gets 200 members, tile 2 gets 3
    b1 = [(i, 1) for i in range(200)] + [(1000 + i, 2) for i in range(3)]
    spark.createDataFrame(b1, "id long, tile_id long").write.parquet(src + "/b1")
    stream = spark.readStream.schema("id long, tile_id long").parquet(src + "/*")
    out = str(tmp_path / "mon_out")
    ck = str(tmp_path / "mon_ck")
    run_available_now_update(stream_tile_monitor(stream, cap=255), out, ck)

    # batch 2 arrives later: tile 1 gets 100 more -> crosses the cap
    b2 = [(5000 + i, 1) for i in range(100)]
    spark.createDataFrame(b2, "id long, tile_id long").write.parquet(src + "/b2")
    stream2 = spark.readStream.schema("id long, tile_id long").parquet(src + "/*")
    run_available_now_update(stream_tile_monitor(stream2, cap=255), out, ck)

    got = spark.read.parquet(out)
    latest = {r["tile_id"]: r for r in got.orderBy("total").collect()}
    assert latest[1]["total"] == 300 and latest[1]["over_cap"]
    assert latest[2]["total"] == 3 and not latest[2]["over_cap"]
