"""Streaming ingest: incremental tile assignment over a document stream.

The reference is a batch compiler (no streams, SURVEY §2.8); the
engine's streaming story is the one a live map-update service needs:
the tile grid is built once from a seed corpus (or a previous run's
checkpoint), then incoming documents stream through decode ->
vectorized assignment against the *frozen* broadcast tile index, with
per-batch membership appended to the sink.  Late/new hot spots that
would force re-tiling are detected by monitoring per-tile counts
against the MapSplitter caps; a re-tile is a new batch build (the
resumable checkpoint pipeline), not a streaming mutation.

Spark shape: readStream (file source over the documents directory)
-> same decode/prepare Columns as batch -> pandas-UDF assignment
-> writeStream (parquet sink, checkpointed) or foreachBatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import tiling
from ..operators.decode import decode_documents
from ..operators.tiling import TileIndex


def stream_assign(
    spark: SparkSession,
    input_dir: str,
    index: TileIndex,
    resolution: int = 24,
    level: int = 0,
    schema: str | None = None,
) -> DataFrame:
    """Build the streaming DataFrame: documents dir -> membership rows.

    Returns an unstarted streaming DF; callers attach writeStream with
    their sink + checkpointLocation (see tests for the availableNow
    pattern)."""
    schema = schema or (
        "doc_id string, spans array<struct<kind: string, text: string, "
        "media_ref: string, offset: int>>"
    )
    docs = spark.readStream.schema(schema).parquet(input_dir)
    feats = decode_documents(docs).filter(F.col("kind").isin("node", "way"))
    prepared = tiling.prepare_features(feats).select(
        "id", "kind_i", "ay", "ax", "min_res"
    )
    part = prepared.filter(F.col("min_res") <= resolution)

    @F.pandas_udf("long")
    def tile_of(ay: pd.Series, ax: pd.Series) -> pd.Series:
        return pd.Series(index.assign(ay.to_numpy(np.int64), ax.to_numpy(np.int64)))

    return part.select(
        "id",
        "kind_i",
        F.lit(level).alias("level"),
        tile_of(F.col("ay"), F.col("ax")).alias("tile_id"),
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Drain everything currently available and stop (the batch-boundary
    trigger used for incremental catch-up runs)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup(docs_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each text
    fingerprint within the watermark window
    (dropDuplicatesWithinWatermark keeps bounded state — the streaming
    twin of operators/dedup.exact_dedup).  Requires an event-time
    column ``ts`` on the stream."""
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    return (
        docs_stream.withColumn("_fp", fp)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def run_available_now_update(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """availableNow drain for UPDATE-mode stateful streams: the file
    sink is append-only, so each micro-batch's updated rows append via
    foreachBatch (readers take the latest row per key)."""

    def write_batch(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


TILE_MONITOR_SCHEMA = "tile_id long, total long, over_cap boolean"
_TILE_STATE_SCHEMA = "total long"


def stream_tile_monitor(membership_stream: DataFrame, cap: int = 0xFF) -> DataFrame:
    """Custom stateful operator: per-tile running element counts over
    the membership stream, flagging tiles that exceed the MapSplitter
    cap (MAX_NUM_POINTS/MAX_NUM_LINES = 0xff) — the re-tile trigger the
    ingest docstring describes.  applyInPandasWithState keeps one
    bounded counter per tile (the custom-stateful pattern the engine
    uses where built-in aggregations can't express the semantics)."""

    def update(key, pdf_iter, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame(
            {"tile_id": [key[0]], "total": [total], "over_cap": [total > cap]}
        )

    return membership_stream.groupBy("tile_id").applyInPandasWithState(
        update,
        outputStructType=TILE_MONITOR_SCHEMA,
        stateStructType=_TILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
