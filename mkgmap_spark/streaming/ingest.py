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
