"""The flagship pipeline: documents -> decode -> tile split -> assignment.

mkgmap equivalent: MapMaker.makeMap (main/MapMaker.java:50) ->
MapBuilder.makeMapAreas (build/MapBuilder.java:740-814) for each level of
the pyramid (LevelInfo.java:40 "0:24, 1:22, 2:20, 3:18, 4:16").

Spark shape per level:
  decode (codegen) -> prepare (codegen) -> [cache] ->
  bounded histogram aggregations (1 + #refinement-rounds jobs) ->
  driver quadtree -> broadcast tree -> vectorized assignment (1 Arrow UDF)

The features DataFrame is cached once and reused across all levels and
refinement rounds; nothing but bounded histograms is ever collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mapunits import DEFAULT_LEVELS, shift_for_resolution
from ..operators.decode import decode_documents
from ..operators import tiling


@dataclass
class TileBuildResult:
    tiles: DataFrame  # tile_id, level, bounds, counts
    membership: DataFrame  # id, level, tile_id, kind_i
    stats: list[dict]


def build_tiles(
    spark: SparkSession,
    documents: DataFrame,
    levels: tuple[tuple[int, int], ...] = DEFAULT_LEVELS,
    cache: bool = True,
) -> TileBuildResult:
    features = decode_documents(documents).filter(F.col("kind").isin("node", "way"))
    prepared = tiling.prepare_features(features).select(
        "id", "kind_i", "ay", "ax", "size_bytes", "min_res"
    )
    if cache:
        prepared = prepared.persist()

    all_tiles = None
    all_members = None
    stats = []
    for level, resolution in levels:
        shift = shift_for_resolution(resolution)
        lvl_df = prepared.filter(F.col("min_res") <= resolution)
        provider = tiling.SparkHistogramProvider(lvl_df)
        result = tiling.split_level(provider, shift, level=level)
        tiles_df = tiling.tiles_to_df(spark, result.tiles)
        members_df = tiling.assign_tiles(prepared, result.index, resolution, level)
        all_tiles = tiles_df if all_tiles is None else all_tiles.unionByName(tiles_df)
        all_members = members_df if all_members is None else all_members.unionByName(members_df)
        stats.append(
            {
                "level": level,
                "resolution": resolution,
                "n_tiles": len(result.tiles),
                "refine_rounds": result.refine_rounds,
                "cells_fetched": result.cells_fetched,
                "histogram_jobs": provider.jobs,
            }
        )
    return TileBuildResult(all_tiles, all_members, stats)
