"""mkgmap_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
openstreetmap/mkgmap (reference at /root/reference) as an idiomatic PySpark
DataFrame program:

- interleaved text+media documents (doc_id, spans) are decoded to OSM-style
  features (nodes/ways/relations, int32 map-unit geometry) with pure
  DataFrame higher-order functions (no Python row path);
- features are cell-indexed with vectorized Arrow kernels, aggregated into
  bounded per-cell histograms, and assigned to Garmin-style tiles by a
  deterministic driver-side quadtree that reproduces mkgmap's MapSplitter
  semantics (MapSplitter.java:42-200, MapArea.java:223-338, Area.split:171);
- spatial joins (point-in-polygon, segment intersection, kNN) are cell-keyed
  equi-joins refined by numpy geometry kernels inside Arrow-batched UDFs;
- every stage can write per-partition lineage + metrics to a checkpoint
  table for resumability.

Package layout:
    mapunits    -- integer map-unit coordinate model (Coord.java semantics)
    functions/  -- vectorized numpy kernels + Spark Column helpers
    operators/  -- DataFrame operators (decode, tiling, joins, merges, dedup)
    fixtures/   -- deterministic synthetic data generators (seeded)
    rules/      -- the style-rule DSL compiler (RuleSet semantics)
    oracle/     -- independent single-threaded pure-Python reimplementations
                   used as golden oracles in tests
    plans/      -- end-to-end pipelines + checkpoint/lineage
    sources/    -- table catalog abstraction (parquet locally, Iceberg-ready)
    streaming/  -- structured-streaming ingest variants
"""

__version__ = "0.1.0"
