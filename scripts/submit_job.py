"""Minimal spark-submit entry: run the flagship tile pipeline against a
documents corpus.  Imports mkgmap_spark from --py-files only (no repo
sys.path), proving the packaged artifact is self-contained.

    spark-submit --master local[8] --py-files dist/mkgmap_spark.zip \
        scripts/submit_job.py <corpus_dir_or_file> <out_dir>
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    corpus, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("mkgmap_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mkgmap_spark.plans.pipeline import build_tiles

    docs = spark.read.parquet(corpus)
    res = build_tiles(spark, docs, levels=((0, 24),), geometry_assign=True)
    res.tiles.write.mode("overwrite").parquet(f"{out_dir}/tiles")
    res.membership.write.mode("overwrite").parquet(f"{out_dir}/membership")
    print(json.dumps({"stats": res.stats, "n_members": spark.read.parquet(f"{out_dir}/membership").count()}))
    spark.stop()


if __name__ == "__main__":
    main()
