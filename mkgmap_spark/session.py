"""SparkSession factory with the engine's standard configuration.

Tuned for correctness + scale-readiness: AQE on (runtime skew-join and
partition coalescing), Arrow enabled for the vectorized UDF kernels,
map-key dedup LAST_WIN (tag maps may repeat keys; mkgmap's Tags.put is
last-wins, reader/osm/Tags.java).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _apc(master: str) -> str:
    """local[N] should behave like an N-core executor host: cap the
    JVM's visible processor count so GC/netty pools size accordingly
    (otherwise a 32-core box gives local[4] 32 GC threads)."""
    import re

    m = re.fullmatch(r"local\[(\d+)\]", master or "")
    return f" -XX:ActiveProcessorCount={m.group(1)}" if m else ""


def get_spark(
    app_name: str = "mkgmap_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    cpus = os.cpu_count() or 8
    if shuffle_partitions is None:
        # match parallelism, not the 200 default — local mode shuffles
        # through driver disk, oversized partition counts only add overhead
        n = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(n) if n and n.isdigit() else cpus

    mem = (extra_conf or {}).get(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # fixed, pre-touched heap: a large lazily-committed heap causes
        # page-zeroing/THP-defrag stalls mid-job (measured 4-10x
        # slowdowns on allocation-heavy phases at high thread counts);
        # pre-touching moves that cost to session startup
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch -XX:+UseG1GC" + _apc(master),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
