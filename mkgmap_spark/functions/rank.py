"""Scale-safe global row numbering.

A bare ``row_number().over(Window.orderBy(...))`` has no partition
spec, so Spark moves the ENTIRE input to one task (WindowExec warns
"No Partition Defined").  Fine at sf0.1; at a 100-TB corpus a global
index is billions of rows on a single executor thread.

``global_rank`` re-expresses the same total order as an exclusive
scan, the classic distributed ranking pattern:

1. ``repartitionByRange`` on the order columns — partition p holds a
   contiguous key range ≤ partition p+1's (equal keys co-located);
2. freeze the partition assignment (``localCheckpoint``) so the count
   job and the rank job see identical partition ids;
3. count rows per partition (one tiny job, #partitions rows to the
   driver) and build cumulative offsets;
4. rank WITHIN each partition (``Window.partitionBy(pid)`` — every
   partition is its own task) and add the broadcast offset.

Result: identical values to the global window, but the largest single
task holds ~1/N of the data instead of all of it.

Reference parity: combiners/MdrBuilder.java assigns global record
numbers after a full collation sort; this is its distributed analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# materialize_lazy freezes the range-partition assignment for the
# two-job scan: the per-partition count collect is always the first
# action, so block persistence piggybacks on it (one job instead of
# eager-checkpoint + count), and the rank job then reads the same
# frozen partitions.
from ..plans.materialize import materialize_lazy as _freeze

_PID = "__gr_pid"


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based dense global row numbers ordered by ``order_cols``.

    ``order_cols`` must form a unique key — ties would make the rank
    nondeterministic under any distributed ordering (the global-window
    form has the same caveat, it just hides it on one task).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .transform(_freeze)
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in d.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if not counts:
        return df.withColumn(out, F.lit(None).cast("long"))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col(_PID),
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        d.withColumn(out, (F.row_number().over(w) + off).cast("long"))
        .drop(_PID)
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_cols`` order —
    the running-offset pattern (gmapsupp byte layout) without an
    unpartitioned window.  Same exclusive-scan shape as global_rank:
    range partition, per-partition running sum, broadcast partition
    totals as offsets."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    d = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .transform(_freeze)
    )
    totals = {
        r[_PID]: r["s"]
        for r in d.groupBy(_PID).agg(F.sum(value_col).alias("s")).collect()
    }
    if not totals:
        return df.withColumn(out, F.lit(None).cast("long"))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid] or 0)
    off = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col(_PID),
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn(out, (F.coalesce(F.sum(value_col).over(w), F.lit(0)) + off).cast("long"))
        .drop(_PID)
    )
