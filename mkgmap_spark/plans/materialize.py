"""Central materialization seam for iterative/self-join intermediates.

Many operators must cut lineage and reuse an intermediate several
times (iterative label propagation, LSH self-joins, rule-ladder
outputs feeding dedup self-joins).  On local[N] the cheapest cut is
``localCheckpoint(eager=True)`` — but it pins blocks to EXECUTOR
STORAGE and does not survive executor loss, which is the wrong
trade-off on a real cluster at 100 TB (the round-3 review called this
out explicitly).  Every operator now funnels through ``materialize``,
which picks the mechanism from session conf:

- ``spark.mkgmap.materialize.mode = local`` (default): localCheckpoint
  — fastest on a single machine, blocks freed by bench/release or
  session end;
- ``spark.mkgmap.materialize.mode = table``: write the intermediate as
  a parquet table under ``spark.mkgmap.materialize.dir`` and read it
  back — fault-tolerant, storage-offloaded, the cluster-scale setting
  (pair with a TTL'd scratch location).

Results are identical either way; a differential pytest holds both
modes to the same output.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

MODE_CONF = "spark.mkgmap.materialize.mode"
DIR_CONF = "spark.mkgmap.materialize.dir"


def materialize(df: DataFrame, tag: str = "mat") -> DataFrame:
    """Cut lineage and materialize ``df`` per the session's
    materialization mode (see module docstring)."""
    spark = df.sparkSession
    mode = spark.conf.get(MODE_CONF, "local")
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "table":
        base = spark.conf.get(DIR_CONF, None)
        if not base:
            raise ValueError(
                f"{MODE_CONF}=table requires {DIR_CONF} to point at a scratch location"
            )
        path = f"{base.rstrip('/')}/{tag}-{uuid.uuid4().hex}"
        df.write.mode("errorifexists").parquet(path)
        return spark.read.parquet(path)
    raise ValueError(f"unknown materialization mode {mode!r} (local|table)")


def materialize_lazy(df: DataFrame, tag: str = "mat") -> DataFrame:
    """``materialize`` whose lineage cut piggybacks on the CALLER'S
    next action instead of running its own job.

    Iterative loops pair every lineage cut with a driver action (a
    termination test, a convergence sum); done separately that is two
    jobs per round.  In local mode a LAZY localCheckpoint persists the
    blocks as the first action computes them — the caller MUST run an
    action that scans every partition (count/agg-collect do; limit(1)
    does not) before deriving further frames.  Table mode stays eager
    (the parquet round-trip is the materialization)."""
    if df.sparkSession.conf.get(MODE_CONF, "local") == "local":
        return df.localCheckpoint(eager=False)
    return materialize(df, tag)


def materialize_counted(df: DataFrame, tag: str = "mat") -> tuple[DataFrame, int]:
    """``materialize`` that also returns the row count in the SAME job
    (see ``materialize_lazy``; the count is the block-persisting scan)."""
    d = materialize_lazy(df, tag)
    return d, d.count()
