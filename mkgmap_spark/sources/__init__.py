"""Table catalog abstraction: parquet locally, Iceberg on a cluster."""

from .catalog import Catalog, ParquetCatalog  # noqa: F401
