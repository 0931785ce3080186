"""Sources: table catalog (parquet locally, Iceberg on a cluster)
plus real parsers for all four reference input formats — OSM XML,
O5M, PBF and Polish .mp — feeding one shared raw element table."""

from .catalog import Catalog, ParquetCatalog  # noqa: F401
from .o5m import read_o5m, resolve_way_coords  # noqa: F401
from .osm_xml import read_osm_xml  # noqa: F401
from .pbf import read_pbf  # noqa: F401
from .polish import read_polish  # noqa: F401
