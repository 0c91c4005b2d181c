from hands_on_trino_iceberg_superset_spark.lakehouse.table import (
    Snapshot,
    VersionedTable,
)

__all__ = ["Snapshot", "VersionedTable"]
