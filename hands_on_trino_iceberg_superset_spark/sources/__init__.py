from hands_on_trino_iceberg_superset_spark.sources.tpch import (
    TABLES,
    load_table,
    register_views,
)

__all__ = ["TABLES", "load_table", "register_views"]
