from hands_on_trino_iceberg_superset_spark.queries.base import (
    REGISTRY,
    QuerySpec,
    load_all,
    register,
)

__all__ = ["REGISTRY", "QuerySpec", "load_all", "register"]
