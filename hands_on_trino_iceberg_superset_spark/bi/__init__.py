from hands_on_trino_iceberg_superset_spark.bi.compiler import compile_form_data
from hands_on_trino_iceberg_superset_spark.bi.entities import (
    Chart,
    Dashboard,
    Database,
    Dataset,
)

__all__ = ["Chart", "Dashboard", "Database", "Dataset", "compile_form_data"]
