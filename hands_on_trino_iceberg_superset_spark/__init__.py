"""PySpark-native analytics engine with the capabilities of the
``damir-manapov/hands-on-trino-iceberg-superset`` lakehouse stack.

The reference (see SURVEY.md) is a Trino + Iceberg + Nessie + Superset
docker-compose tutorial; its capability surface is SQL DDL/DML over
cataloged Parquet tables plus a BI metadata layer. This package
re-expresses that surface Spark-first:

- ``engine.Engine``      -- session + catalog + SQL entry point
  (reference: Trino coordinator, compose/compose.yaml:109-127)
- ``seed``               -- deterministic seeder for the 5 reference
  tables (reference: compose/seed.sh:65-118)
- ``sources``            -- parquet table loaders for the driver
  testdata corpus (TESTDATA.md)
- ``queries``            -- the operator/query inventory (SURVEY.md §2)
  with DuckDB-oracle SQL for the correctness gate
- ``operators``          -- large-scale extensions: dedup, similarity
  search, text analysis, multimodal plumbing
- ``bi``                 -- Superset-shaped metadata + form-data
  compiler (reference: compose/superset/init_db.py)
- ``streaming``          -- Structured Streaming over the events table
"""

from hands_on_trino_iceberg_superset_spark.engine import Engine

__all__ = ["Engine"]
__version__ = "0.1.0"
