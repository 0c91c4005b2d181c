from hands_on_trino_iceberg_superset_spark.seed.seeder import (
    DEFAULT_AS_OF,
    SEED_ROW_COUNTS,
    seed_frames,
    seed_into_catalog,
    verification_query,
)

__all__ = [
    "DEFAULT_AS_OF",
    "SEED_ROW_COUNTS",
    "seed_frames",
    "seed_into_catalog",
    "verification_query",
]
