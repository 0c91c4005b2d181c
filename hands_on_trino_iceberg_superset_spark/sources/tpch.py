"""Loaders for the driver testdata corpus (TESTDATA.md / FIXTURES.md §B).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Normalization contract (must mirror what DuckDB sees, because the
correctness gate hash-compares against a DuckDB oracle over the same
files):

- ``events.ts`` is physical parquet ``TIMESTAMP(NANOS)``. Spark cannot
  represent nanos; DuckDB *truncates* to µs on read. We read the
  column as raw ``BIGINT`` (``nanosAsLong``), keep it as ``ts_ns``,
  and derive ``ts = timestamp_micros(ts_ns div 1000)`` cast to
  ``TIMESTAMP_NTZ`` — bit-identical to DuckDB's µs value.
- everything else reads natively; ms-precision naive timestamps
  (orders/lineitem) come in as ``TIMESTAMP_NTZ`` via
  ``inferTimestampNTZ`` with session TZ pinned to UTC.

At 100 TB these would be partitioned/bucketed Iceberg tables rather
than single files; loaders keep the seam in one place so the storage
profile can change without touching operators.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.session import configure_runtime

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_events(df: DataFrame) -> DataFrame:
    """ts (ns-as-long) -> ts_ns BIGINT + ts TIMESTAMP_NTZ (µs truncation)."""
    if dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, not `/`: float division of ~1.7e18 ns rounds
        # to-nearest at double precision (off-by-1µs vs DuckDB's floor)
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
        )
    else:  # already a timestamp (e.g. re-written test fixture)
        df = df.withColumn(
            "ts_ns", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df.select(
        "event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props"
    )


#: (app_id, sf_dir, name) -> DataFrame. DataFrames are immutable
#: lineages, so reusing one across queries is safe; the cache saves a
#: parquet footer/schema read per load (~100ms x ~80 loads per
#: inventory run). Keyed by application id so a fresh session never
#: sees another session's plans.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalized per the module contract."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is None:
        # evict entries of other (stopped) sessions: they pin
        # DataFrames whose plans reference a dead JVM context and
        # would otherwise accumulate forever in long-lived processes
        for k in [k for k in _LOAD_CACHE if k[0] != key[0]]:
            del _LOAD_CACHE[k]
    if cached is not None:
        return cached
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    _LOAD_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames.

    View names match the DuckDB oracle's pre-registered views so the
    same SQL text can run on both engines.
    """
    frames: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
