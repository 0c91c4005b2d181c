"""Sketch-based approximate aggregates — the 100 TB substitutes for
exact distinct-count and percentile (SURVEY.md §2.3 A8 extension).

HLL / KLL sketch estimates are implementation-specific, so these
register WITHOUT DuckDB oracles (driver records rows-only); the
accuracy gate lives in tests/test_sketches.py, which bounds the
relative error against the exact aggregates on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.sources import load_table


@register(
    "approx_distinct_users",
    oracle=None,  # HLL++ estimate; error-bounded in tests/test_sketches.py
    doc="approx_count_distinct (HyperLogLog++, rsd=0.5%) of users per "
        "event_type — mergeable constant-size sketch vs the exact "
        "shuffle-heavy COUNT(DISTINCT).",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.005).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_value_percentiles",
    oracle=None,  # sketch estimate; error-bounded in tests/test_sketches.py
    doc="approx_percentile of event value per event_type "
        "(Greenwald-Khanna, accuracy 10000) — single-pass mergeable "
        "quantiles vs the exact sort-based percentile.",
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    return ev.groupBy("event_type").agg(
        pct.getItem(0).alias("p50"),
        pct.getItem(1).alias("p90"),
        pct.getItem(2).alias("p99"),
        F.count(F.lit(1)).alias("n_events"),
    )
