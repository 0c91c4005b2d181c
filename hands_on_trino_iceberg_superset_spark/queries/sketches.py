"""Sketch-based approximate aggregates — the 100 TB substitutes for
exact distinct-count and percentile (SURVEY.md §2.3 A8 extension).

HLL / GK sketch estimates are implementation-specific, so the raw
estimates cannot be oracle-compared. Instead each query emits the
EXACT aggregate alongside a boolean asserting the sketch estimate is
within its documented error bound; the DuckDB oracle recomputes the
exact side and claims the boolean is TRUE. A sketch gone wrong flips
the boolean and the driver's value-hash catches it — a hard gate,
not rows-only. tests/test_sketches.py additionally bounds the
relative error numerically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.sources import load_table


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events,
           TRUE AS approx_within_2pct
    FROM events
    GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++, rsd=1%) of users per "
        "event_type — mergeable constant-size sketch vs the exact "
        "shuffle-heavy COUNT(DISTINCT). Emits the exact count plus an "
        "error-bound boolean (|approx-exact|/exact <= 2%) so the "
        "sketch is driver-hash-gated; HLL++ is deterministic, so the "
        "boolean is stable. Register sizing matters at scale: rsd "
        "halves cost 4x register memory per (group x partial agg) — "
        "rsd=1% (2^14 registers) fits the 2% gate with 4x less "
        "merge traffic than 0.5%.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # the sketch and the exact count are aggregated SEPARATELY and
    # joined on the (tiny) group key: mixing approx_count_distinct
    # with count(DISTINCT) in one agg makes Spark evaluate the HLL
    # partial over the per-(event_type, user_id) distinct expansion,
    # materializing the 2^14-register sketch buffer (1,639 LONG
    # words) once per DISTINCT PAIR — ~13 KB of aggregate state per
    # user instead of per group, gigabytes of hash-map at scale.
    # Split, the sketch state is one buffer per group per partition
    # and the merge is the same max-per-register fold, so the
    # estimate (and the gated boolean) is bit-identical (r14
    # optimization round; guide §2.3 shuffle-fewer-bytes).
    apx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
    )
    agg = apx.join(exact, "event_type")
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= 0.02 * F.col("exact_users")
    )
    return agg.select(
        "event_type", "exact_users", "n_events",
        within.alias("approx_within_2pct"),
    )


@register(
    "approx_value_percentiles",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok,
           TRUE AS p99_rank_ok
    FROM events
    GROUP BY event_type
    """,
    doc="approx_percentile of event value per event_type "
        "(Greenwald-Khanna, accuracy 10000) — single-pass mergeable "
        "quantiles vs the exact sort-based percentile. The gate is "
        "rank-based (GK's actual guarantee): each approx percentile "
        "must lie within the exact [p-2, p+2] percentile band — "
        "robust to nearest-rank-vs-interpolated discretization on "
        "small groups, where a value-relative bound false-alarms. "
        "Deterministic, so driver-hash-checkable.",
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    bounds = F.percentile(
        "value",
        F.array(*[F.lit(x) for x in (0.48, 0.52, 0.88, 0.92, 0.97, 1.0)]),
    )
    agg = ev.groupBy("event_type").agg(
        pct.alias("apx"), bounds.alias("bnd"),
        F.count(F.lit(1)).alias("n_events"),
    )

    def in_band(i: int, lo: int, hi: int) -> F.Column:
        a = F.col("apx").getItem(i)
        return (a >= F.col("bnd").getItem(lo)) & (a <= F.col("bnd").getItem(hi))

    return agg.select(
        "event_type",
        "n_events",
        in_band(0, 0, 1).alias("p50_rank_ok"),
        in_band(1, 2, 3).alias("p90_rank_ok"),
        in_band(2, 4, 5).alias("p99_rank_ok"),
    )
