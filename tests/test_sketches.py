"""Accuracy gates for the sketch aggregates (no DuckDB oracle):
bounded relative error against the exact aggregates."""

from __future__ import annotations

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.sources import load_table


def test_approx_distinct_within_error(spark, sf_dir) -> None:
    inv = load_all()
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in inv["approx_distinct_users"].spark(spark, sf_dir).collect():
        rel_err = abs(r.approx_users - exact[r.event_type]) / exact[r.event_type]
        assert rel_err < 0.05, (r.event_type, r.approx_users, exact[r.event_type])


def test_approx_percentiles_within_rank_error(spark, sf_dir) -> None:
    # Greenwald-Khanna guarantees bounded RANK error (the sketch
    # returns a real data point near the target rank), so the gate
    # brackets each estimate between exact percentiles +-2 rank points
    inv = load_all()
    ev = load_table(spark, sf_dir, "events")
    brackets = {}
    for r in (
        ev.groupBy("event_type")
        .agg(
            *[
                F.percentile("value", F.lit(p)).alias(f"b{i}")
                for i, p in enumerate(
                    (0.48, 0.52, 0.88, 0.92, 0.97, 1.0)
                )
            ]
        )
        .collect()
    ):
        brackets[r.event_type] = [
            (r.b0, r.b1), (r.b2, r.b3), (r.b4, r.b5)
        ]
    for r in inv["approx_value_percentiles"].spark(spark, sf_dir).collect():
        for got, (lo, hi) in zip((r.p50, r.p90, r.p99),
                                 brackets[r.event_type]):
            assert lo - 1e-9 <= got <= hi + 1e-9, (r.event_type, got, lo, hi)
