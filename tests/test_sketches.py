"""Accuracy gates for the sketch aggregates: the inventory queries
emit driver-hash-checkable booleans (exact value + within-bound
flag); these tests assert the flags hold and re-derive the underlying
sketch accuracy directly."""

from __future__ import annotations

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.sources import load_table


def test_approx_distinct_gate_and_error(spark, sf_dir) -> None:
    inv = load_all()
    rows = inv["approx_distinct_users"].spark(spark, sf_dir).collect()
    assert rows and all(r.approx_within_2pct for r in rows), rows
    # re-derive the raw sketch error against the exact distinct count
    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: (r.approx, r.exact)
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    for et, (approx, exact) in got.items():
        assert abs(approx - exact) / exact < 0.05, (et, approx, exact)


def test_approx_percentiles_gate(spark, sf_dir) -> None:
    # Greenwald-Khanna guarantees bounded RANK error (the sketch
    # returns a real data point near the target rank); the inventory
    # query brackets each estimate between exact percentiles at
    # +-2 rank points and emits the verdicts as booleans
    inv = load_all()
    rows = inv["approx_value_percentiles"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_rank_ok and r.p90_rank_ok and r.p99_rank_ok, r
