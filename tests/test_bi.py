"""BI layer: entities, introspection parity, form-data compiler, and
the reference's exact bootstrap shape (init_db.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.bi import (
    Chart,
    Database,
    compile_form_data,
)
from hands_on_trino_iceberg_superset_spark.bi.entities import reference_dashboard
from hands_on_trino_iceberg_superset_spark.engine import Engine
from hands_on_trino_iceberg_superset_spark.seed import seed_frames, seed_into_catalog


def test_reference_dashboard_bootstrap(spark) -> None:
    eng = Engine(spark)
    seed_into_catalog(spark, schema="demo_bi_test")
    eng.default_schema = "demo_bi_test"
    dash = reference_dashboard(eng)
    assert len(dash.charts) == 5
    # each chart runs and respects raw-mode row_limit
    for chart in dash.charts:
        rows = chart.run().collect()
        assert 0 < len(rows) <= 100
        assert list(chart.run().columns) == chart.form_data["all_columns"]
    # dataset introspection is get_columns-shaped
    cols = dash.charts[0].dataset.fetch_metadata()
    assert {c.name for c in cols} >= {"id", "ts", "event_type"}
    assert all(isinstance(c.nullable, bool) for c in cols)
    # layout: 5 charts -> 3 rows of <=2, reference constants
    pos = dash.position_json()
    grid_rows = pos["GRID_ID"]["children"]
    assert len(grid_rows) == 3
    assert pos["CHART-0"]["meta"]["width"] == 6
    assert pos["CHART-0"]["meta"]["height"] == 50


def test_compiler_agg_mode_adhoc_metrics(spark) -> None:
    users = seed_frames(spark)["users"]
    out = compile_form_data(
        users,
        {
            "query_mode": "aggregate",
            "groupby": ["country"],
            "metrics": [
                "count",
                {"aggregate": "COUNT_DISTINCT", "column": "user_id",
                 "label": "n_users"},
            ],
            "order_by": [["count", False]],
            "row_limit": 3,
        },
    )
    rows = out.collect()
    assert len(rows) == 3
    assert out.columns == ["country", "count", "n_users"]
    # counts descend
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_compiler_global_agg_without_groupby(spark) -> None:
    events = seed_frames(spark)["events"]
    out = compile_form_data(events, {"query_mode": "aggregate",
                                     "metrics": ["count"]})
    assert out.collect()[0]["count"] == 200


def test_compiler_time_range_halfopen(spark) -> None:
    events = seed_frames(spark)["events"]
    fd = {
        "query_mode": "aggregate",
        "metrics": ["count"],
        "granularity_sqla": "ts",
        "time_range": "2025-12-31 00:00:00 : 2026-01-01 00:00:00",
    }
    got = compile_form_data(events, fd).collect()[0]["count"]
    expect = events.filter(
        (F.col("ts") >= "2025-12-31") & (F.col("ts") < "2026-01-01")
    ).count()
    assert got == expect > 0
