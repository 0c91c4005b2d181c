"""Differential tests: every inventory query with an oracle must
match DuckDB on the smoke-scale corpus (the driver repeats this at
sf0.01; tests stay fast at sf0.001)."""

from __future__ import annotations

import pytest

from hands_on_trino_iceberg_superset_spark.oracle import compare
from hands_on_trino_iceberg_superset_spark.queries import load_all

INVENTORY = load_all()


@pytest.mark.parametrize("name", sorted(INVENTORY))
def test_query_matches_oracle(name: str, spark, sf_dir: str) -> None:
    res = compare(INVENTORY[name], spark, sf_dir)
    assert res.ok, f"{name}: {res.detail}"


def test_inventory_nonempty() -> None:
    assert len(INVENTORY) >= 15


def test_every_oracle_names_are_subset() -> None:
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(INVENTORY)


def test_memo_caches_evict_dead_sessions(spark, sf_dir: str) -> None:
    """The per-session table memos (queries/dml.py, queries/
    streaming.py) must evict entries keyed to stopped sessions on
    cache miss — a long-lived process otherwise accumulates
    VersionedTable objects pinned to dead SparkSessions."""
    from hands_on_trino_iceberg_superset_spark.queries import dml
    from hands_on_trino_iceberg_superset_spark.queries import (
        streaming as qstreaming,
    )

    app = spark.sparkContext.applicationId
    # "delete" is a still-memoized fixture (dml_merge_upsert moved
    # to a persisted per-corpus artifact and no longer memoizes)
    dead = ("app-long-gone", sf_dir, "delete")
    dml._CACHE[dead] = object()
    # force the miss branch even if an earlier test populated the
    # live entry (eviction runs on miss only)
    dml._CACHE.pop((app, sf_dir, "delete"), None)
    INVENTORY["dml_delete_time_travel"].spark(spark, sf_dir).collect()
    assert dead not in dml._CACHE
    assert any(k[0] == app for k in dml._CACHE)

    dead_s = ("app-long-gone", sf_dir, "stream_merge")
    qstreaming._MERGE_CACHE[dead_s] = None  # poisoned dead entry
    qstreaming._MERGE_CACHE.pop((app, sf_dir, "stream_merge"), None)
    INVENTORY["stream_merge_upsert"].spark(spark, sf_dir).collect()
    assert dead_s not in qstreaming._MERGE_CACHE
