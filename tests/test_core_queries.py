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
    """The per-session table memos (queries/iceberg.py, queries/
    streaming.py) must evict entries keyed to stopped sessions on
    cache miss — a long-lived process otherwise accumulates
    VersionedTable objects pinned to dead SparkSessions."""
    from hands_on_trino_iceberg_superset_spark.queries import (
        iceberg as qiceberg,
    )
    from hands_on_trino_iceberg_superset_spark.queries import (
        streaming as qstreaming,
    )

    app = spark.sparkContext.applicationId
    # "orders" is the still-memoized fixture (the DML fixtures moved
    # to persisted per-corpus artifacts and no longer memoize)
    dead = ("app-long-gone", sf_dir, "orders")
    class _Dead:
        path = "/nonexistent"
    qiceberg._CACHE[dead] = _Dead()
    # force the miss branch even if an earlier test populated the
    # live entry (eviction runs on miss only)
    qiceberg._CACHE.pop((app, sf_dir, "orders"), None)
    INVENTORY["iceberg_register_scan"].spark(spark, sf_dir).collect()
    assert dead not in qiceberg._CACHE
    assert any(k[0] == app for k in qiceberg._CACHE)

    dead_s = ("app-long-gone", sf_dir, "stream_merge")
    qstreaming._MERGE_CACHE[dead_s] = None  # poisoned dead entry
    qstreaming._MERGE_CACHE.pop((app, sf_dir, "stream_merge"), None)
    INVENTORY["stream_merge_upsert"].spark(spark, sf_dir).collect()
    assert dead_s not in qstreaming._MERGE_CACHE
