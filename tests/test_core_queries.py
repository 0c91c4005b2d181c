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
