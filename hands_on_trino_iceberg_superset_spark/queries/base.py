"""Query-inventory registry.

Every operator/query from SURVEY.md §2 (plus the north-star
extensions) registers here as a :class:`QuerySpec`:

- ``spark``  -- ``(SparkSession, sf_dir) -> DataFrame``, the
  Spark-first implementation (DataFrame API, Catalyst-optimizable).
- ``oracle`` -- equivalent ANSI SQL runnable by DuckDB over the same
  parquet views (``None`` for genuinely non-SQL-expressible ops;
  the driver then records a weaker rows-only check).

Column names are part of the contract: the driver sorts columns by
name before value-hashing, so both sides alias every computed column
identically.

Determinism contract for float outputs: aggregate in DECIMAL (exact),
cast the result to DOUBLE — identical bits on both engines regardless
of partial-aggregation order. Raw double sums are never emitted.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a Spark query implementation to the inventory."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _last_driver_check() -> dict[str, int]:
    """query name -> last round it appeared in a driver CORRECTNESS
    snapshot (0 = never), read from the ``CORRECTNESS_r*.json`` files
    the driver leaves at the repo root. Missing/any-error -> {}."""
    import json
    import re
    from pathlib import Path

    seen: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    try:
        for f in sorted(root.glob("CORRECTNESS_r*.json")):
            m = re.search(r"r(\d+)", f.name)
            if not m:
                continue
            rnd = int(m.group(1))
            for name in json.loads(f.read_text()):
                seen[name] = max(seen.get(name, 0), rnd)
    except Exception:
        return {}
    return seen


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and
    return the full inventory.

    Ordering is DELIBERATE, not alphabetical: the driver's
    CORRECTNESS snapshot records at most the first ~50 inventory
    entries, so queries rotate by least-recently-driver-checked —
    never-checked queries first, then oldest snapshot round first
    (ties keep a stable family grouping). Every round this cycles the
    unchecked tail into the driver's window; the full inventory is
    always covered by the local DuckDB differential
    (tools/check_correctness.py) regardless.
    """
    from hands_on_trino_iceberg_superset_spark.queries import (  # noqa: F401
        bi,
        core,
        curation,
        dedup,
        dml,
        events,
        iceberg,
        multimodal,
        reference,
        scale,
        similarity,
        sketches,
        sourcefmt,
        streaming,
        text,
        tpch_extra,
        tpch_global,
        wire,
    )

    family_order = ["tpch_global", "iceberg", "curation", "sourcefmt", "text",
                    "streaming", "tpch_extra",
                    "sketches", "wire", "scale", "dedup", "dml", "similarity",
                    "multimodal", "events", "core", "reference", "bi"]
    module_of = {name: spec.spark.__module__.rsplit(".", 1)[-1]
                 for name, spec in REGISTRY.items()}
    rank = {m: i for i, m in enumerate(family_order)}
    last_seen = _last_driver_check()
    ordered = sorted(
        REGISTRY,
        key=lambda name: (
            last_seen.get(name, 0),
            rank.get(module_of[name], 99),
        ),
    )
    return {name: REGISTRY[name] for name in ordered}
