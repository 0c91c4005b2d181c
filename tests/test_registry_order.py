"""Driver-window ordering: the ~50-query CORRECTNESS prefix must
surface (1) failed / never-oracle-verified records, (2) never-checked
queries, (3) green-but-code-changed-since queries, before green rows
on current code — so a fix or a new oracle is driver-verified the
very next round instead of aging out behind stale greens."""

from __future__ import annotations

from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.queries.base import (
    _changed_since_round,
    _check_failed,
    _last_driver_check,
    _module_closure,
)


def test_check_failed_flags():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 3, "oracle_rows": 3, "err": None}
    assert not _check_failed(ok, has_oracle=True)
    assert _check_failed({**ok, "hash_match": False}, has_oracle=True)
    assert _check_failed({**ok, "rows_match": False}, has_oracle=True)
    assert _check_failed({**ok, "err": "boom"}, has_oracle=True)
    # rows-only record for a query that HAS an oracle now: the oracle
    # was never driver-verified -> treat as needing a re-check
    rows_only = {"spark_rows": 5, "err": "no_oracle"}
    assert _check_failed(rows_only, has_oracle=True)
    # ...but for a genuinely oracle-less query a rows-only check that
    # produced rows is the strongest check the driver can do
    assert not _check_failed(rows_only, has_oracle=False)
    assert _check_failed({"spark_rows": None, "err": "no_oracle"},
                         has_oracle=False)


def test_module_closure_includes_self_and_imports():
    closure = _module_closure()
    text = closure["queries.text"]
    names = {p.name for p in text}
    assert "text.py" in names
    # queries/base.py is ordering infra imported by every module; it
    # must NOT be a dependency edge or one ordering tweak marks the
    # whole inventory changed
    assert "base.py" not in names


def test_changed_since_round_signature():
    changed = _changed_since_round()
    # unknown round / unknown module never mark anything changed
    assert changed("queries.text", 9999) is False
    assert changed("no.such.module", 1) is False


def test_window_prefix_prioritizes_recheck():
    last = _last_driver_check()
    if not last:  # fresh checkout without CORRECTNESS files
        return
    inv = load_all()
    names = list(inv)
    window = set(names[:50])
    for name, (rnd, rec) in last.items():
        if name in inv and _check_failed(rec, inv[name].oracle is not None):
            assert name in window, (
                f"{name} latest driver record (r{rnd:02d}) is not a full "
                f"pass yet it sits outside the re-check window")
    for name in inv:
        if name not in last:
            assert name in window, f"never-checked {name} outside window"
