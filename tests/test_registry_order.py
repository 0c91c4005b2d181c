"""Driver-window ordering: the ~50-query CORRECTNESS prefix must
surface (1) failed / never-oracle-verified records, (2) never-checked
queries, then (3) green rows by OLDEST driver snapshot first
(freshness rotation; within a round, changed-since-checked code
before unchanged) — so a fix or a new oracle is driver-verified the
very next round, and no green row ages indefinitely behind a round's
anchor churn (the r14 policy change; see load_all's docstring)."""

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


def test_top_level_segments_anchors():
    from hands_on_trino_iceberg_superset_spark.queries.base import (
        _top_level_segments,
    )

    text = (
        "X = 1\n"
        "Y: int = 2\n"
        "@deco(oracle=f'{X}')\n"
        "def q():\n"
        "    return X\n"
        "class C:\n"
        "    def m(self):\n"
        "        return 1\n"
    )
    segs = _top_level_segments(text)
    assert segs["const:X"] == "X = 1"
    assert segs["const:Y"] == "Y: int = 2"
    # decorator text is part of the def's segment (the oracle
    # expression lives there)
    assert segs["def:q"].startswith("@deco(oracle=")
    assert "def m" in segs["def:C"]
    assert segs[""] == text
    # a doc tweak in an UNRELATED def leaves q's segment identical
    segs2 = _top_level_segments(text.replace("return 1", "return 2"))
    assert segs2["def:q"] == segs["def:q"]
    assert segs2["def:C"] != segs["def:C"]


def test_query_anchors_reach_helpers_and_oracle_builders():
    """Anchor sets must include the registering function itself, the
    operator helpers it calls (direct import AND module-alias
    access), and decorator-expression oracle builders."""
    from hands_on_trino_iceberg_superset_spark.queries.base import (
        _query_anchors,
    )

    load_all()  # populate REGISTRY
    anchors = _query_anchors()

    def has(name, relsuffix, anchor):
        return any(rp.endswith(relsuffix) and a == anchor
                   for rp, a in anchors[name])

    # the query fn itself
    assert has("dedup_url_canonical", "queries/dedup.py",
               "def:dedup_url_canonical")
    # module-alias operator helper (D.canonical_url)
    assert has("dedup_url_canonical", "operators/dedup.py",
               "def:canonical_url")
    # decorator-expression oracle builder + its constant
    assert has("tokenizer_wordpiece_encode", "queries/curation.py",
               "def:_wp_encode_oracle")
    assert has("tokenizer_wordpiece_encode", "queries/curation.py",
               "const:_WP_STEPS")
    # helpers reached through the wordpiece operators module
    assert has("tokenizer_wordpiece_encode", "operators/wordpiece.py",
               "def:encode_words")


def test_imported_const_anchored_in_defining_file():
    """A constant pulled in via ``from X import CONST`` must anchor in
    the file whose top-level assignment DEFINES it: the importing
    module has no assignment segment, so anchoring there would diff
    None == None at both revs and a change to the const's definition
    would never mark the query as changed."""
    from hands_on_trino_iceberg_superset_spark.queries.base import (
        _const_anchor,
        _file_segments,
        _query_anchors,
    )

    load_all()
    anchors = _query_anchors()
    pkg = "hands_on_trino_iceberg_superset_spark"

    # SEED_CTE is defined in queries/reference.py, imported into
    # queries/bi.py where every bi_chart_* oracle uses it
    rp_bi = f"{pkg}/queries/bi.py"
    rp_ref = f"{pkg}/queries/reference.py"
    assert _const_anchor(rp_bi, "SEED_CTE") == (rp_ref,
                                                "const:SEED_CTE")
    hit = [a for a in anchors["bi_chart_raw_orders"]
           if a[1] == "const:SEED_CTE"]
    assert hit and all(rp.endswith("queries/reference.py")
                       for rp, _ in hit)

    # every const anchor in the whole inventory must have a real
    # segment in the working tree — None==None diffs are impossible
    for name, keys in anchors.items():
        for rp, anchor in keys:
            if anchor.startswith("const:"):
                segs = _file_segments(rp, None)
                assert segs is not None and anchor in segs, \
                    f"{name}: dangling const anchor {anchor} in {rp}"


def test_changed_per_query_is_finer_than_closure():
    """The whole point: one edit in a many-query module must not mark
    every query in it changed. Against the latest round marker, the
    anchor signal must flag at most as many queries as the closure
    signal, and strictly fewer whenever closure inflation exists."""
    from hands_on_trino_iceberg_superset_spark.queries.base import (
        REGISTRY,
        _changed_per_query,
        _changed_since_round,
        _round_markers,
    )

    load_all()  # populate REGISTRY
    markers = _round_markers()
    if not markers:
        return
    rnd = max(markers)
    fine, coarse = _changed_per_query(), _changed_since_round()
    pkg = "hands_on_trino_iceberg_superset_spark"
    n_fine = n_coarse = 0
    for name, spec in REGISTRY.items():
        mod = spec.spark.__module__.split(pkg + ".", 1)[-1]
        if fine(name, rnd):
            n_fine += 1
            # anchor-changed without closure-changed would mean the
            # closure missed a dependency edge the anchors found —
            # possible (closure is module-level, anchors cross into
            # operators/) but coarse should dominate within modules
        if coarse(mod, rnd):
            n_coarse += 1
    assert n_fine <= n_coarse
    if n_coarse >= 30:  # closure inflation present -> anchors must win
        assert n_fine < n_coarse / 2


def _fabricated_order(base, monkeypatch, n_failed: int) -> tuple:
    """load_all() ordering with the first ``n_failed`` registry
    entries fabricated as failed (class 0) and the rest green with
    ages cycling r1..r6; returns (ordered names, last-check map)."""
    names = list(base.REGISTRY)
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    last = {}
    for i, n in enumerate(names):
        if i < n_failed:
            last[n] = (7, {**ok, "hash_match": False})
        else:
            last[n] = (1 + (i % 6), ok)
    monkeypatch.setattr(base, "_last_driver_check", lambda: last)
    monkeypatch.setattr(base, "_changed_per_query",
                        lambda: (lambda name, rnd: False))
    return list(base.load_all()), last


def test_freshness_rotation_oldest_green_first(monkeypatch):
    """Green rows sort by OLDEST driver snapshot first: with 10
    failed queries, the window is 10 failed + the 40 globally oldest
    greens, and no green outside the window is older than one
    inside (the freshness-rotation guarantee that replaced the
    reserved-tail floor in r14)."""
    from hands_on_trino_iceberg_superset_spark.queries import base

    base.load_all()  # populate REGISTRY
    ordered, last = _fabricated_order(base, monkeypatch, n_failed=10)
    window = ordered[:base._WINDOW]
    assert all(last[n][1]["hash_match"] is False
               for n in window[:10])
    greens_in = window[10:]
    assert all(last[n][1]["hash_match"] is True for n in greens_in)
    newest_in = max(last[n][0] for n in greens_in)
    in_window = set(window)
    greens_older_out = [n for n in ordered
                        if last[n][1]["hash_match"]
                        and n not in in_window
                        and last[n][0] < newest_in]
    assert greens_older_out == []


def test_changed_outranks_unchanged_within_a_round(monkeypatch):
    """Within ONE snapshot round, rows whose code changed since the
    check sort before unchanged ones — but a changed row never
    outranks a green row with an OLDER snapshot (round dominates;
    the r14 policy change)."""
    from hands_on_trino_iceberg_superset_spark.queries import base

    base.load_all()
    names = list(base.REGISTRY)
    ok = {"rows_match": True, "schema_match": True,
          "hash_match": True, "spark_rows": 1, "oracle_rows": 1,
          "err": None}
    # all green at alternating rounds 5/6; every round-6 row marked
    # changed, round-5 rows unchanged
    last = {n: (5 + (i % 2), ok) for i, n in enumerate(names)}
    changed_names = {n for n in names if last[n][0] == 6}
    monkeypatch.setattr(base, "_last_driver_check", lambda: last)
    monkeypatch.setattr(
        base, "_changed_per_query",
        lambda: (lambda name, rnd: name in changed_names))
    ordered = list(base.load_all())
    n_r5 = sum(1 for n in names if last[n][0] == 5)
    # every r5 row (unchanged) precedes every r6 row (changed)
    assert all(last[n][0] == 5 for n in ordered[:n_r5])
    assert all(n in changed_names for n in ordered[n_r5:])


def test_urgent_rows_never_displaced(monkeypatch):
    """Failed rows take every window slot they need before any
    green — unchanged from the pre-r14 ordering."""
    from hands_on_trino_iceberg_superset_spark.queries import base

    base.load_all()
    ordered, last = _fabricated_order(base, monkeypatch, n_failed=60)
    window = ordered[:base._WINDOW]
    # every window slot is a failed query; no green displaced one
    assert all(last[n][1]["hash_match"] is False for n in window)


def test_relative_base_resolves_init_one_level_correctly():
    """Relative imports inside a package __init__ resolve against the
    package ITSELF (level 1), not its parent — the arithmetic both
    _import_const_origins and _resolve_imports share. A plain module
    strips its filename part first."""
    from hands_on_trino_iceberg_superset_spark.queries import base

    pkg = "hands_on_trino_iceberg_superset_spark"
    # plain module: 'from . import X' -> containing package
    assert base._relative_base(f"{pkg}/queries/foo.py", 1) \
        == [pkg, "queries"]
    assert base._relative_base(f"{pkg}/queries/foo.py", 2) == [pkg]
    # package __init__: 'from .mod import C' -> the package itself
    assert base._relative_base(f"{pkg}/queries/__init__.py", 1) \
        == [pkg, "queries"]
    assert base._relative_base(f"{pkg}/queries/__init__.py", 2) \
        == [pkg]
    # deeper than the tree: conservative empty base
    assert base._relative_base(f"{pkg}/queries/foo.py", 5) == []
