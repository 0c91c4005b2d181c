"""Property tests for the Superset time-range machinery
(bi/compiler.py, r13): the resolver feeds BOTH compilation paths and
every bound lands inside a SQL TIMESTAMP literal, so its invariants
are worth holding under fuzzing, not just at the hand-picked anchors
the example tests use."""

from __future__ import annotations

import calendar
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from hands_on_trino_iceberg_superset_spark.bi.compiler import (
    _minus_units,
    _parse_range_expr,
    _resolved_time_bounds,
    _trunc_calendar,
)

_ANCHORS = st.datetimes(
    min_value=datetime(1980, 1, 2),
    max_value=datetime(2099, 12, 30),
)

_UNITS = st.sampled_from(
    ["second", "minute", "hour", "day", "week", "month", "quarter",
     "year"]
)

_PHRASES = st.sampled_from([
    "Last day", "Last week", "Last month", "Last quarter",
    "Last year", "previous calendar week", "previous calendar month",
    "previous calendar year", "Last 1 seconds", "Last 36 hours",
    "Last 7 days", "Last 2 weeks", "Last 3 months", "Last 1 quarter",
    "Last 2 years",
])


@settings(max_examples=300, deadline=None)
@given(_ANCHORS, st.integers(min_value=1, max_value=120), _UNITS)
def test_minus_units_moves_back_and_clamps(anchor, n, unit):
    """Subtracting n units always lands strictly earlier; month-math
    results clamp the day into the target month (never a crash on
    Jan 31 - 1 month) and preserve the time of day."""
    out = _minus_units(anchor, n, unit)
    assert out < anchor
    if unit in ("month", "quarter", "year"):
        dim = calendar.monthrange(out.year, out.month)[1]
        assert out.day == min(anchor.day, dim)
        assert (out.hour, out.minute, out.second, out.microsecond) \
            == (anchor.hour, anchor.minute, anchor.second,
                anchor.microsecond)
    # negative n is the DATEADD-forward path: strictly later
    fwd = _minus_units(anchor, -n, unit)
    assert fwd > anchor


@settings(max_examples=300, deadline=None)
@given(_ANCHORS, _UNITS)
def test_trunc_calendar_is_idempotent_floor(anchor, unit):
    t = _trunc_calendar(anchor, unit)
    assert t <= anchor
    assert _trunc_calendar(t, unit) == t
    if unit == "week":
        assert t.weekday() == 0  # ISO Monday
    if unit in ("month", "quarter", "year"):
        assert t.day == 1 and t.hour == 0
    if unit == "quarter":
        assert t.month in (1, 4, 7, 10)


@settings(max_examples=300, deadline=None)
@given(_ANCHORS, _PHRASES)
def test_every_relative_phrase_yields_ordered_iso_bounds(anchor,
                                                         phrase):
    """For ANY anchor, every supported phrase resolves to two
    ISO-parseable bounds with since < until — the invariant that
    keeps the emitted TIMESTAMP literals valid and the filter
    non-empty-by-construction."""
    fd = {
        "time_range": phrase,
        "time_range_anchor": anchor.isoformat(sep=" "),
        "granularity_sqla": "ts",
    }
    bounds = _resolved_time_bounds(fd)
    assert bounds is not None
    since, until = bounds
    s, u = datetime.fromisoformat(since), datetime.fromisoformat(until)
    assert s < u
    assert u <= anchor  # never reaches past "now"


@settings(max_examples=200, deadline=None)
@given(_ANCHORS)
def test_grammar_datetime_roundtrip_and_anchor_tokens(anchor):
    iso = anchor.isoformat(sep=" ")
    assert _parse_range_expr(f"DATETIME('{iso}')", anchor) == anchor
    assert _parse_range_expr("now", anchor) == anchor
    today = _parse_range_expr("today", anchor)
    assert today == anchor.replace(hour=0, minute=0, second=0,
                                   microsecond=0)
    # DATEADD forward then back over a day-safe unit is the identity
    there = _parse_range_expr("DATEADD(now, 5, day)", anchor)
    back = _parse_range_expr("DATEADD(DATETIME('%s'), -5, day)"
                             % there.isoformat(sep=" "), anchor)
    assert back == anchor


@settings(max_examples=300, deadline=None)
@given(st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Ps", "Pe"),
        whitelist_characters=" _-',()",
    ),
    min_size=1, max_size=40,
))
def test_garbage_bounds_never_pass_silently(text):
    """Fuzzed non-ISO bounds either parse as the closed grammar
    (producing a datetime) or raise ValueError — never a silent
    passthrough that would reach the SQL literal, and never a
    non-ValueError crash."""
    anchor = datetime(2024, 1, 29, 10, 30)
    fd = {
        "time_range": f"{text.strip()} : 2024-01-01",
        "time_range_anchor": anchor.isoformat(sep=" "),
        "granularity_sqla": "ts",
    }
    try:
        bounds = _resolved_time_bounds(fd)
    except ValueError:
        return
    assert bounds is not None
    since = bounds[0]
    # whatever survived must be a real ISO bound (resolved grammar
    # or empty start), safe inside TIMESTAMP '...'
    if since:
        datetime.fromisoformat(since)
        assert "'" not in since


# ---------------------------------------------------------------
# extra_form_data merge (r14): pure-dict machinery, fuzzable without
# a SparkSession — the invariants both compiler paths rely on.

_FILTER_OPS_ST = st.sampled_from(["==", "!=", ">", ">=", "<", "<=",
                                  "LIKE"])

_NATIVE_FILTERS = st.lists(
    st.fixed_dictionaries({
        "col": st.sampled_from(["a", "b", "c"]),
        "op": _FILTER_OPS_ST,
        "val": st.one_of(st.integers(-1000, 1000),
                         st.text(max_size=8)),
    }),
    max_size=4,
)

_EXTRAS = st.fixed_dictionaries(
    {},
    optional={
        "filters": _NATIVE_FILTERS,
        "time_range": st.sampled_from(
            ["Last week", "No filter",
             "2024-01-01 00:00:00 : 2024-01-08 00:00:00"]),
        "time_grain_sqla": st.sampled_from(["P1D", "P1W"]),
        "granularity_sqla": st.sampled_from(["ts", "created"]),
    },
)


@given(extra=_EXTRAS,
       own=st.lists(st.fixed_dictionaries({
           "expressionType": st.just("SIMPLE"),
           "subject": st.sampled_from(["x", "y"]),
           "operator": _FILTER_OPS_ST,
           "comparator": st.integers(-10, 10),
       }), max_size=3))
@settings(max_examples=200, deadline=None)
def test_merge_extra_form_data_invariants(extra, own):
    """For every well-formed channel: (1) the input blob is never
    mutated; (2) merging is stable — re-merging the merged dict (no
    channel left) is the identity; (3) the chart's own filters all
    survive, in order, ahead of the appended native ones; (4) every
    override key present in the channel wins; (5) the merged dict
    carries no extra_form_data key."""
    import copy

    from hands_on_trino_iceberg_superset_spark.bi.compiler import (
        merge_extra_form_data,
    )

    fd = {
        "query_mode": "aggregate",
        "metrics": ["count"],
        "time_range": "No filter",
        "adhoc_filters": own,
        "extra_form_data": extra,
    }
    snap = copy.deepcopy(fd)
    merged = merge_extra_form_data(fd)
    assert fd == snap
    assert "extra_form_data" not in merged
    assert merge_extra_form_data(merged) == merged
    out_filters = merged.get("adhoc_filters") or []
    assert out_filters[:len(own)] == own
    appended = out_filters[len(own):]
    assert len(appended) == len(extra.get("filters") or [])
    for nf, af in zip(extra.get("filters") or [], appended):
        assert af["subject"] == nf["col"]
        assert af["operator"] == nf["op"]
        assert af["comparator"] == nf.get("val")
        assert af["isExtra"] is True
        assert af["clause"] == "WHERE"
    for k in ("time_range", "time_grain_sqla", "granularity_sqla"):
        if extra.get(k) is not None:
            assert merged[k] == extra[k]
    if extra.get("time_range") is None:
        assert merged["time_range"] == "No filter"


@given(key=st.text(min_size=1, max_size=20).filter(
    lambda k: k not in {
        "filters", "adhoc_filters", "time_range",
        "time_range_endpoints", "time_grain_sqla",
        "granularity_sqla", "time_range_anchor"}))
@settings(max_examples=100, deadline=None)
def test_merge_unknown_extra_key_always_refuses(key):
    """No unknown sub-key is ever silently dropped, whatever its
    name — the silent-wrong-answer hazard the merge exists to
    close."""
    import pytest

    from hands_on_trino_iceberg_superset_spark.bi.compiler import (
        merge_extra_form_data,
    )

    with pytest.raises(ValueError, match="extra_form_data"):
        merge_extra_form_data(
            {"query_mode": "raw", "extra_form_data": {key: 1}})
