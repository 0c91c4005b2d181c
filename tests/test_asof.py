"""As-of join semantics: carry-forward correctness, same-instant
inclusion, strict mode, missing-match nulls."""

from __future__ import annotations

from hands_on_trino_iceberg_superset_spark.operators.asof import asof_join


def _quotes(spark):
    return spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)],
        ["sym", "t", "px"],
    )


def _trades(spark):
    return spark.createDataFrame(
        [("A", 0, 100), ("A", 1, 101), ("A", 7, 102), ("B", 2, 103),
         ("C", 9, 104)],
        ["sym", "t", "qty"],
    )


def test_asof_basic_carry_forward(spark):
    out = {
        (r.sym, r.t): r.px
        for r in asof_join(
            _trades(spark), _quotes(spark), on="sym", order_col="t",
            carry_cols=["px"],
        ).collect()
    }
    assert out[("A", 0)] is None          # no quote yet
    assert out[("A", 1)] == 10.0          # same-instant quote visible
    assert out[("A", 7)] == 11.0          # latest prior
    assert out[("B", 2)] is None
    assert out[("C", 9)] is None          # key with no quotes at all


def test_asof_strict_excludes_same_instant(spark):
    out = {
        (r.sym, r.t): r.px
        for r in asof_join(
            _trades(spark), _quotes(spark), on="sym", order_col="t",
            carry_cols=["px"], strict=True,
        ).collect()
    }
    assert out[("A", 1)] is None          # strict: t=1 quote excluded
    assert out[("A", 7)] == 11.0


def test_asof_preserves_left_rows_and_columns(spark):
    trades = _trades(spark)
    out = asof_join(trades, _quotes(spark), on="sym", order_col="t",
                    carry_cols=["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"sym", "t", "qty", "px"}


def test_asof_rejects_colliding_carry_and_reserved_names(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, "x")], ["k", "t", "v"])
    right = spark.createDataFrame([(1, 5, "y")], ["k", "t", "v"])
    with pytest.raises(ValueError, match="carry_cols.*left side"):
        asof_join(left, right, on="k", order_col="t", carry_cols=["v"])
    with pytest.raises(ValueError, match="not found on the right"):
        asof_join(left, right, on="k", order_col="t", carry_cols=["nope"])
    bad = spark.createDataFrame([(1, 5, "y")], ["k", "t", "_side"])
    with pytest.raises(ValueError, match="internals"):
        asof_join(left, bad, on="k", order_col="t", carry_cols=["_side"])


def test_null_order_right_rows_never_match(spark):
    """A right row with NULL order time satisfies no as-of predicate;
    nulls-first window order must not carry it as
    earlier-than-everything."""
    left = spark.createDataFrame([(1, 5)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, None, "bogus"), (1, 10, "late")],
        "k long, ts long, v string",
    )
    from hands_on_trino_iceberg_superset_spark.operators.asof import asof_join

    out = asof_join(left, right, on="k", order_col="ts",
                    carry_cols=["v"]).collect()
    assert [(r.k, r.ts, r.v) for r in out] == [(1, 5, None)]
