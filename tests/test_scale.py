"""Scale utilities: bucketed joins eliminate exchanges; salted joins
produce identical results on skewed keys."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hands_on_trino_iceberg_superset_spark.operators.scale import (
    salted_join,
    write_bucketed,
)
from hands_on_trino_iceberg_superset_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from hands_on_trino_iceberg_superset_spark.seed.seeder import _delete_path

    spark.sql("CREATE DATABASE IF NOT EXISTS scale_test")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS scale_test.{t}")
        _delete_path(spark, f"{warehouse}/scale_test.db/{t}")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "scale_test.li_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "scale_test.ord_b", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    return spark.table("scale_test.li_b"), spark.table("scale_test.ord_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    li_b, ord_b = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle-based join so bucketing is what saves us
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must read co-located buckets: the only
        # exchange allowed is the one for the final groupBy
        assert plan.count("Exchange") <= 1
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain_join(spark):
    # heavily skewed: 10k rows share key 1, a few unique keys
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (9_500, "cold"), (42, "missing-on-left-ok")],
        ["rk", "label"],
    )
    plain = left.join(right, left.k == right.rk, "inner")
    salted = salted_join(left, right, "k", "rk", n_salts=8, how="inner")
    assert salted.count() == plain.count() == 9_001
    a = sorted((r.k, r.payload, r.label) for r in plain.collect())
    b = sorted((r.k, r.payload, r.label) for r in salted.collect())
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["rk", "w"])
    out = salted_join(left, right, "k", "rk", n_salts=4, how="left")
    rows = {(r.k, r.w) for r in out.collect()}
    assert rows == {(1, "x"), (2, None)}


def test_salted_join_same_key_name(spark):
    """Both sides naming the join key identically must work (the
    common case) and produce the plain-equi-join column shape."""
    from hands_on_trino_iceberg_superset_spark.operators.scale import (
        salted_join,
    )

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], ["k", "rv"])
    joined = salted_join(left, right, "k", "k", n_salts=4)
    assert joined.columns == ["k", "lv", "rv"]
    out = sorted((r.k, r.lv, r.rv) for r in joined.collect())
    assert out == [(1, "a", "X"), (1, "b", "X"), (2, "c", "Y")]


def test_salted_join_spreads_identical_rows_and_guards_salt(spark):
    """salt_on='rowid' spreads even fully-duplicate hot-key rows (the
    boilerplate-doc skew case), and a caller's _salt column is
    refused instead of silently clobbered."""
    from hands_on_trino_iceberg_superset_spark.operators.scale import (
        salted_join,
    )

    hot = spark.createDataFrame(
        [(7, "same")] * 400 + [(8, "other")], "k long, payload string"
    ).repartition(8)
    dim = spark.createDataFrame([(7, "d7"), (8, "d8")], "k long, d string")
    out = salted_join(hot, dim, "k", "k", n_salts=4, salt_on="rowid")
    assert out.count() == 401  # row-preserving
    # the salt column used internally must actually spread the
    # identical rows: check the physical distribution via the same
    # expression path (monotonically_increasing_id varies per row)
    import pyspark.sql.functions as F
    n_salts_seen = (
        hot.withColumn(
            "s", F.pmod(F.monotonically_increasing_id(), F.lit(4))
        ).select("s").distinct().count()
    )
    assert n_salts_seen > 1

    bad = hot.withColumn("_salt", F.lit(1))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(bad, dim, "k", "k")
    with _pytest.raises(ValueError, match="salt_on"):
        salted_join(hot, dim, "k", "k", salt_on="random")


def test_salted_join_content_salt_deterministic_and_spreads(spark):
    """The default content salt is a pure function of the row, so a
    recomputed partition re-salts identically (retry-safe — the r3
    ADVICE finding on monotonically_increasing_id), and a hot key
    whose rows differ in any column still spreads across salts."""
    import pyspark.sql.functions as F
    from hands_on_trino_iceberg_superset_spark.operators.scale import (
        salted_join,
    )

    # hot key 1 with 2000 rows of DIFFERING payloads
    left = spark.range(2_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "hot")], ["k", "d"])
    out = salted_join(left, dim, "k", "k", n_salts=8)
    assert out.count() == 2_000
    # same salt expression as the implementation: all 8 sub-keys used
    n_salts_seen = (
        left.withColumn(
            "s", F.pmod(F.xxhash64("k", "payload"), F.lit(8))
        ).select("s").distinct().count()
    )
    assert n_salts_seen == 8
    # determinism: the salt assignment is identical across two
    # independent evaluations even after a reshuffle of the input
    a = left.withColumn("s", F.pmod(F.xxhash64("k", "payload"), F.lit(8)))
    b = (left.repartition(13)
         .withColumn("s", F.pmod(F.xxhash64("k", "payload"), F.lit(8))))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_range_bucket_join_matches_naive_with_overlaps(spark) -> None:
    """Bucketized range join is value-identical to the naive theta
    join, including OVERLAPPING ranges (a fact row matching two
    bands emits two rows) and ranges narrower than / crossing the
    bucket width."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import scale as SC

    facts = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 4, 5, 9, 10, 23, 34, 35, 49, 50]],
        "v double",
    )
    ranges = spark.createDataFrame(
        [("a", 1, 10), ("b", 5, 6), ("c", 8, 40), ("d", 35, 51)],
        "name string, lo int, hi int",
    )
    got = {
        (r.v, r.name)
        for r in SC.range_bucket_join(facts, ranges, "v").collect()
    }
    naive = {
        (r.v, r.name)
        for r in facts.join(
            ranges,
            (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")),
        ).collect()
    }
    assert got == naive
    assert (5.0, "a") in got and (5.0, "b") in got and (5.0, "c") not in got


def test_range_bucket_join_fractional_bounds(spark) -> None:
    """Ranges with non-integer bounds must not drop matching facts
    (the upper bucket is floor(hi/w), not floor((hi-1)/w))."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import scale as SC

    facts = spark.createDataFrame(
        [(10.0,), (10.19,), (10.2,), (9.5,), (4.9,)], "v double"
    )
    ranges = spark.createDataFrame(
        [("r", 9.5, 10.2)], "name string, lo double, hi double"
    )
    got = {r.v for r in SC.range_bucket_join(facts, ranges, "v",
                                             bucket_width=5).collect()}
    naive = {r.v for r in facts.join(
        ranges, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    ).collect()}
    assert got == naive == {10.0, 10.19, 9.5}


def test_range_bucket_join_collisions_and_no_broadcast(spark) -> None:
    """Facts may carry a column named like the ranges' bound columns
    and even a literal ``_bkt`` without ambiguous-reference errors
    (qualified predicates + uniquified temp column), and
    ``broadcast_ranges=False`` plans a shuffled hash join with
    identical values for a too-big-to-broadcast ranges side."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import scale as SC

    facts = spark.createDataFrame(
        [(0.0, 99.0, -1), (5.0, 99.0, -1), (23.0, 99.0, -1)],
        "v double, lo double, _bkt int",
    )
    ranges = spark.createDataFrame(
        [("a", 1, 10), ("c", 8, 40)], "name string, lo int, hi int"
    )
    for bcast in (True, False):
        got = {
            (r.v, r.name)
            for r in SC.range_bucket_join(
                facts, ranges, "v", broadcast_ranges=bcast
            ).collect()
        }
        assert got == {(5.0, "a"), (23.0, "c")}
    plan = SC.range_bucket_join(
        facts, ranges, "v", broadcast_ranges=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
