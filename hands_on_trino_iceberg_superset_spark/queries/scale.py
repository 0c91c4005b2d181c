"""Scale-technique inventory entries: the skew/co-location knobs
(operators/scale.py) exercised as oracle-checked queries, so the
driver gates their RESULTS — not just their plan shapes
(tests/test_plans.py, tests/test_scale.py keep the plan gates).

Skew is the canonical 100 TB join killer: one hot key (null user,
default id, boilerplate doc) makes one shuffle partition arbitrarily
large. ``join_skew_salted`` plants an extreme hot key (70% of
lineitem lands on key 0) and joins through ``salted_join`` — the
result must be bit-identical to the plain join the DuckDB oracle
computes, proving salting is a pure execution-strategy change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.operators import scale as SC
from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
from hands_on_trino_iceberg_superset_spark.sources import load_table


@register(
    "join_skew_salted",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 7
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST(l_suppkey AS BIGINT) END AS k,
             l_quantity
      FROM lineitem
    ), d AS (
      SELECT CAST(s_suppkey AS BIGINT) AS k,
             CAST(s_nationkey AS BIGINT) AS nation_key
      FROM supplier
      UNION ALL
      SELECT CAST(0 AS BIGINT), CAST(-1 AS BIGINT)
    )
    SELECT nation_key,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM f JOIN d USING (k)
    GROUP BY nation_key
    ORDER BY nation_key
    """,
    doc="Skew-salted equi-join with a planted extreme hot key (70% "
        "of the fact rows collapse onto key 0 — the null-user/"
        "default-id shape that wedges one shuffle partition at "
        "100 TB). operators/scale.py salted_join spreads each key "
        "over 8 deterministic content-hash salts (build side "
        "replicated 8x), restoring parallelism; the DuckDB oracle "
        "computes the PLAIN join, so the hash gate proves salting "
        "changes the execution strategy and nothing else. Salt "
        "determinism (xxhash64 over row content) means a partial "
        "stage retry re-salts identically — no duplicated or "
        "dropped rows under task retries.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("l_suppkey"))
        .cast("long")
        .alias("k"),
        "l_quantity",
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("k"),
        F.col("s_nationkey").cast("long").alias("nation_key"),
    )
    extra = spark.range(1).select(
        F.lit(0).cast("long").alias("k"),
        F.lit(-1).cast("long").alias("nation_key"),
    )
    dim = sup.unionByName(extra)
    joined = SC.salted_join(li, dim, "k", "k", n_salts=8)
    return (
        joined.groupBy("nation_key")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dbl(F.sum(dec("l_quantity"))).alias("total_qty"),
        )
        .orderBy("nation_key")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Storage-co-located join (operators/scale.py write_bucketed): "
        "orders and customer are persisted hash-bucketed 16 ways on "
        "the join key, so the join itself runs with ZERO exchanges — "
        "the shuffle was paid once at ingest, the 100 TB pattern for "
        "a join both sides of which are reused across many queries. "
        "tests/test_scale.py pins the exchange-free plan; this entry "
        "gates the VALUES against the plain-join DuckDB oracle, "
        "proving bucketing is pure physical layout. The bucketed "
        "tables are rewritten from the sf parquet each run "
        "(control-plane sized at test SF; at scale they ARE the "
        "warehouse copy).",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re
    import shutil

    def fresh(name: str) -> None:
        # the default (per-session derby) metastore forgets tables a
        # PREVIOUS session wrote, but their warehouse directories
        # survive — saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS; drop both the entry and the dir
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(wh, name.lower()),
                      ignore_errors=True)

    token = re.sub(r"[^0-9A-Za-z]", "_", sf_dir.strip("/"))
    t_orders = f"bkt_orders_{token}"
    t_cust = f"bkt_customer_{token}"
    fresh(t_orders)
    fresh(t_cust)
    SC.write_bucketed(
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice"),
        t_orders, ["o_custkey"], 16,
    )
    SC.write_bucketed(
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment"),
        t_cust, ["c_custkey"], 16,
    )
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    # the merge hint pins the sort-merge path the bucketing serves:
    # at test SF Catalyst would broadcast the tiny customer side and
    # never touch the bucket layout, while at the sizes bucketing is
    # FOR (both sides too big to broadcast) sort-merge is the
    # organic choice — the hint makes the query exercise at any SF
    # exactly what it exercises at 100 TB
    joined = o.hint("merge").join(c, o["o_custkey"] == c["c_custkey"])
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_range_banded",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('light', 1, 10), ('mid', 10, 20),
             ('heavy', 20, 35), ('bulk', 35, 51)
    )
    SELECT t.tier,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM lineitem l
    JOIN tiers t ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
    GROUP BY t.tier
    ORDER BY t.tier
    """,
    doc="Banded RANGE join rewritten as an equi join "
        "(operators/scale.range_bucket_join): fact.value in [lo,hi) "
        "has no equality conjunct, so Spark's naive plan is a "
        "nested-loop join — O(facts x ranges) comparisons. The "
        "rewrite explodes each range into the width-5 buckets it "
        "overlaps, maps each fact row to its single bucket, "
        "hash-joins on the bucket id, and re-applies the exact "
        "range as a residual — BroadcastHashJoin instead of "
        "BroadcastNestedLoopJoin (plan-gated in tests/test_plans."
        "py), facts never replicated. The DuckDB oracle computes "
        "the plain theta join, so the hash gate proves the rewrite "
        "is a pure execution-strategy change.",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity")
    tiers = spark.createDataFrame(
        [("light", 1, 10), ("mid", 10, 20),
         ("heavy", 20, 35), ("bulk", 35, 51)],
        "tier string, lo int, hi int",
    )
    joined = SC.range_bucket_join(li, tiers, "l_quantity")
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dbl(F.sum(dec("l_quantity"))).alias("total_qty"),
        )
        .orderBy("tier")
    )
