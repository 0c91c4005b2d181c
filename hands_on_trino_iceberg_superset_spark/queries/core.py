"""Core relational query inventory (SURVEY.md §2.2-2.4).

TPC-H-shaped queries over the driver testdata exercising: scans with
predicate pushdown, projection pruning, hash/broadcast joins,
semi/anti joins, partial aggregation, rollup, windows, set ops,
sort+limit (top-K), and the expression surface the reference seeder
uses (CASE / concat / cast / modulo / interval arithmetic —
``/root/reference/compose/seed.sh:75-115``).

Scale notes (100 TB design):
- dimension tables (region/nation/supplier/customer-at-sf) are
  broadcast explicitly where they are guaranteed small; fact-fact
  joins rely on AQE to pick shuffled-hash vs sort-merge.
- aggregates run map-side first (Spark partial aggregation is
  automatic); DECIMAL aggregation keeps results order-independent so
  AQE re-planning can never change the answer.
- top-K (orderBy + limit) lowers to TakeOrderedAndProject — no global
  sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.sources import load_table


def dec(c: str | Column, scale: int = 2) -> Column:
    """Exact-arithmetic cast for float aggregation determinism.

    Scale 2 (cents) matches the money columns' true decimal scale and
    keeps derived products at scale <= 6, so (a) DuckDB's width-18
    product decimals never overflow their 6 integer digits and (b)
    every aggregate's scaled integer representation stays below 2^53,
    where both engines' decimal->double conversions are exact. Higher
    scales made sums drift in the last bits (round-1 q1 lesson).
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def dbl(c: Column) -> Column:
    return c.cast("double")


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------
# Aggregation over a pruned scan (reference A1/A7; TPC-H Q1 shape)
# --------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
               * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filtered scan + grouped aggregation (8 metrics).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
            dbl(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            dbl(F.sum(disc_price)).alias("sum_disc_price"),
            dbl(F.sum(charge)).alias("sum_charge"),
            (dbl(F.sum(dec("l_quantity"))) / cnt).alias("avg_qty"),
            (dbl(F.sum(dec("l_extendedprice"))) / cnt).alias("avg_price"),
            (dbl(F.sum(dec("l_discount"))) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# Fact-fact-dim join + grouped agg + top-K (TPC-H Q3 shape)
# --------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, grouped revenue, top-10 (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders.where(F.col("o_orderdate") < cutoff),
              cust.c_custkey == orders.o_custkey)
        .join(li.where(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dbl(F.sum(revenue)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# 6-way snowflake join (TPC-H Q5 shape) with broadcast dims
# --------------------------------------------------------------------


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name AS n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: snowflake join; nation/region/supplier broadcast.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        cust.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            ),
            cust.c_custkey == orders.o_custkey,
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dbl(F.sum(revenue)).alias("revenue"))
    )


# --------------------------------------------------------------------
# Filter + single global aggregate (TPC-H Q6 shape, pushdown showcase)
# --------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: multi-predicate pushdown + global agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dbl(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# Dim-fact join + top-K customers (implied BI query, SURVEY §2.4)
# --------------------------------------------------------------------


@register(
    "top_customers_by_spend",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
           count(*) AS order_count,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 25
    """,
    doc="Star-schema BI query: fact-dim join, grouped agg, top-25.",
)
def top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, nation = _t(spark, sf_dir, "customer", "orders", "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_spend"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(25)
    )


# --------------------------------------------------------------------
# Semi join (EXISTS) — TPC-H Q4 shape
# --------------------------------------------------------------------


@register(
    "order_priority_check",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS -> left-semi join + grouped count.",
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    filtered = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    return (
        filtered.join(
            li,
            (li.l_orderkey == filtered.o_orderkey) & (li.l_shipdate > filtered.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------
# Anti join — "customers with no orders" (SURVEY §2.4)
# --------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
    doc="Left-anti join: customers with no in-progress ('P') orders.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return cust.join(
        orders.where(F.col("o_orderstatus") == "P"),
        cust.c_custkey == orders.o_custkey,
        "left_anti",
    ).select("c_custkey", "c_mktsegment")


# --------------------------------------------------------------------
# Expression surface: CASE / concat / cast / modulo / arithmetic
# (mirrors reference seed expressions, seed.sh:75-115)
# --------------------------------------------------------------------


@register(
    "expression_showcase",
    oracle="""
    SELECT o_orderkey AS o_orderkey,
           CASE CAST(o_orderkey % 5 AS INTEGER)
             WHEN 0 THEN 'click' WHEN 1 THEN 'purchase' WHEN 2 THEN 'view'
             WHEN 3 THEN 'login' ELSE 'logout' END AS event_type,
           'Order ' || CAST(o_orderkey AS VARCHAR) AS payload,
           (o_orderkey % 50) + 1 AS synthetic_user,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 + 100.0 AS DOUBLE) AS amount,
           o_orderkey % 3 != 0 AS active_flag
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    doc="Reference seeder expression surface (E5-E11) as a query: "
        "CASE-by-modulo, || concat, CAST, arithmetic, boolean expr.",
)
def expression_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.where(F.col("o_orderstatus") == "O").select(
        k.alias("o_orderkey"),
        F.when((k % 5).cast("int") == 0, "click")
        .when((k % 5).cast("int") == 1, "purchase")
        .when((k % 5).cast("int") == 2, "view")
        .when((k % 5).cast("int") == 3, "login")
        .otherwise("logout")
        .alias("event_type"),
        F.concat(F.lit("Order "), k.cast("string")).alias("payload"),
        ((k % 50) + 1).alias("synthetic_user"),
        (dec("o_totalprice") * 2 + F.lit(100.0).cast("decimal(18,2)"))
        .cast("double")
        .alias("amount"),
        (k % 3 != 0).alias("active_flag"),
    )


# --------------------------------------------------------------------
# GROUP BY ... HAVING + distinct aggregation
# --------------------------------------------------------------------


@register(
    "brand_stats_having",
    oracle="""
    SELECT p.p_brand AS p_brand,
           count(DISTINCT l.l_suppkey) AS n_suppliers,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    HAVING count(*) > 100
    """,
    doc="Join + GROUP BY + HAVING + COUNT(DISTINCT).",
)
def brand_stats_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            dbl(F.sum(dec("l_quantity"))).alias("total_qty"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        .where(F.col("_cnt") > 100)
        .drop("_cnt")
    )


# --------------------------------------------------------------------
# ROLLUP (SURVEY §2.3 A8 extension tier)
# --------------------------------------------------------------------


@register(
    "rollup_region_nation_revenue",
    oracle="""
    SELECT coalesce(r.r_name, '(all)') AS region_name,
           coalesce(n.n_name, '(all)') AS nation_name,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="GROUP BY ROLLUP over the region/nation hierarchy.",
)
def rollup_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = _t(spark, sf_dir, "customer", "nation", "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dbl(F.sum(dec("c_acctbal"))).alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


# --------------------------------------------------------------------
# Window functions: ranking + running aggregate (SURVEY §2.5)
# --------------------------------------------------------------------


@register(
    "window_top_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Ranking windows: top-3 orders per customer by price.",
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_running_spend",
    oracle="""
    SELECT o_custkey AS o_custkey, o_orderkey AS o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           CAST(lag(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS prev_orderkey
    FROM orders
    """,
    doc="Running-sum + lag windows over each customer's order history.",
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        dbl(
            F.sum(dec("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).cast("bigint").alias("prev_orderkey"),
    )


# --------------------------------------------------------------------
# Set operators: UNION ALL / INTERSECT / EXCEPT (reference A3 + ext)
# --------------------------------------------------------------------


@register(
    "set_ops_customer_activity",
    oracle="""
    SELECT 'both' AS bucket, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'f_only' AS bucket, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'all_distinct' AS bucket, count(DISTINCT o_custkey) AS n FROM orders
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over customer activity sets.",
)
def set_ops_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    f_cust = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_cust.intersect(o_cust).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    f_only = f_cust.subtract(o_cust).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("f_only").alias("bucket"), "n"
    )
    all_d = orders.agg(F.countDistinct("o_custkey").alias("n")).select(
        F.lit("all_distinct").alias("bucket"), "n"
    )
    return both.unionAll(f_only).unionAll(all_d)


# --------------------------------------------------------------------
# Global counts per table (the reference's golden verification shape,
# seed.sh:117-118: count(*) + UNION ALL + ORDER BY)
# --------------------------------------------------------------------


@register(
    "global_counts",
    oracle="""
    SELECT 'customer' AS table_name, count(*) AS n_rows FROM customer
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'orders',   count(*) FROM orders
    UNION ALL SELECT 'part',     count(*) FROM part
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'nation',   count(*) FROM nation
    UNION ALL SELECT 'region',   count(*) FROM region
    UNION ALL SELECT 'events',   count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    ORDER BY table_name
    """,
    doc="Reference verification query shape (seed.sh:118): per-table "
        "count(*) stitched with UNION ALL, ordered by table name.",
)
def global_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.sources import TABLES

    parts = []
    for name in sorted(TABLES):
        df = load_table(spark, sf_dir, name)
        parts.append(
            df.agg(F.count(F.lit(1)).alias("n_rows")).select(
                F.lit(name).alias("table_name"), "n_rows"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("table_name")


# --------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape)
# --------------------------------------------------------------------


@register(
    "small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey AS agg_partkey,
             0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / count(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON t.agg_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_threshold
    """,
    doc="TPC-H Q17 shape: per-part average threshold via self-join "
        "(decorrelated scalar subquery).",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    thresholds = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            F.lit(0.2)
            * (dbl(F.sum(dec("l_quantity"))) / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part.where(F.col("p_brand") == "Brand#1")),
                li.l_partkey == part.p_partkey)
        .join(thresholds, F.col("l_partkey") == F.col("agg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dbl(F.sum(dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "sql_show_stats",
    oracle="""
    SELECT 'o_orderkey' AS column_name, CAST(NULL AS DOUBLE) AS data_size,
           CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS distinct_values_count,
           CAST(count(*) - count(o_orderkey) AS DOUBLE) / count(*) AS nulls_fraction,
           CAST(NULL AS DOUBLE) AS row_count,
           CAST(min(o_orderkey) AS VARCHAR) AS low_value,
           CAST(max(o_orderkey) AS VARCHAR) AS high_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', NULL, CAST(count(DISTINCT o_custkey) AS DOUBLE),
           CAST(count(*) - count(o_custkey) AS DOUBLE) / count(*), NULL,
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(sum(strlen(o_orderstatus)) AS DOUBLE),
           CAST(count(DISTINCT o_orderstatus) AS DOUBLE),
           CAST(count(*) - count(o_orderstatus) AS DOUBLE) / count(*),
           NULL, NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', NULL, CAST(count(DISTINCT o_totalprice) AS DOUBLE),
           CAST(count(*) - count(o_totalprice) AS DOUBLE) / count(*), NULL,
           CAST(min(o_totalprice) AS VARCHAR),
           CAST(max(o_totalprice) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', NULL, CAST(count(DISTINCT o_orderdate) AS DOUBLE),
           CAST(count(*) - count(o_orderdate) AS DOUBLE) / count(*),
           NULL, NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(sum(strlen(o_orderpriority)) AS DOUBLE),
           CAST(count(DISTINCT o_orderpriority) AS DOUBLE),
           CAST(count(*) - count(o_orderpriority) AS DOUBLE) / count(*),
           NULL, NULL, NULL
    FROM orders
    UNION ALL
    SELECT NULL, NULL, NULL, NULL, CAST(count(*) AS DOUBLE), NULL, NULL
    FROM orders
    """,
    doc="Trino's SHOW STATS FOR <table> surface (Engine."
        "_resolve_show_stats) — the table statistics Trino's "
        "cost-based optimizer and Superset's cost preview read: "
        "per-column data_size in BYTES (string columns), exact NDV, "
        "null fraction, numeric low/high, and the summary row_count, "
        "all from ONE aggregate pass (multiple count-distincts plan "
        "through a single expand). Exact NDV keeps the surface "
        "oracle-checkable; Trino itself serves estimates, and the "
        "100 TB swap is approx_count_distinct. Driven END-TO-END "
        "over the Trino REST wire protocol (server.py POST "
        "/v1/statement + nextUri paging), exactly how a Trino "
        "client or Superset's cost preview would issue it. The "
        "oracle restates every statistic per column in SQL.",
)
def sql_show_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.queries.wire import (
        _drain_statement,
    )
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    _t(spark, sf_dir, "orders")[0].createOrReplaceTempView(
        "show_stats_orders"
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(srv.url,
                                "SHOW STATS FOR show_stats_orders")
    finally:
        srv.stop()
    return spark.createDataFrame(
        [tuple(r) for r in rows],
        "column_name string, data_size double, "
        "distinct_values_count double, nulls_fraction double, "
        "row_count double, low_value string, high_value string",
    )


@register(
    "trino_fn_showcase",
    oracle="""
    SELECT o_orderpriority,
           strpos(o_orderpriority, '-') AS dash_pos,
           count(*) AS n_orders,
           min(date_diff('day', CAST(o_orderdate AS DATE),
                         DATE '2002-01-01')) AS min_days_to_cutoff,
           max(date_diff('day', CAST(o_orderdate AS DATE),
                         DATE '2002-01-01')) AS max_days_to_cutoff,
           min(strftime(o_orderdate, '%Y-%m')) AS first_month
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Trino scalar-function surface through the DIALECT SHIMS "
        "(dialect.py): strpos -> instr, date_diff('day', a, b) -> "
        "timestampdiff(DAY, a, b) (the unit literal becomes a Spark "
        "unit identifier, rewritten literal-aware), format_datetime "
        "-> date_format — the statement below is TRINO text run "
        "verbatim via Engine.trino_sql, the oracle states DuckDB's "
        "own spellings of the same functions. Dates diff as DATEs "
        "so complete-interval and boundary-crossing semantics "
        "coincide on both engines.",
)
def trino_fn_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine

    _t(spark, sf_dir, "orders")[0].createOrReplaceTempView(
        "trino_fn_orders"
    )
    return Engine(spark).trino_sql("""
        SELECT o_orderpriority,
               strpos(o_orderpriority, '-') AS dash_pos,
               count(*) AS n_orders,
               min(date_diff('day', CAST(o_orderdate AS DATE),
                             DATE '2002-01-01'))
                 AS min_days_to_cutoff,
               max(date_diff('day', CAST(o_orderdate AS DATE),
                             DATE '2002-01-01'))
                 AS max_days_to_cutoff,
               min(format_datetime(o_orderdate, 'yyyy-MM'))
                 AS first_month
        FROM trino_fn_orders
        GROUP BY o_orderpriority
    """)
