"""Additional TPC-H-shaped analytics over the driver corpus —
widening the §2.3/§2.4 implied-surface coverage: outer-join
distributions (Q13), group-filtered IN subqueries (Q18), conditional
aggregation ratios (Q14), disjunctive multi-predicate join filters
(Q19), scalar-subquery + anti-join (Q22), CUBE grouping sets, and
exact interpolated percentiles.

(The corpus has no partsupp table; Q11/Q16 below are adapted to
lineitem's l_suppkey and Q2/Q9/Q20 stay out of scope — see
FIXTURES.md §B.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import _t, dbl, dec


@register(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape: order-count histogram via left outer join "
        "+ two-level aggregation (customers with zero orders kept).",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS total_price,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery (compiles "
        "to a semi-join on the aggregated key), then re-aggregation.",
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .where(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(dbl(F.sum(dec("l_quantity"))).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            dbl(F.col("o_totalprice")).alias("total_price"),
            "total_qty",
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                       AS DOUBLE)
                AS DOUBLE) AS promo_share_pct,
           count(*) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="TPC-H Q14 shape: conditional-aggregation ratio (CASE inside "
        "SUM) over a fact-dim join; dim side broadcast.",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    # factors cast to decimal BEFORE multiplying: the product is then
    # exact at scale 4 (no .xx5 tie-rounding, which Spark and DuckDB
    # resolve differently when casting a double product at scale 2)
    rev = dec("l_extendedprice") * (1 - dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * dbl(F.sum(promo)) / dbl(F.sum(rev)))
            .cast("double").alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           count(*) AS n_matched
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive range predicates "
        "spanning both join sides (planner must keep the equi-join "
        "key extractable from the OR).",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        j.where(
            arm("Brand#1", 1, 15, 1, 20)
            | arm("Brand#20", 10, 30, 10, 35)
            | arm("Brand#9", 20, 50, 20, 50)
        )
        .agg(
            dbl(
                F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


@register(
    "idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS "
        "anti-join (against in-progress orders), grouped. The scalar "
        "aggregate broadcasts; the anti-join streams.",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    threshold = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(dbl(F.avg(dec("c_acctbal"))).alias("t"))
    )
    return (
        cust.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("t"))
        .join(
            orders.where(F.col("o_orderstatus") == "P"),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dbl(F.sum(dec("c_acctbal"))).alias("total_acctbal"),
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, '(all)') AS order_status,
           coalesce(o_orderpriority, '(all)') AS order_priority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="GROUP BY CUBE: all 2^2 grouping sets in one pass "
        "(Spark expands to a single Expand + aggregate, no re-scan).",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)"))
            .alias("order_status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)"))
            .alias("order_priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (percentile_cont semantics) "
        "per group — sort-based exact aggregate, vs the "
        "approx_percentile sketch used at 100 TB scale.",
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "grouping_sets_nation_segment",
    oracle="""
    SELECT coalesce(n.n_name, '(all)') AS nation_name,
           coalesce(c.c_mktsegment, '(all)') AS segment,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
    """,
    doc="Explicit GROUPING SETS (two independent dimensions + grand "
        "total) — one Expand pass, no re-scan per set.",
)
def grouping_sets_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation = _t(spark, sf_dir, "customer", "nation")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    # native DataFrame grouping sets (one Expand pass) — no temp-view
    # side effect: a fixed-name registration raced concurrent callers
    # and leaked a catalog entry
    out = j.groupingSets(
        [[F.col("n_name")], [F.col("c_mktsegment")], []],
        F.col("n_name"), F.col("c_mktsegment"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double").alias("total_acctbal"),
    )
    return out.select(
        F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation_name"),
        F.coalesce(F.col("c_mktsegment"), F.lit("(all)")).alias("segment"),
        "n_customers",
        "total_acctbal",
    )


@register(
    "supplier_part_diversity",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_size AS p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13)
      AND NOT EXISTS (
          SELECT 1 FROM supplier s
          WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey)
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 shape: anti-join against a filtered dimension + "
        "COUNT(DISTINCT) per group; the exclusion list broadcasts, "
        "the distinct runs as a two-phase aggregate. The oracle is "
        "spelled NOT EXISTS (not NOT IN) to match the left_anti "
        "join's NULL semantics: a NULL key in the exclusion list "
        "makes NOT IN return zero rows while an anti-join keeps "
        "non-matching rows.",
)
def supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li, supp = _t(spark, sf_dir, "part", "lineitem", "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            F.broadcast(
                part.where(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(1, 5, 9, 13)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "top_value_brands",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS p_brand,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    )
    SELECT p_brand, CAST(r AS DOUBLE) AS revenue
    FROM rev
    WHERE r > (SELECT CAST(0.03 AS DECIMAL(4,2)) * sum(r) FROM rev)
    """,
    doc="TPC-H Q11 shape: grouped revenue filtered against a scalar "
        "subquery over the SAME aggregate (fraction-of-total "
        "threshold) — the aggregate computes once and self-joins "
        "against its own global sum. Threshold arithmetic stays in "
        "decimal for hash determinism.",
)
def top_value_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("r"))
    )
    total = rev.agg(
        (F.lit("0.03").cast("decimal(4,2)") * F.sum("r")).alias("_t")
    )
    return (
        rev.crossJoin(F.broadcast(total))
        .where(F.col("r") > F.col("_t"))
        .select("p_brand", dbl(F.col("r")).alias("revenue"))
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000
                      AS BIGINT) // CAST(l_quantity AS BIGINT))
               AS unit_micro
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(unit_micro) AS best_micro FROM unit
      GROUP BY l_partkey
    )
    SELECT u.l_partkey AS partkey,
           min(u.l_suppkey) AS suppkey,
           b.best_micro AS unit_cost_e4
    FROM unit u JOIN best b
      ON u.l_partkey = b.l_partkey AND u.unit_micro = b.best_micro
    GROUP BY u.l_partkey, b.best_micro
    ORDER BY partkey LIMIT 100
    """,
    doc="Q2 shape adapted to the corpus (no partsupp table): the "
        "cheapest supplier per part by observed unit price — the "
        "correlated-min-subquery pattern, executed Spark-first as "
        "aggregate + self-join on the grouping key (what Catalyst "
        "rewrites correlated scalar subqueries into anyway), with "
        "min(suppkey) as the deterministic tiebreak. Two shuffles on "
        "l_partkey, both reusing the same partitioning.",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    # exact integer unit cost (price in 1e-4 units, floor-divided by
    # quantity): decimal DIVISION scales differ between engines and
    # drift in the last double bits, integer math cannot
    unit_micro = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000 AS BIGINT) "
        "div CAST(l_quantity AS BIGINT)"
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_micro).alias("unit_micro")
    )
    best = unit.groupBy("l_partkey").agg(
        F.min("unit_micro").alias("best_micro")
    ).withColumnRenamed("l_partkey", "b_partkey")
    return (
        unit.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_micro") == F.col("best_micro")),
        )
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("best_micro"))
        .agg(F.min("l_suppkey").alias("suppkey"))
        .select("partkey", "suppkey",
                F.col("best_micro").alias("unit_cost_e4"))
        .orderBy("partkey")
        .limit(100)
    )


@register(
    "suppliers_kept_orders_waiting",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END)
               AS n_late_supp
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name,
           count(DISTINCT f.l_orderkey) AS numwait
    FROM flagged f
    JOIN per_order p ON f.l_orderkey = p.l_orderkey
    JOIN supplier ON s_suppkey = f.l_suppkey
    WHERE f.late AND p.n_supp > 1 AND p.n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="Q21 shape (suppliers who kept orders waiting) adapted to "
        "the corpus dates: the sole late supplier in a finished "
        "multi-supplier order. The classic formulation is EXISTS + "
        "NOT EXISTS self-joins on lineitem; Spark-first it collapses "
        "into ONE aggregation per order (distinct suppliers, "
        "distinct late suppliers) joined back to the flagged rows — "
        "two shuffles on l_orderkey replace two self-joins, and the "
        "supplier dimension broadcasts.",
)
def suppliers_kept_orders_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li, orders, supplier = _t(spark, sf_dir, "lineitem", "orders",
                              "supplier")
    flagged = (
        li.join(
            orders.where(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
            .alias("late"),
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    return (
        flagged.where("late")
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supplier),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "window_spend_bands",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    banded AS (
      SELECT c_mktsegment,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             total_spend
      FROM spend
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY total_spend, c_custkey)
    )
    SELECT c_mktsegment, quartile,
           count(*) AS n_customers,
           CAST(sum(CAST(total_spend AS DECIMAL(18,2))) AS DOUBLE)
             AS band_spend,
           round(min(pr), 6) AS min_percent_rank,
           round(max(cd), 6) AS max_cume_dist
    FROM banded
    GROUP BY c_mktsegment, quartile
    """,
    doc="Distribution-ranking window functions in one pass: "
        "ntile(4) spend quartiles per market segment plus "
        "percent_rank / cume_dist over the SAME window spec (one "
        "sort per partition serves all three — Spark plans a single "
        "Window operator). Two-level shape: the fact join collapses "
        "to per-customer spend first, so the ranking window runs "
        "over customers, not orders; total-order tie-break on the "
        "customer key keeps every band boundary engine-identical. "
        "percent_rank/cume_dist are exact rationals of row counts — "
        "rounded only to absorb the division's final-ulp ambiguity.",
)
def window_spend_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust, orders = _t(spark, sf_dir, "customer", "orders")
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(dbl(F.sum(dec("o_totalprice"))).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        "total_spend", "c_custkey"
    )
    banded = spend.select(
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        "total_spend",
    )
    return banded.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dbl(F.sum(dec("total_spend"))).alias("band_spend"),
        F.round(F.min("pr"), 6).alias("min_percent_rank"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
    )
