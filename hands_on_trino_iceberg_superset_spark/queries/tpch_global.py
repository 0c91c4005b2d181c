"""International-trade TPC-H shapes (Q7/Q8/Q9/Q12/Q15/Q20) over the
driver corpus — the multi-dimension snowflake joins (two nation
aliases, region scoping), market-share ratios, profit expressions
spanning fact+dim columns, delay bucketing, and argmax-over-aggregate
selection that round out the §2.4 join surface.

Adaptations to the corpus (no partsupp / shipmode / commitdate
columns, see FIXTURES.md §B):
- Q9's supplycost becomes a retailprice-derived cost proxy.
- Q12's shipmode becomes a ship-delay bucket (days from order to
  ship), crossed with order priority exactly like the original's
  lineitem-priority matrix.
- Q20's availqty threshold becomes a fraction-of-average shipped
  quantity threshold over the same semi-join chain.

Scale notes (100 TB design): every dimension in these queries
(region, nation x2, supplier, part at dim-scale) broadcasts — the
only shuffles are the fact-side aggregations, and the two-phase
partial aggregate bounds the shuffle by group cardinality, not row
count. The nation table is joined TWICE (supplier side and customer
side) via two independent broadcasts, never a self-join shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import _t, dbl, dec

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount"))


@register(
    "nation_pair_trade_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(o.o_orderdate) AS order_year,
           CAST(sum({_REV}) AS DOUBLE) AS volume,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations "
        "by year. The nation dimension participates TWICE (supplier "
        "side, customer side) as two independent broadcast joins; "
        "the symmetric-pair disjunction filters after both joins.",
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        j.where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("o_orderdate").alias("order_year"))
        .agg(
            dbl(F.sum(_rev())).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "nation_market_share",
    oracle=f"""
    SELECT order_year,
           CAST(CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)
                AS DOUBLE) AS market_share,
           CAST(total_rev AS DOUBLE) AS total_revenue
    FROM (
      SELECT year(o.o_orderdate) AS order_year,
             sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV}
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS nation_rev,
             sum({_REV}) AS total_rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA'
      GROUP BY year(o.o_orderdate)
    )
    """,
    doc="TPC-H Q8 shape: one supplier nation's share of a region's "
        "revenue by year — conditional-aggregation ratio over a "
        "5-dim snowflake (region->nation->customer on the demand "
        "side, nation->supplier on the supply side). Both sums "
        "aggregate in decimal; the ratio divides identical doubles "
        "on both engines.",
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, supp, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation", "region"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = region.where(F.col("r_name") == "ASIA").select("r_regionkey")
    rev = _rev()
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    agg = (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(asia), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(nation_rev).alias("nation_rev"),
            F.sum(rev).alias("total_rev"),
        )
    )
    return agg.select(
        "order_year",
        (dbl(F.col("nation_rev")) / dbl(F.col("total_rev")))
        .cast("double").alias("market_share"),
        dbl(F.col("total_rev")).alias("total_revenue"),
    )


@register(
    "nation_product_profit",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           year(o.o_orderdate) AS order_year,
           CAST(sum({_REV}
                    - CAST(0.1 AS DECIMAL(3,1))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q9 shape: product-line profit per supplier nation per "
        "year. supplycost (no partsupp table in the corpus) becomes "
        "a retailprice-derived cost proxy; the profit expression "
        "spans fact and dim columns and stays in decimal end-to-end. "
        "The p_name LIKE filter prunes the broadcast part dim BEFORE "
        "the join, so the fact scan only keeps matching partkeys.",
)
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nation, orders = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    widget = part.where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cost = (
        F.lit("0.1").cast("decimal(3,1)")
        * dec("p_retailprice")
        * dec("l_quantity")
    )
    return (
        li.join(F.broadcast(widget), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy("supp_nation", F.year("o_orderdate").alias("order_year"))
        .agg(dbl(F.sum(_rev() - cost)).alias("profit"))
    )


@register(
    "shipping_delay_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'fast'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60
                THEN 'normal' ELSE 'slow' END AS delay_bucket,
           count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_priority_items,
           count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_priority_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: order-priority counts bucketed by shipping "
        "delay (the corpus has no shipmode column; the delay bucket "
        "plays its role). Conditional counts compile to one partial "
        "aggregate over the join — no per-priority re-scan.",
)
def shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "fast").when(delay <= 60, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.count(F.when(high, 1)).alias("high_priority_items"),
            F.count(F.when(~high, 1)).alias("low_priority_items"),
        )
    )


@register(
    "top_supplier_by_revenue",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey, sum({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           CAST(sr.total_rev AS DOUBLE) AS total_revenue
    FROM srev sr JOIN supplier s ON s.s_suppkey = sr.l_suppkey
    WHERE sr.total_rev = (SELECT max(total_rev) FROM srev)
    """,
    doc="TPC-H Q15 shape: the top supplier by quarterly revenue — "
        "argmax over an aggregate via a scalar subquery on the SAME "
        "aggregate (the original's revenue view). The aggregate "
        "computes once; its 1-row max broadcasts back. Decimal "
        "equality (not double) decides the argmax, so ties are exact.",
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    srev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    best = srev.agg(F.max("total_rev").alias("_best"))
    return (
        srev.join(F.broadcast(best))
        .where(F.col("total_rev") == F.col("_best"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            dbl(F.col("total_rev")).alias("total_revenue"),
        )
    )


@register(
    "overstocked_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey,
             sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS promo_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_name AS supp_name, n.n_name AS supp_nation,
           CAST(sh.promo_qty AS DOUBLE) AS promo_qty
    FROM shipped sh
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE sh.promo_qty * 10 * (SELECT count(*) FROM shipped)
          > (SELECT sum(promo_qty) FROM shipped) * 12
    """,
    doc="TPC-H Q20 shape: suppliers holding excess stock of a part "
        "class — the availqty threshold (no partsupp table) becomes "
        "120% of the mean shipped PROMO quantity, keeping the "
        "aggregate -> scalar-threshold -> dimension semi-join chain. "
        "The 'qty > 1.2 * sum/n' cut is cross-multiplied to "
        "'qty*10*n > sum*12' so BOTH engines compare exact decimals "
        "(DuckDB's avg(DECIMAL) returns DOUBLE, so an avg-based "
        "threshold would round differently per engine and flip "
        "borderline suppliers); only the output casts to double.",
)
def overstocked_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    promo = part.where(F.col("p_type") == "PROMO").select("p_partkey")
    shipped = (
        li.join(F.broadcast(promo), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("promo_qty"))
    )
    thresh = shipped.agg(
        F.sum("promo_qty").alias("_total"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        shipped.join(F.broadcast(thresh))
        .where(
            F.col("promo_qty") * 10 * F.col("_n")
            > F.col("_total") * 12
        )
        .join(F.broadcast(supp.select("s_suppkey", "s_name", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
            dbl(F.col("promo_qty")).alias("promo_qty"),
        )
    )


@register(
    "returned_item_losses",
    oracle=f"""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to "
        "returned items in one quarter. The quarter predicate and "
        "the returnflag filter both push into the fact scans before "
        "the join; customer and nation broadcast; the top-20 "
        "compiles to TakeOrderedAndProject (no global sort), with "
        "c_custkey as the deterministic tiebreak.",
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders, cust, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = li.where(F.col("l_returnflag") == "R")
    return (
        returned.join(o, returned.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select(
            "c_custkey", "c_name", "c_acctbal", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dbl(F.sum(_rev())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                dbl(F.col("c_acctbal")).alias("c_acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
