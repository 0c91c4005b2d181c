"""Reference-parity queries over the seeded tables (SURVEY.md §2.1-2.3).

These exercise the reference's own data model: the five seeded tables
(seed.sh:72-115) and its golden verification query (seed.sh:117-118),
plus the star-schema joins the schema implies (SURVEY.md §2.4).

The DuckDB oracle regenerates the exact same tables from
``generate_series`` with the same fixed ``as_of`` timestamp, so these
queries verify the *seeder* (full expression surface E1-E11) as well
as the queries themselves. Note literal casts to DOUBLE in the oracle:
DuckDB parses ``10.5`` as DECIMAL where Spark parses DOUBLE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
from hands_on_trino_iceberg_superset_spark.seed import (
    seed_frames,
    verification_query,
)

# DuckDB CTE prelude regenerating the seeded tables (formulas cited in
# FIXTURES.md §A; as_of fixed to seed.DEFAULT_AS_OF).
SEED_CTE = """
WITH seed_events AS (
  SELECT n AS id,
         TIMESTAMP '2026-01-01 00:00:00' - (n % 30) * INTERVAL 1 DAY AS ts,
         CASE CAST(n % 5 AS INTEGER) WHEN 0 THEN 'click' WHEN 1 THEN 'purchase'
              WHEN 2 THEN 'view' WHEN 3 THEN 'login' ELSE 'logout' END AS event_type,
         'Event ' || CAST(n AS VARCHAR) AS payload,
         (n % 50) + 1 AS user_id,
         (n * CAST(10.5 AS DOUBLE)) + CAST(100.0 AS DOUBLE) AS amount
  FROM generate_series(1, 200) AS t(n)
), seed_users AS (
  SELECT n AS user_id,
         'user' || CAST(n AS VARCHAR) AS username,
         'user' || CAST(n AS VARCHAR) || '@example.com' AS email,
         TIMESTAMP '2026-01-01 00:00:00' - (n % 90) * INTERVAL 1 DAY AS created_at,
         CASE CAST(n % 10 AS INTEGER) WHEN 0 THEN 'US' WHEN 1 THEN 'UK' WHEN 2 THEN 'DE'
              WHEN 3 THEN 'FR' WHEN 4 THEN 'CA' WHEN 5 THEN 'AU' WHEN 6 THEN 'JP'
              WHEN 7 THEN 'BR' WHEN 8 THEN 'IN' ELSE 'MX' END AS country,
         n % 3 != 0 AS active
  FROM generate_series(1, 50) AS t(n)
), seed_orders AS (
  SELECT n AS order_id, (n % 50) + 1 AS user_id, (n % 20) + 1 AS product_id,
         CAST((n % 5) + 1 AS INTEGER) AS quantity,
         (n * CAST(15.75 AS DOUBLE)) + CAST(50.0 AS DOUBLE) AS price,
         TIMESTAMP '2026-01-01 00:00:00' - (n % 60) * INTERVAL 1 DAY AS order_date,
         CASE CAST(n % 4 AS INTEGER) WHEN 0 THEN 'completed' WHEN 1 THEN 'pending'
              WHEN 2 THEN 'shipped' ELSE 'cancelled' END AS status
  FROM generate_series(1, 150) AS t(n)
), seed_products AS (
  SELECT n AS product_id, 'Product ' || CAST(n AS VARCHAR) AS name,
         CASE CAST(n % 5 AS INTEGER) WHEN 0 THEN 'Electronics' WHEN 1 THEN 'Clothing'
              WHEN 2 THEN 'Books' WHEN 3 THEN 'Home' ELSE 'Sports' END AS category,
         (n * CAST(25.50 AS DOUBLE)) + CAST(10.0 AS DOUBLE) AS price,
         CAST((n * 10) + 50 AS INTEGER) AS stock,
         TIMESTAMP '2026-01-01 00:00:00' - n * INTERVAL 1 DAY AS created_at
  FROM generate_series(1, 20) AS t(n)
), seed_transactions AS (
  SELECT n AS transaction_id, (n % 50) + 1 AS user_id,
         (n * CAST(12.34 AS DOUBLE)) + CAST(5.0 AS DOUBLE) AS amount,
         CASE CAST(n % 3 AS INTEGER) WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'GBP' END AS currency,
         CASE CAST(n % 3 AS INTEGER) WHEN 0 THEN 'payment' WHEN 1 THEN 'refund' ELSE 'transfer' END AS transaction_type,
         TIMESTAMP '2026-01-01 00:00:00' - (n % 720) * INTERVAL 1 HOUR AS "timestamp",
         CASE CAST(n % 10 AS INTEGER) WHEN 0 THEN 'failed' ELSE 'success' END AS status
  FROM generate_series(1, 300) AS t(n)
)
"""


@register(
    "ref_golden_counts",
    oracle=SEED_CTE
    + """
    SELECT 'events' AS table_name, count(*) AS n_rows FROM seed_events
    UNION ALL SELECT 'orders', count(*) FROM seed_orders
    UNION ALL SELECT 'products', count(*) FROM seed_products
    UNION ALL SELECT 'transactions', count(*) FROM seed_transactions
    UNION ALL SELECT 'users', count(*) FROM seed_users
    ORDER BY table_name
    """,
    doc="The reference's golden verification query (seed.sh:117-118): "
        "expected events=200 orders=150 products=20 transactions=300 users=50.",
)
def ref_golden_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return verification_query(seed_frames(spark))


@register(
    "ref_events_full",
    oracle=SEED_CTE
    + """
    SELECT id AS id, CAST(ts AS VARCHAR) AS ts, event_type AS event_type,
           payload AS payload, user_id AS user_id, amount AS amount
    FROM seed_events
    """,
    doc="Full-table golden over seeded events: verifies every seeder "
        "expression (E1-E11) value-for-value, 200 rows.",
)
def ref_events_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = seed_frames(spark)["events"]
    return ev.select(
        "id",
        F.col("ts").cast("string").alias("ts"),
        "event_type",
        "payload",
        "user_id",
        "amount",
    )


@register(
    "ref_event_type_stats",
    oracle=SEED_CTE
    + """
    SELECT event_type AS event_type, count(*) AS n_events,
           CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
    FROM seed_events GROUP BY event_type
    """,
    doc="Grouped aggregation over seeded events.",
)
def ref_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = seed_frames(spark)["events"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dbl(F.sum(dec("amount"))).alias("total_amount"),
    )


@register(
    "ref_country_revenue",
    oracle=SEED_CTE
    + """
    SELECT u.country AS country, count(*) AS n_tx,
           CAST(sum(CAST(t.amount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM seed_transactions t
    JOIN seed_users u ON t.user_id = u.user_id
    WHERE t.status = 'success'
    GROUP BY u.country
    """,
    doc="Star-schema join implied by the reference FKs (seed.sh:115 -> :85): "
        "successful transaction revenue by user country; users broadcast.",
)
def ref_country_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = seed_frames(spark)
    tx, users = frames["transactions"], frames["users"]
    return (
        tx.where(F.col("status") == "success")
        .join(F.broadcast(users), "user_id")
        .groupBy("country")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            dbl(F.sum(dec("amount"))).alias("revenue"),
        )
    )


@register(
    "ref_category_sales",
    oracle=SEED_CTE
    + """
    SELECT p.category AS category, count(*) AS n_orders,
           CAST(sum(o.quantity) AS BIGINT) AS total_qty,
           CAST(sum(CAST(o.price AS DECIMAL(18,2)) * o.quantity) AS DOUBLE)
             AS total_value
    FROM seed_orders o
    JOIN seed_products p ON o.product_id = p.product_id
    WHERE o.status != 'cancelled'
    GROUP BY p.category
    """,
    doc="orders x products star join (FK seed.sh:95 -> :105) with "
        "derived measure price*quantity.",
)
def ref_category_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = seed_frames(spark)
    orders, products = frames["orders"], frames["products"]
    return (
        orders.where(F.col("status") != "cancelled")
        .join(F.broadcast(products), "product_id")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("quantity").alias("total_qty"),
            # both tables carry a `price` column — qualify the fact side
            dbl(F.sum(dec(orders["price"]) * F.col("quantity"))).alias(
                "total_value"
            ),
        )
    )


@register(
    "ref_active_users_recent_events",
    oracle=SEED_CTE
    + """
    SELECT u.country AS country,
           count(DISTINCT u.user_id) AS n_users,
           count(e.id) AS n_events
    FROM seed_users u
    LEFT JOIN seed_events e
      ON e.user_id = u.user_id
     AND e.ts >= TIMESTAMP '2026-01-01 00:00:00' - 7 * INTERVAL 1 DAY
    WHERE u.active
    GROUP BY u.country
    """,
    doc="LEFT JOIN + boolean filter + interval arithmetic over the "
        "seeded tables (reserved-word-safe timestamp handling).",
)
def ref_active_users_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.seed import DEFAULT_AS_OF

    frames = seed_frames(spark)
    users, events = frames["users"], frames["events"]
    # cutoff derives from the seeder's single as_of source of truth
    # (the oracle SQL hardcodes the same literal by necessity — a
    # constant drift there fails the differential loudly)
    cutoff = F.lit(DEFAULT_AS_OF).cast("timestamp_ntz") - F.make_dt_interval(
        days=F.lit(7)
    )
    recent = events.where(F.col("ts") >= cutoff)
    return (
        users.where(F.col("active"))
        .join(F.broadcast(recent), users.user_id == recent.user_id, "left")
        .groupBy("country")
        .agg(
            F.countDistinct(users.user_id).alias("n_users"),
            F.count(F.col("id")).alias("n_events"),
        )
    )
