"""Event-stream analytics (batch semantics; SURVEY.md §2.5 streaming
seam).

The ``events`` table is the reference's append-shaped stream
(seed.sh:72: id/ts/event_type/payload/user_id/amount; the driver
corpus adds value/props). These queries are the batch statements of
the windowed/sessionized semantics that ``streaming/`` re-runs as
Structured Streaming — same results, incremental execution.

Timestamp discipline: comparisons and gap arithmetic use microsecond
longs (``unix_micros`` / DuckDB ``epoch_us``), the shared precision
after both engines truncate the file's nanosecond physical type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
from hands_on_trino_iceberg_superset_spark.sources import load_table


@register(
    "events_hourly_activity",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    doc="Tumbling-window aggregation (batch form): hourly event "
        "counts, distinct users, value sum.",
)
def events_hourly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("_h"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dbl(F.sum(dec("value"))).alias("total_value"),
        )
        .select(F.col("_h").cast("string").alias("hour"), "n_events", "n_users", "total_value")
    )


@register(
    "events_props_extraction",
    oracle=r"""
    SELECT k_bucket AS k_bucket, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10
               AS k_bucket,
             value
      FROM events
    )
    GROUP BY k_bucket
    """,
    doc="Semi-structured payload extraction: regexp over the JSON-ish "
        "props column, bucketed aggregation.",
)
def events_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("value"))).alias("total_value"),
        )
    )


@register(
    "events_sessionization",
    oracle="""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us >= 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    )
    SELECT user_id AS user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    doc="Sessionization: 30-minute inactivity gap splits sessions "
        "(lag window + conditional sum). Batch form of the "
        "session-window streaming operator — same boundary rule "
        "(a gap of EXACTLY 30min starts a new session: "
        "session_window ends are exclusive).",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        F.when(
            F.lag(ts_us).over(w).isNull()
            | ((ts_us - F.lag(ts_us).over(w)) >= gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_type_daily_matrix",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="Pivot via conditional aggregation: per-day event-type matrix.",
)
def events_type_daily_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return (
        ev.groupBy(F.col("ts").cast("date").alias("_d"))
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
        .select(F.col("_d").cast("string").alias("day"), "n_click", "n_view",
                "n_purchase", "n_signup", "n_error")
    )


@register(
    "events_user_value_rank",
    oracle="""
    SELECT * FROM (
      SELECT user_id AS user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             count(*) AS n_events,
             dense_rank() OVER (
               ORDER BY CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) DESC,
                        user_id) AS value_rank
      FROM events GROUP BY user_id
    ) WHERE value_rank <= 20
    """,
    doc="Aggregate-then-window: top-20 users by total event value "
        "(dense_rank over an aggregated relation).",
)
def events_user_value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        dbl(F.sum(dec("value"))).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.desc("total_value"), F.asc("user_id"))
    return agg.select(
        "user_id", "total_value", "n_events",
        F.dense_rank().over(w).alias("value_rank"),
    ).where(F.col("value_rank") <= 20)


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction from the props payload column "
        "(get_json_object -> JVM-side JSON parse), aggregated per "
        "event type.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


@register(
    "events_asof_last_click",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
             event_type
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(c_id IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, side, event_id
               ROWS UNBOUNDED PRECEDING) AS last_click_id
      FROM u
    )
    SELECT event_id AS purchase_id, user_id,
           epoch_us(ts) AS purchase_ts_us, last_click_id
    FROM w WHERE event_type = 'purchase'
    """,
    doc="As-of join (union + last-value carry-forward, single "
        "shuffle): each purchase paired with the user's most recent "
        "click at-or-before it. operators/asof.py.",
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ats"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_id").alias("_evt_tb"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ats"),
        F.col("event_id").alias("last_click_id"),
        F.col("event_id").alias("_evt_tb"),
    )
    out = asof_join(
        purchases, clicks, on="user_id", order_col="ats",
        carry_cols=["last_click_id"], tiebreak_col="_evt_tb",
    )
    return out.select(
        "purchase_id", "user_id",
        F.unix_micros(F.col("ats").cast("timestamp")).alias("purchase_ts_us"),
        "last_click_id",
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    WHERE a.day - f.cohort_day <= 7
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users grouped by first-activity day, "
        "distinct-active counts at day offsets 0..7 — the standard "
        "product-analytics triangle. Plan: activity distinct "
        "shuffles on (user, day); the per-user first-day aggregate "
        "(one row per user) BROADCASTS into the join, so the "
        "activity side never re-shuffles; one final (cohort, offset) "
        "aggregation.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day"))
    activity = days.distinct()
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    offset = F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint")
    return (
        activity.join(firsts, "user_id")
        .where(offset <= 7)
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            offset.alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, CAST(1 AS INT) AS step_order,
           count(*) AS n_users FROM s1
    UNION ALL
    SELECT 'click', 2, count(*) FROM s2
    UNION ALL
    SELECT 'purchase', 3, count(*) FROM s3
    """,
    doc="Ordered conversion funnel (view -> click -> purchase): a "
        "user advances a step only with an event strictly AFTER "
        "their first event of the previous step. Spark-first this is "
        "ONE shuffle on user_id: three chained whole-partition "
        "window mins (first_view, then first-click-after-view, then "
        "first-purchase-after-click) — each a running MIN, never a "
        "collected per-user event array, so a skewed key (a bot with "
        "10^8 clicks in a 100 TB log) costs a big sortable partition "
        "but never an unbounded in-memory aggregation buffer; no "
        "self-joins.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).where(F.col("event_type").isin("view", "click", "purchase"))
    w = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(w)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("us") > F.col("t1")),
            F.col("us"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("us") > F.col("t2")),
            F.col("us"),
        )
    ).over(w)
    funnel = (
        staged.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(
            F.first("t1").alias("t1"),
            F.first("t2").alias("t2"),
            F.first("t3").alias("t3"),
        )
    )
    counts = funnel.agg(
        F.count("t1").alias("n1"),
        F.count(F.when(F.col("t1").isNotNull(), F.col("t2"))).alias("n2"),
        F.count(
            F.when(F.col("t1").isNotNull() & F.col("t2").isNotNull(),
                   F.col("t3"))
        ).alias("n3"),
    )
    return counts.selectExpr(
        "stack(3, 'view', 1, n1, 'click', 2, n2, 'purchase', 3, n3) "
        "AS (step, step_order, n_users)"
    ).select(
        "step", F.col("step_order").cast("int").alias("step_order"),
        F.col("n_users").cast("long").alias("n_users"),
    )


@register(
    "events_daily_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    spine AS (
      SELECT CAST(g AS DATE) AS d FROM (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS g
        FROM bounds
      )
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n_events,
             max(value) AS day_max
      FROM events
      WHERE event_type = 'purchase' AND value >= 300
      GROUP BY 1
    )
    SELECT CAST(s.d AS VARCHAR) AS day,
           CAST(coalesce(n.n_events, 0) AS BIGINT) AS n_events,
           n.day_max AS day_max,
           last_value(n.day_max IGNORE NULLS) OVER (
             ORDER BY s.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_max,
           n.day_max IS NULL AS is_gap
    FROM spine s LEFT JOIN daily n ON n.d = s.d
    """,
    doc="Time-series GAP FILLING over a sparse event slice (the "
        "date-spine pattern every observability/BI stack needs): "
        "high-value purchase days are sparse, so the calendar spine "
        "— sequence(min_day, max_day) exploded from one aggregate "
        "row — left-joins the daily aggregate, counts fill as 0, and "
        "the last observed daily max CARRIES FORWARD through gap "
        "days (last_value IGNORE NULLS). Scale shape: the corpus "
        "collapses in the daily pre-aggregate first; the spine and "
        "the ordered carry-forward window run over DAYS (thousands "
        "of rows for decades), never over events — the one global "
        "window is spine-sized by construction. day_max is a picked "
        "element (max), not a float sum, so every value is "
        "bit-exact.",
)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("event_type") == "purchase")
                 & (F.col("value") >= 300))
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("value").alias("day_max"))
    )
    spine = (
        ev.agg(F.min(F.col("ts").cast("date")).alias("lo"),
               F.max(F.col("ts").cast("date")).alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    w = (Window.orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        spine.join(daily, "d", "left")
        .select(
            F.col("d").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0)).cast("bigint")
            .alias("n_events"),
            F.col("day_max"),
            F.last("day_max", ignorenulls=True).over(w)
            .alias("filled_max"),
            F.col("day_max").isNull().alias("is_gap"),
        )
    )


@register(
    "events_value_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS daily_total
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             round(quantile_cont(daily_total, 0.5), 6) AS med
      FROM daily GROUP BY 1
    ),
    dev AS (
      SELECT d.*, m.med,
             abs(d.daily_total - m.med) AS deviation
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type,
             round(quantile_cont(deviation, 0.5), 6) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.day, d.daily_total, d.med, d.deviation,
           a.mad,
           d.deviation > CAST(3 AS DOUBLE) * a.mad AS is_anomaly
    FROM dev d JOIN mad a ON d.event_type = a.event_type
    """,
    doc="Robust anomaly detection (median/MAD, the outlier-resistant "
        "z-score): daily revenue per event type scored against its "
        "type's median absolute deviation — mean/stddev would let "
        "one extreme day inflate its own threshold, the classic "
        "data-quality monitoring trap. Scale shape: the event stream "
        "collapses to the (type x day) grain in ONE shuffle; the "
        "exact interpolated medians (F.percentile / quantile_cont, "
        "rounded at 6 like order_value_percentiles) and both "
        "re-joins run on day-grain rows — thousands for decades of "
        "data — with the tiny per-type stats broadcast back. "
        "Deviations are float64 over a ROUNDED median so both "
        "engines feed the MAD percentile identical inputs.",
)
def events_value_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").cast("string").alias("day"),
    ).agg(dbl(F.sum(dec("value"))).alias("daily_total"))
    med = daily.groupBy("event_type").agg(
        F.round(F.percentile("daily_total", F.lit(0.5)), 6).alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "deviation", F.abs(F.col("daily_total") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("deviation", F.lit(0.5)), 6).alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type", "day", "daily_total", "med", "deviation", "mad",
        (F.col("deviation") > F.lit(3).cast("double") * F.col("mad"))
        .alias("is_anomaly"),
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type) AS p
    FROM trans
    """,
    doc="First-order Markov TRANSITION MATRIX over per-user event "
        "sequences (the model behind user-journey Sankey diagrams "
        "and next-action prediction baselines): lead() pairs each "
        "event with its user's next one, transition counts "
        "aggregate, and each row-probability normalizes by its "
        "from-state total. Scale shape: ONE shuffle on user_id for "
        "the sequence window, then everything lives on the "
        "(types x types) grid — 25 rows here, bounded by the type "
        "vocabulary at any corpus size; the normalizing window runs "
        "on that grid, never on events. Counts are exact integers, "
        "so every probability divides bit-identically.",
)
def events_transition_matrix(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return trans.select(
        "from_type", "to_type", "n",
        (F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    )


@register(
    "events_engagement_ratios",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    spine AS (SELECT DISTINCT d FROM user_days),
    wau AS (
      SELECT s.d, count(DISTINCT u.user_id) AS wau
      FROM spine s JOIN user_days u
        ON u.d <= s.d AND u.d > s.d - INTERVAL 7 DAY
      GROUP BY s.d
    ),
    dau AS (SELECT d, count(*) AS dau FROM user_days GROUP BY d)
    SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
    doc="Engagement ratios (DAU / trailing-7-day WAU / stickiness = "
        "DAU/WAU — the growth metric every product dashboard "
        "carries): the event stream collapses to DISTINCT "
        "(user, day) rows in ONE shuffle — the only event-sized "
        "work — and the trailing window is LINEARIZED, never a "
        "range join: each user-day explodes into the 7 spine days "
        "it covers (a fixed 7x fan-out) and WAU is an equi-keyed "
        "distinct count, the same bucketize-don't-theta-join rule "
        "as range_bucket_join (plan-gated: no nested-loop join). "
        "Counts are exact integers; stickiness divides once as f64.",
)
def events_engagement_ratios(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    spine = user_days.select("d").distinct()
    wau = _trailing_active_users(user_days, spine, 7, "wau")
    dau = user_days.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "d").select(
        F.col("d").cast("string").alias("day"),
        "dau", "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


def _trailing_active_users(
    user_days: DataFrame, spine: DataFrame, n_days: int, label: str
) -> DataFrame:
    """Distinct users active in the trailing ``n_days`` window ending
    on each spine day — LINEARIZED: a user-day covers the next
    ``n_days`` spine days (fixed n-fold explode + equi semi-join),
    never an O(user_days x spine) theta join. The fan-out factor is
    the window length, a constant — at 100 TB the only event-sized
    work remains the one distinct-(user, day) shuffle upstream."""
    coverage = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), n_days - 1))
        ).alias("d"),
    )
    return (
        coverage.join(spine, "d", "left_semi")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias(label))
    )


@register(
    "events_engagement_mau",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    spine AS (SELECT DISTINCT d FROM user_days),
    wau AS (
      SELECT s.d, count(DISTINCT u.user_id) AS wau
      FROM spine s JOIN user_days u
        ON u.d <= s.d AND u.d > s.d - INTERVAL 7 DAY
      GROUP BY s.d
    ),
    mau AS (
      SELECT s.d, count(DISTINCT u.user_id) AS mau
      FROM spine s JOIN user_days u
        ON u.d <= s.d AND u.d > s.d - INTERVAL 28 DAY
      GROUP BY s.d
    ),
    dau AS (SELECT d, count(*) AS dau FROM user_days GROUP BY d)
    SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, wau.wau, mau.mau,
           CAST(dau.dau AS DOUBLE) / mau.mau AS dau_over_mau,
           CAST(wau.wau AS DOUBLE) / mau.mau AS wau_over_mau
    FROM dau JOIN wau ON dau.d = wau.d JOIN mau ON dau.d = mau.d
    """,
    doc="The N-day generalization of events_engagement_ratios: DAU / "
        "trailing-7-day WAU / trailing-28-day MAU plus the DAU/MAU "
        "and WAU/MAU stickiness ratios every growth dashboard "
        "carries. Both trailing windows share one linearization "
        "helper (_trailing_active_users): a fixed N-fold explode + "
        "equi semi-join — the fan-out is 28x on the DISTINCT "
        "(user, day) frame, never a theta join on the event stream "
        "(plan-gated alongside the 7-day query: zero nested-loop "
        "joins at any N). The oracle states both windows as range "
        "predicates, so the linearization itself is hash-gated. "
        "Exact-integer ratios divide once as f64.",
)
def events_engagement_mau(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    spine = user_days.select("d").distinct()
    wau = _trailing_active_users(user_days, spine, 7, "wau")
    mau = _trailing_active_users(user_days, spine, 28, "mau")
    dau = user_days.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "d").join(mau, "d")
        .select(
            F.col("d").cast("string").alias("day"),
            "dau", "wau", "mau",
            (F.col("dau").cast("double") / F.col("mau"))
            .alias("dau_over_mau"),
            (F.col("wau").cast("double") / F.col("mau"))
            .alias("wau_over_mau"),
        )
    )


@register(
    "events_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS a FROM events),
    pu AS (
      SELECT user_id,
             max(CAST(ts AS DATE)) AS last_d,
             count(*) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    rfm AS (
      SELECT user_id,
             date_diff('day', last_d, (SELECT a FROM anchor))
               AS recency_days,
             frequency, monetary
      FROM pu
    ),
    q AS (
      SELECT *,
             ntile(4) OVER (ORDER BY recency_days DESC, user_id)
               AS r_q,
             ntile(4) OVER (ORDER BY frequency, user_id) AS f_q,
             ntile(4) OVER (ORDER BY monetary, user_id) AS m_q
      FROM rfm
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_q, f_q, m_q,
           r_q * 100 + f_q * 10 + m_q AS rfm_score,
           CASE WHEN r_q = 4 AND f_q = 4 THEN 'champion'
                WHEN f_q >= 3 AND r_q >= 3 THEN 'loyal'
                WHEN r_q <= 2 AND f_q >= 3 THEN 'at_risk'
                WHEN r_q <= 2 AND f_q <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM q
    """,
    doc="RFM customer segmentation (recency / frequency / monetary "
        "quartiles + the classic champion/loyal/at_risk/hibernating "
        "labels) over purchase events — the lifecycle-marketing "
        "query every events warehouse serves. The event-sized work "
        "is ONE groupBy to the user grain (recency vs the corpus "
        "max-date anchor, a broadcast one-row aggregate — the "
        "documented singleton-crossJoin shape, never a global "
        "window over events); the three ntile(4) windows then run "
        "over user-grain rows with unique (metric, user_id) "
        "ordering, so quartile assignment is deterministic on both "
        "engines. At 100 TB the ntile step is the one to swap for "
        "approx-percentile cutoffs; everything upstream is linear. "
        "Monetary aggregates in DECIMAL, cast once to DOUBLE.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("a"))
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            dbl(F.sum(dec("value"))).alias("monetary"),
        )
    )
    rfm = (
        pu.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("a", "last_d").alias("recency_days"),
            "frequency", "monetary",
        )
    )
    r_q = F.ntile(4).over(
        Window.orderBy(F.desc("recency_days"), F.asc("user_id")))
    f_q = F.ntile(4).over(
        Window.orderBy(F.asc("frequency"), F.asc("user_id")))
    m_q = F.ntile(4).over(
        Window.orderBy(F.asc("monetary"), F.asc("user_id")))
    q = rfm.select("*", r_q.alias("r_q"), f_q.alias("f_q"),
                   m_q.alias("m_q"))
    seg = (
        F.when((F.col("r_q") == 4) & (F.col("f_q") == 4), "champion")
        .when((F.col("f_q") >= 3) & (F.col("r_q") >= 3), "loyal")
        .when((F.col("r_q") <= 2) & (F.col("f_q") >= 3), "at_risk")
        .when((F.col("r_q") <= 2) & (F.col("f_q") <= 2),
              "hibernating")
        .otherwise("regular")
    )
    return q.select(
        "user_id", "recency_days", "frequency", "monetary",
        "r_q", "f_q", "m_q",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .alias("rfm_score"),
        seg.alias("segment"),
    )


@register(
    "events_top_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id)
    ),
    paths AS (
      SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path,
             count(*) AS n_walks,
             count(DISTINCT user_id) AS n_users
      FROM ordered WHERE t3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n_walks, n_users, rank FROM (
      SELECT *, row_number() OVER (ORDER BY n_walks DESC, path)
               AS rank
      FROM paths
    ) WHERE rank <= 10
    """,
    doc="Top-10 three-step behavioral paths (the Sankey/path-"
        "exploration query behind every product-analytics flow "
        "view): per-user event streams ordered on the shared "
        "microsecond precision (unix_micros / epoch_us, event_id "
        "tie-break — the events_sessionization discipline), "
        "consecutive triples via two lead() offsets in ONE window "
        "pass, then a path-grain count + walk-count top-10 "
        "(deterministic path tie-break). The only event-sized work "
        "is the per-user sort window; the path grid is "
        "|event_types|^3-bounded, so the ranking is metadata-sized "
        "at any corpus scale. Generalizes events_transition_matrix "
        "(first-order) to third order.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    tripled = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    paths = (
        tripled.select(
            F.concat_ws(" > ", "t1", "t2", "t3").alias("path"),
            "user_id",
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_walks"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    wr = Window.orderBy(F.desc("n_walks"), F.asc("path"))
    return (
        paths.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 10)
    )


@register(
    "sql_events_asof",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
             event_type
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(c_id IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, side, event_id
               ROWS UNBOUNDED PRECEDING) AS last_click_id
      FROM u
    )
    SELECT event_id AS purchase_id, user_id,
           epoch_us(ts) AS purchase_ts_us, last_click_id
    FROM w WHERE event_type = 'purchase'
    """,
    doc="The as-of join reached from PLAIN SQL — the table-function "
        "seam (engine.py:_resolve_table_functions) extended to the "
        "EVENTS family, its last Python-only workhorse: Engine.sql "
        "resolves TABLE(asof_join(left => ..., right => ..., "
        "on => ..., order_col => ..., carry_cols => ..., "
        "tiebreak_col => ...)) onto operators/asof.asof_join, so a "
        "wire client or BI virtual dataset pairs each purchase with "
        "the user's most recent at-or-before click with no Python "
        "API in the loop. The physical plan keeps the operator's "
        "shape through the SQL path — union + last-value "
        "carry-forward in ONE window shuffle, NO join node at all "
        "(plan-gated in tests/test_plans.py; a per-row range join "
        "would be the quadratic shape this operator exists to "
        "avoid). Same fixture and oracle as events_asof_last_click.",
)
def sql_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine

    ev = load_table(spark, sf_dir, "events")
    ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ats"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_id").alias("_evt_tb"),
    ).createOrReplaceTempView("sql_asof_purchases_v")
    ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ats"),
        F.col("event_id").alias("last_click_id"),
        F.col("event_id").alias("_evt_tb"),
    ).createOrReplaceTempView("sql_asof_clicks_v")
    return Engine(spark).sql(
        "SELECT purchase_id, user_id, "
        "unix_micros(CAST(ats AS TIMESTAMP)) AS purchase_ts_us, "
        "last_click_id "
        "FROM TABLE(asof_join(left => 'sql_asof_purchases_v', "
        "right => 'sql_asof_clicks_v', on => 'user_id', "
        "order_col => 'ats', carry_cols => 'last_click_id', "
        "tiebreak_col => '_evt_tb'))"
    )
