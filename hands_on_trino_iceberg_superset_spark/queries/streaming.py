"""Inventory entries for the stream/batch-unified transforms
(streaming/pipeline.py). Each runs the SAME function the streaming
pipeline uses, in batch mode — so the oracle checks the transform
itself, and tests/test_streaming.py separately proves
stream-output == batch-output on identical input.

Session/window bounds are emitted as microsecond longs (the shared
precision across Spark / DuckDB after ns truncation) where raw
timestamps would risk string-format drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.text import _SW_SQL
from hands_on_trino_iceberg_superset_spark.sources import load_table
from hands_on_trino_iceberg_superset_spark.streaming import (
    sessionize,
    windowed_event_stats,
)

_SIX_H_US = 6 * 3600 * 1_000_000
_GAP_US = 30 * 60 * 1_000_000


@register(
    "stream_tumbling_window_stats",
    oracle=f"""
    SELECT CAST(make_timestamp((epoch_us(ts) // {_SIX_H_US}) * {_SIX_H_US})
                AS VARCHAR) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 6h event-time window x event_type via F.window — "
        "the exact transform streaming/pipeline.py runs incrementally "
        "with a watermark (epoch-aligned windows on both engines).",
)
def stream_tumbling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windowed_event_stats(ev, window_duration="6 hours").select(
        F.col("window_start").cast("string").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(epoch_us(ts)) AS session_start_us,
           max(epoch_us(ts)) + {_GAP_US} AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="Per-user session windows (30 min gap) via F.session_window — "
        "Spark-native dynamic-gap sessionization; oracle restates it "
        "as gaps-and-islands SQL. session_end = last event + gap.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap="30 minutes").select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp"))
        .alias("session_start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp"))
        .alias("session_end_us"),
        "n_events",
        "total_value",
    )


_THREE_H_US = 3 * 3600 * 1_000_000


@register(
    "stream_sliding_window_stats",
    oracle=f"""
    SELECT CAST(make_timestamp(
             ((epoch_us(ts) - off.o * {_THREE_H_US}) // {_SIX_H_US})
             * {_SIX_H_US} + off.o * {_THREE_H_US}) AS VARCHAR)
             AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events, (SELECT unnest([0, 1]) AS o) off
    GROUP BY 1
    """,
    doc="Sliding event-time window (6h window, 3h slide) — the SAME "
        "streaming/pipeline.windowed_event_stats transform the "
        "tumbling query runs, with a slide_duration; every event "
        "lands in window/slide = 2 windows; oracle replicates each "
        "row per slide offset and re-buckets.",
)
def stream_sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (
        windowed_event_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        windowed_event_stats(
            ev, "6 hours", slide_duration="3 hours", by_type=False
        )
        .select(
            F.col("window_start").cast("string").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_click_to_purchase",
    oracle="""
    SELECT a.user_id AS user_id,
           a.event_id AS first_event_id,
           b.event_id AS then_event_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_us,
           CAST(b.value AS DOUBLE) AS then_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts > a.ts
     AND epoch_us(b.ts) <= epoch_us(a.ts) + CAST(3600 AS BIGINT) * 1000000
    """,
    doc="Funnel correlation: click -> purchase by the same user "
        "within 1h — equi + time-range (interval) join; the batch "
        "statement of the stream-stream join in streaming/pipeline.",
)
def stream_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (
        correlate_events,
    )

    ev = load_table(spark, sf_dir, "events")
    return correlate_events(ev, within="1 hour")


@register(
    "stream_dedup_events",
    oracle="""
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    doc="Redelivery dedup (streaming/pipeline.dedup_event_stream, "
        "batch path of the unified call site): the input is the "
        "events feed plus a re-delivered third of it (every transport "
        "redelivers); dropping duplicate event_ids must restore the "
        "original feed exactly — per-type counts equal the clean "
        "source. The streaming path (dropDuplicatesWithinWatermark, "
        "watermark-bounded state) is parity-tested in "
        "tests/test_streaming.py.",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.streaming import (
        dedup_event_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    redelivered = ev.where(F.col("event_id") % 3 == 0)
    feed = ev.unionByName(redelivered)
    return dedup_event_stream(feed).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "stream_merge_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_ns(ts) DESC, event_id DESC,
                        event_type DESC, value DESC
             ) AS rn
      FROM events
    )
    SELECT user_id, event_type AS last_event_type,
           CAST(value AS DOUBLE) AS last_value
    FROM ranked WHERE rn = 1
    """,
    doc="Streaming MERGE (CDC-style lakehouse ingest): a REAL "
        "Structured Streaming query reads the event log and "
        "foreachBatch-MERGEs it into a copy-on-write VersionedTable "
        "keyed by user_id — in-batch duplicate keys resolve by the "
        "deterministic last-writer tiebreak (max ts_ns, then full "
        "column ordering), which is what makes crash-replayed "
        "batches idempotent. Returns the final table state; the "
        "oracle computes the same last-writer row per user with a "
        "window. streaming/pipeline.py:stream_merge_into.",
)
def stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from hands_on_trino_iceberg_superset_spark.lakehouse import VersionedTable
    from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (
        stream_merge_into,
    )

    def build() -> VersionedTable:
        # tiebreak on MICROSECOND-truncated time: the oracle's
        # epoch_ns(ts) is what DuckDB reads from the nanos parquet —
        # truncated to micros — so ordering by raw ts_ns would
        # resolve same-microsecond collisions differently per engine
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            (F.col("ts_ns") - F.pmod(F.col("ts_ns"), F.lit(1000)))
            .alias("ts_ns"),
            "event_id", "event_type", "value",
        )
        tmp = tempfile.mkdtemp(prefix="stream_merge_q_")
        target = ev.select("user_id").distinct().select(
            "user_id",
            F.lit("seed").alias("last_event_type"),
            F.lit(0.0).alias("last_value"),
        )
        table = VersionedTable.create(
            spark, os.path.join(tmp, "t"), target
        )
        # zero-copy source (r15 optimization round): the CDC batch is
        # a deterministic projection over the events parquet, so the
        # r14 projected-scan gate streams the table's OWN files with
        # the projection re-applied — the fixture used to rewrite the
        # full event log to a temp dir just to stream it back. The
        # snapshot copy remains as the refusal fallback.
        from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (
            streamable_projected_scan,
        )

        stream = streamable_projected_scan(ev)
        if stream is None:
            src = os.path.join(tmp, "src")
            ev.write.mode("overwrite").parquet(src)
            stream = (
                spark.readStream.schema(
                    "user_id long, ts_ns long, event_id long, "
                    "event_type string, value double"
                ).parquet(src)
            )
        q = stream_merge_into(
            stream, table, on="user_id",
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            when_matched_update={
                "last_event_type": "s.event_type",
                "last_value": "s.value",
            },
            tiebreak_col="ts_ns",
        )
        q.processAllAvailable()
        q.stop()
        return table

    # memoized per (app, sf_dir): each invocation used to re-copy the
    # events table + checkpoint into a fresh never-cleaned temp dir
    key = (spark.sparkContext.applicationId, sf_dir, "stream_merge")
    table = _MERGE_CACHE.get(key)
    if table is None or not __import__("os").path.isdir(table.path):
        # evict entries bound to other (stopped) sessions — same
        # policy as _LOAD_CACHE in sources/tpch.py
        for k in [k for k in _MERGE_CACHE if k[0] != key[0]]:
            del _MERGE_CACHE[k]
        table = build()
        _MERGE_CACHE[key] = table
    return table.read()


_MERGE_CACHE: dict = {}


@register(
    "stream_document_quality",
    oracle=f"""
    WITH s AS (
      SELECT source, n_tokens,
             CASE WHEN n_tokens >= 20 AND n_types * 2 >= n_tokens
                   AND n_stop > 0 THEN 1 ELSE 0 END AS ok
      FROM (
        SELECT source,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_types,
               len(list_filter(string_split(text, ' '),
                               t -> t IN {_SW_SQL})) AS n_stop
        FROM documents
      )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ok) AS BIGINT) AS n_pass,
           CAST(count(*) - sum(ok) AS BIGINT) AS n_fail,
           round(sum(ok) / count(*), 6) AS pass_rate,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY source
    """,
    doc="Streaming corpus-intake quality gate "
        "(streaming/pipeline.py document_quality_stats): per-source "
        "pass/fail counts under the text-quality cut, written once "
        "for batch AND streaming (unified API) — the stream version "
        "runs the identical transform over a file-source of arriving "
        "document dumps with state bounded by the domain count (no "
        "watermark needed for a stateless-score + small-key "
        "aggregate), parity-tested in tests/test_streaming.py. The "
        "inventory entry evaluates the batch side; the oracle "
        "recomputes the gate from scratch.",
)
def stream_document_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.streaming import (
        document_quality_stats,
    )

    return document_quality_stats(load_table(spark, sf_dir, "documents"))


@register(
    "stream_windowed_topn_users",
    oracle=f"""
    WITH totals AS (
      SELECT make_timestamp((epoch_us(ts) // {_SIX_H_US}) * {_SIX_H_US})
               AS w, user_id,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(w AS VARCHAR) AS window_start, user_id, n_events,
           total_value, rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY w
               ORDER BY total_value DESC, user_id) AS rank
      FROM totals
    ) WHERE rank <= 3
    """,
    doc="Windowed TOP-N ('trending users'): per 6h event-time "
        "window, the 3 users with the highest exact value total. "
        "Split exactly where streaming semantics demand "
        "(streaming/pipeline.py): the per-(window,user) aggregate "
        "is the INCREMENTAL half — watermarked state, append-mode "
        "finalization, parity-tested — and the rank is a "
        "serving-time projection over the finalized window-grain "
        "output (rank needs a window's full user set; rows there "
        "are windows x users, never events). DECIMAL totals keep "
        "the rank order engine-identical.",
)
def stream_windowed_topn_users(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.streaming import (
        topn_per_window,
        windowed_user_totals,
    )

    ev = load_table(spark, sf_dir, "events")
    return topn_per_window(windowed_user_totals(ev), n=3).select(
        F.col("window_start").cast("string").alias("window_start"),
        "user_id", "n_events", "total_value", "rank",
    )


@register(
    "sql_stream_window",
    oracle=f"""
    SELECT CAST(make_timestamp((epoch_us(ts) // {_SIX_H_US}) * {_SIX_H_US})
                AS VARCHAR) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="The STREAMING engine reached from PLAIN SQL — the last "
        "family off the table-function seam (VERDICT r13 missing "
        "item 4): Engine.sql resolves TABLE(stream_window(events => "
        "..., window => '6 hours')) by snapshotting the named table "
        "to a parquet file source, streaming it back through "
        "streaming/pipeline.windowed_event_stats (watermark + "
        "event-time window + DECIMAL-stable totals — the exact "
        "incremental operator the stream_* rows run, NOT the batch "
        "twin), and draining an availableNow trigger into a memory "
        "sink whose final snapshot is the result. A wire client "
        "runs the incremental pipeline with no Python API in the "
        "loop; at production scale the file source swaps for Kafka "
        "unchanged. The oracle is stream_tumbling_window_stats's "
        "epoch-aligned 6h recompute — stream/batch/SQL parity in "
        "one hash gate.",
)
def sql_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "sql_stream_events_v"
    )
    return Engine(spark).sql(
        "SELECT CAST(window_start AS STRING) AS window_start, "
        "event_type, n_events, total_value "
        "FROM TABLE(stream_window(events => 'sql_stream_events_v', "
        "window => '6 hours'))"
    )


@register(
    "sql_stream_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(epoch_us(ts)) AS session_start_us,
           max(epoch_us(ts)) + {_GAP_US} AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="Dynamic-gap sessionization through the STREAMING engine "
        "from plain SQL: TABLE(stream_sessionize(events => ..., "
        "gap => '30 minutes')) snapshots the table, streams it back "
        "through streaming/pipeline.sessionize (Spark's native "
        "session_window with a watermark — the operator the "
        "reference stack has no equivalent for), and drains the "
        "availableNow memory sink. Same gaps-and-islands oracle as "
        "stream_session_window — stream/batch/SQL parity in one "
        "hash gate; at 100 TB session_window is one exchange on "
        "user_id with watermark-bounded state.",
)
def sql_stream_sessionize(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "sql_sess_events_v"
    )
    return Engine(spark).sql(
        "SELECT user_id, "
        "unix_micros(CAST(session_start AS TIMESTAMP)) "
        "AS session_start_us, "
        "unix_micros(CAST(session_end AS TIMESTAMP)) "
        "AS session_end_us, "
        "n_events, total_value "
        "FROM TABLE(stream_sessionize(events => 'sql_sess_events_v', "
        "gap => '30 minutes'))"
    )


@register(
    "wire_stream_window",
    oracle=f"""
    SELECT CAST(make_timestamp((epoch_us(ts) // {_SIX_H_US}) * {_SIX_H_US})
                AS VARCHAR) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="The STRUCTURED STREAMING engine reached over the NETWORK: a "
        "stdlib HTTP client POSTs TABLE(stream_window(...)) to the "
        "Trino wire server, which resolves it through Engine.sql — "
        "snapshot -> file stream -> watermark + event-time window -> "
        "availableNow drain into a memory sink — and pages the final "
        "snapshot back as JSON. Completes the streaming family's "
        "reachability matrix (Python API r9, plain SQL r14, wire "
        "here): a Trino client can run an incremental pipeline with "
        "nothing but HTTP. Same epoch-aligned 6h oracle as "
        "sql_stream_window — stream/batch/SQL/wire parity in one "
        "hash gate.",
)
def wire_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.queries.wire import (
        _drain_statement,
    )
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "wire_stream_events_v"
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(
            srv.url,
            "SELECT CAST(window_start AS STRING) AS window_start, "
            "event_type, n_events, total_value "
            "FROM TABLE(stream_window("
            "events => 'wire_stream_events_v', window => '6 hours'))",
        )
    finally:
        srv.stop()
    return spark.createDataFrame(
        [(r[0], r[1], int(r[2]), float(r[3])) for r in rows],
        "window_start string, event_type string, n_events long, "
        "total_value double",
    )
