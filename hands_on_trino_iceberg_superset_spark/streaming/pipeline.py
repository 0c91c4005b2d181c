"""Structured Streaming over the events table (SURVEY.md §2.5).

The reference's ``events`` table (append-shaped:
``/root/reference/compose/seed.sh:72-75``) is its natural streaming
seam; the reference never streams, so this whole module is
north-star extension tier.

Design rule: every transformation is written once against a plain
DataFrame and works in BOTH batch and streaming mode (Spark's
unified model) — tests assert stream-vs-batch parity on identical
input. Late data is handled by event-time watermarks; custom state
(beyond ``window``/``session_window``) goes through Arrow-batched
``applyInPandasWithState``.

Scale notes: a streaming shuffle keyed by (window, event_type) or
user_id partitions state across executors; state store size is
bounded by the watermark horizon, and file sources at 100 TB become
Kafka/queue sources with the same pipeline code.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hands_on_trino_iceberg_superset_spark.sources.tpch import _normalize_events


def read_events_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source stream of events parquet files dropped into
    ``source_dir``, normalized exactly like the batch loader
    (ns-as-long -> µs TIMESTAMP_NTZ ``ts``).

    ``maxFilesPerTrigger`` throttles each micro-batch; at production
    scale swap the file source for Kafka and keep everything
    downstream unchanged.
    """
    from hands_on_trino_iceberg_superset_spark.session import configure_runtime

    configure_runtime(spark)
    # schema discovery from the files present at start (file streams
    # require an explicit schema); recursive lookup admits both bare
    # files and Spark-written .parquet output directories
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .schema
    )
    reader = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize_events(reader.parquet(source_dir))


def windowed_event_stats(
    df: DataFrame,
    window_duration: str = "6 hours",
    watermark: str = "1 hour",
    slide_duration: str | None = None,
    by_type: bool = True,
) -> DataFrame:
    """Tumbling (or, with ``slide_duration``, sliding) event-time
    window aggregation: count + total value, optionally per
    event_type.

    Streaming: watermark bounds state and admits late rows up to
    ``watermark``; windows finalize (append mode) once the watermark
    passes their end. Batch: identical output, no state.
    DECIMAL-aggregated totals keep results bit-stable across
    partial-aggregation orders (queries/base.py contract).
    """
    if df.isStreaming:
        # watermarks require TIMESTAMP; session TZ is pinned UTC so
        # the NTZ -> TIMESTAMP cast is value-preserving
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    win = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration else F.window("ts", window_duration)
    )
    keys = [win, "event_type"] if by_type else [win]
    return (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            F.col("window.end").cast("timestamp_ntz").alias("window_end"),
            *(["event_type"] if by_type else []),
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user sessions via Spark's native ``session_window``
    (dynamic-gap session aggregation — the operator the reference
    stack has no equivalent for). ``session_end`` is
    last-event + gap, per Spark's session semantics.
    """
    if df.isStreaming:
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
    return (
        df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz")
            .alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz")
            .alias("session_end"),
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


def correlate_events(
    df_or_left: DataFrame,
    right: DataFrame | None = None,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Funnel correlation: for each ``first_type`` event, the
    ``then_type`` events by the same user within ``within`` — an
    equi + time-range (interval) join.

    Works batch (one DataFrame, self-joined) and streaming (two
    stream DataFrames): stream-stream inner joins require watermarks
    on both sides plus the time-range bound so the state store can
    evict expired rows — state is O(events inside the watermark
    horizon), not O(stream).
    """
    left = df_or_left
    right = left if right is None else right
    secs = _duration_seconds(within)
    a = left.where(F.col("event_type") == first_type).select(
        F.col("user_id").alias("a_user"),
        F.col("ts").cast("timestamp").alias("a_ts"),
        F.col("event_id").alias("first_event_id"),
    )
    b = right.where(F.col("event_type") == then_type).select(
        F.col("user_id").alias("b_user"),
        F.col("ts").cast("timestamp").alias("b_ts"),
        F.col("event_id").alias("then_event_id"),
        F.col("value").alias("then_value"),
    )
    if a.isStreaming:
        a = a.withWatermark("a_ts", watermark)
    if b.isStreaming:
        b = b.withWatermark("b_ts", watermark)
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {secs} SECOND")),
    )
    return joined.select(
        F.col("a_user").alias("user_id"),
        "first_event_id",
        "then_event_id",
        (F.unix_micros(F.col("b_ts")) - F.unix_micros(F.col("a_ts")))
        .alias("lag_us"),
        "then_value",
    )


def _duration_seconds(text: str) -> int:
    amount, unit = text.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    return int(amount) * mult[unit.lower()]


# ------------------------------------------------- custom stateful op

_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
# the running sum is carried as an EXACT decimal string, not a raw
# double: IEEE addition is non-associative, so a double accumulator
# makes totals depend on micro-batch arrival order (the repo-wide
# determinism contract — queries/base.py — forbids emitting raw
# double sums). Decimal addition over each double's shortest repr is
# associative, so any batch split yields the same total.
_STATE_SCHEMA = "n long, total string"


def _totals_fn(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from decimal import Decimal

    n, total_s = state.get if state.exists else (0, "0")
    total = Decimal(total_s)
    for pdf in batches:
        n += len(pdf)
        total += sum(
            (Decimal(str(x)) for x in pdf["value"]), Decimal(0)
        )
    state.update((n, str(total)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n],
         "total_value": [float(total)]}
    )


def running_user_totals(df: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) across the whole stream —
    arbitrary stateful processing via ``applyInPandasWithState``.

    Each trigger emits the updated totals for the users present in
    that micro-batch (update semantics). State is one (n, total)
    pair per user, partitioned by the streaming shuffle on user_id —
    O(users) state, no watermark needed since totals never expire.
    """
    return (
        df.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _relation_options_inert(relation) -> bool:
    """True iff the HadoopFsRelation carries no read options beyond
    the path itself. Options like ``pathGlobFilter``,
    ``recursiveFileLookup``, ``mergeSchema`` or ``basePath`` change
    WHICH files (or which schema) a scan reads; streaming the
    relation's root verbatim would read a DIFFERENT file set and
    silently produce wrong rows instead of falling back to the
    snapshot (ADVICE r14 — the zero-copy contract must stay strictly
    refusal-based)."""
    it = relation.options().keysIterator()
    while it.hasNext():
        if str(it.next()).lower() not in ("path", "paths"):
            return False
    return True


def streamable_parquet_root(df: DataFrame) -> str | None:
    """If ``df`` is a BARE parquet scan (its analyzed plan is just
    alias wrappers over one ``LogicalRelation`` whose
    ``HadoopFsRelation`` reads parquet from a single root, with no
    projection or filter on top), return that root path — the
    caller can stream the table's OWN files instead of snapshotting.

    This is the 100 TB path of the SQL streaming seam
    (``TABLE(stream_window(...))``, engine.py): re-writing a 100 TB
    table to parquet just to stream it back is a full corpus copy,
    while a registered table is almost always exactly this shape —
    a parquet directory. Derived frames (projections, filters,
    joins — e.g. the normalized ``events`` view) return ``None``
    and take the snapshot fallback, which stays correct for every
    plan shape. The schema equality check below is load-bearing:
    a pruned or reordered output schema means SOME transformation
    sits between the scan and the caller, and streaming raw files
    would silently undo it."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        while plan.getClass().getSimpleName() in (
            "SubqueryAlias", "View"
        ):
            plan = plan.children().head()
        if plan.getClass().getSimpleName() != "LogicalRelation":
            return None
        relation = plan.relation()
        if relation.getClass().getSimpleName() != "HadoopFsRelation":
            return None
        if "Parquet" not in relation.fileFormat().getClass().getName():
            return None
        if not _relation_options_inert(relation):
            return None
        if relation.schema().catalogString() != (
            df._jdf.schema().catalogString()
        ):
            return None
        roots = relation.location().rootPaths()
        if roots.length() != 1:
            return None
        # normalized for FileStreamSource: single-file roots need the
        # glob escape or the drain dies at getBatch ("basePath must
        # be a directory") — a latent crash before r14
        return _streamable_root(roots.head().toString())
    except Exception:  # noqa: BLE001 — any plan-shape surprise:
        return None    # snapshot fallback is always correct


#: glob metacharacters FileStreamSource would interpret anywhere in
#: a path — a root containing any of these cannot be streamed
#: verbatim (ADVICE r14: escaping only the LAST char left earlier
#: metachars live, failing or matching other files at stream start,
#: outside the callers' try/fallback)
_GLOB_CHARS = set("[]{}*?\\")


def _streamable_root(root: str) -> str | None:
    """Normalize a relation root for FileStreamSource. A directory
    streams as-is. A SINGLE-FILE root (the testdata shape) trips
    FileStreamSource's injected ``basePath`` ("must be a directory"),
    so the last character is glob-escaped (``...parque[t]``) — a glob
    path suppresses the basePath injection and matches exactly the
    one file. Refused (``None`` -> snapshot fallback) when the file's
    ancestry contains ``=`` (would be mis-read as partition dirs
    without a basePath), when any glob metacharacter appears anywhere
    in the path (it would be glob-interpreted by FileStreamSource),
    or the last char can't be bracketed."""
    import os

    if root.startswith("file:"):
        local = root[len("file:"):]
        if _GLOB_CHARS & set(local):
            return None
        if os.path.isdir(local):
            return root
        if os.path.isfile(local):
            head, tail = os.path.split(local)
            if "=" in head or not tail or not tail[-1].isalnum():
                return None
            return f"file:{head}/{tail[:-1]}[{tail[-1]}]"
        return None
    if _GLOB_CHARS & set(root):
        return None
    return root  # non-local scheme: pass through (directory shape)


def streamable_projected_scan(df: DataFrame) -> DataFrame | None:
    """Zero-copy file stream for a DERIVED frame whose plan is a
    chain of deterministic ``Project``/``Filter`` nodes over one
    parquet ``LogicalRelation`` (r14 optimization round): stream the
    relation's OWN files with the relation's schema and re-apply the
    projection/filter chain — expressed back as SQL via each
    Catalyst expression's ``sql()`` — on the streaming frame.

    This extends :func:`streamable_parquet_root` to the most common
    registered-view shape (the normalized ``events`` view is a
    single Project over the raw scan), removing the full corpus
    rewrite the snapshot fallback pays at 100 TB. Guard rails keep
    it refusal-based: any non-Project/Filter node, any
    non-deterministic expression, any SQL round-trip surprise, or a
    result schema that differs from the batch frame's falls back to
    the always-correct snapshot (returns ``None``).
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        ops: list[tuple[str, object]] = []
        while True:
            cls = plan.getClass().getSimpleName()
            if cls in ("SubqueryAlias", "View"):
                plan = plan.children().head()
            elif cls == "Project":
                pl = plan.projectList()
                exprs = []
                for i in range(pl.length()):
                    e = pl.apply(i)
                    if not e.deterministic():
                        return None
                    exprs.append(e.sql())
                ops.append(("project", exprs))
                plan = plan.child()
            elif cls == "Filter":
                cond = plan.condition()
                if not cond.deterministic():
                    return None
                ops.append(("filter", cond.sql()))
                plan = plan.child()
            elif cls == "LogicalRelation":
                relation = plan.relation()
                if relation.getClass().getSimpleName() != "HadoopFsRelation":
                    return None
                if "Parquet" not in relation.fileFormat().getClass().getName():
                    return None
                if not _relation_options_inert(relation):
                    return None
                roots = relation.location().rootPaths()
                if roots.length() != 1:
                    return None
                root = _streamable_root(roots.head().toString())
                if root is None:
                    return None
                ddl = relation.schema().toDDL()
                break
            else:
                return None
        out = df.sparkSession.readStream.schema(ddl).parquet(root)
        for kind, payload in reversed(ops):
            if kind == "project":
                out = out.selectExpr(*payload)
            else:
                out = out.where(payload)
        want = [(f.name, f.dataType) for f in df.schema.fields]
        got = [(f.name, f.dataType) for f in out.schema.fields]
        if want != got:
            return None
        return out
    except Exception:  # noqa: BLE001 — any plan-shape surprise:
        return None    # snapshot fallback is always correct


# ------------------------------------------------------- sink helpers


def run_available_now_to_memory(
    stream_df: DataFrame, query_name: str,
    output_mode: str = "append", on_start=None,
) -> DataFrame:
    """Drain everything currently available through the streaming
    engine into an in-memory table; returns the result DataFrame.
    Blocks until the stream is fully processed (test/dev helper).

    ``on_start`` (optional) receives the live ``StreamingQuery``
    right after start — the cancellation hook: a streaming drain
    runs its Spark jobs in the MICROBATCH thread, so a job-group
    cancel issued against the caller's thread never reaches it; the
    only handle that stops it is ``query.stop()`` on this object
    (Engine registers it so a wire DELETE can)."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if on_start is not None:
        on_start(query)
    query.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def write_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Production-shaped sink: exactly-once parquet append with a
    checkpoint (the lakehouse ingest path)."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def stream_merge_into(
    stream_df: DataFrame,
    table,
    on: str,
    checkpoint_dir: str,
    when_matched_update: dict[str, str] | None = None,
    tiebreak_col: str | None = None,
):
    """Streaming upsert into a :class:`lakehouse.VersionedTable` —
    the CDC-style lakehouse ingest path (what MERGE-on-stream gives
    you in Iceberg/Delta deployments), via ``foreachBatch``.

    Each micro-batch is deduplicated on the merge key — last writer
    within a batch wins, where "last" is decided by a DETERMINISTIC
    tiebreak (max ``tiebreak_col``, then the row's full-column
    ordering for exact ties), not by ``dropDuplicates``'s arbitrary
    first-seen row — and MERGEd copy-on-write: one snapshot per
    non-empty batch, so the table's history is the stream's batch
    history and time travel reproduces any ingest point.

    Exactly-once note: ``foreachBatch`` re-runs a batch after a
    crash, so end-state correctness relies on MERGE idempotence —
    re-merging the same source rows yields the same table state.
    The deterministic tiebreak is load-bearing here: an arbitrary
    per-key row choice could differ on replay and yield a different
    table state. The checkpoint bounds reprocessing to the last
    unfinished batch.
    """
    import pyspark.sql.functions as F  # noqa: PLC0415
    from pyspark.sql import Window  # noqa: PLC0415

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic last-writer-wins: order by tiebreak desc,
        # then every remaining column desc so exact-duplicate keys
        # with identical tiebreaks still pick a unique row on replay
        lead = [F.col(tiebreak_col).desc()] if tiebreak_col else []
        order_cols = lead + [
            F.col(c).desc()
            for c in batch_df.columns
            if c not in (on, tiebreak_col)
        ]
        w = Window.partitionBy(on).orderBy(*order_cols)
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if batch.isEmpty():
            return
        table.merge(
            batch, on=on, when_matched_update=when_matched_update
        )

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def stream_append_iceberg(
    stream_df: DataFrame,
    table,
    checkpoint_dir: str,
):
    """Streaming ingest into a SPEC-format Iceberg table
    (:class:`lakehouse.iceberg.IcebergTable`) via ``foreachBatch``
    append — the Kafka→Iceberg landing pattern the reference stack's
    catalog serves. One append snapshot per non-empty micro-batch:
    the table's snapshot history IS the stream's batch history, so a
    foreign Iceberg reader can time-travel to any ingest point, and
    incremental consumers diff consecutive snapshots.

    At-least-once note: a crash-replayed batch re-appends its rows
    (append is not idempotent); exact-once end state needs either an
    upstream dedup (``dedup_event_stream``) or the MERGE path
    (``stream_merge_into``). This is the same contract Spark's own
    file-sink-less foreachBatch ingest has, stated instead of
    hidden."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.append(batch_df)

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_upsert_iceberg(
    stream_df: DataFrame,
    table,
    on: str | list[str],
    checkpoint_dir: str,
    tiebreak: str | None = None,
):
    """CDC upsert stream into a SPEC-format Iceberg table via
    ``foreachBatch`` + :meth:`IcebergTable.upsert` — each micro-batch
    commits ONE snapshot holding an equality delete file on the batch
    keys plus the batch rows as data files. The table is NEVER
    scanned at commit time (O(batch) write cost), which is what keeps
    a 100 TB table ingestible: the merge work is deferred to reads
    (one broadcast anti-join) and discharged by periodic
    ``rewrite_data_files`` compaction.

    Within-batch key collisions resolve by ``tiebreak`` (keep the row
    with the max tiebreak value per key, deterministic — required for
    idempotent crash replay); without a tiebreak, duplicate keys in
    one batch raise rather than landing twice. Replayed batches
    re-commit the same end state: the equality delete removes the
    previous attempt's rows, so the upsert is naturally
    self-converging (unlike blind append)."""
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = batch_df
        if tiebreak is not None:
            w = Window.partitionBy(*keys).orderBy(
                F.desc(tiebreak),
                *[F.desc(c) for c in b.columns if c not in keys],
            )
            b = (
                b.withColumn("__rn__", F.row_number().over(w))
                .where(F.col("__rn__") == 1).drop("__rn__")
            )
        else:
            dupes = (
                b.groupBy(*keys).count().where(F.col("count") > 1)
            )
            if dupes.take(1):
                raise ValueError(
                    "upsert batch has duplicate keys and no "
                    "tiebreak column"
                )
        table.upsert(b, on=keys)

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def dedup_event_stream(
    df: DataFrame,
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-most-once event delivery: drop duplicate ``id_col`` rows.

    Streaming: ``dropDuplicatesWithinWatermark`` keys state by id and
    EVICTS entries once the watermark passes — state is bounded by
    the duplicate-arrival horizon (redeliveries cluster near the
    original event in every real transport), not by stream length;
    plain streaming ``dropDuplicates`` state would grow forever.
    Batch: the same call site degrades to an exact ``dropDuplicates``
    (unified API; parity-tested).
    """
    if df.isStreaming:
        orig_ts = df.schema["ts"].dataType.simpleString()
        df = df.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark
        )
        out = df.dropDuplicatesWithinWatermark([id_col])
        # stream/batch parity includes the SCHEMA: the watermark
        # needs TIMESTAMP, but the caller gets ts back in its
        # original type (the corpus is TIMESTAMP_NTZ)
        return out.withColumn("ts", F.col("ts").cast(orig_ts))
    return df.dropDuplicates([id_col])


def read_documents_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source stream of document dump files dropped into
    ``source_dir`` — the corpus-intake seam: each new crawl/dump
    parquet landing in the directory flows through the same curation
    transforms batch uses (same reader shape as
    :func:`read_events_stream`; at scale the file source becomes
    Kafka with everything downstream unchanged)."""
    from hands_on_trino_iceberg_superset_spark.session import configure_runtime

    configure_runtime(spark)
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .schema
    )
    reader = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def document_quality_stats(docs: DataFrame) -> DataFrame:
    """Streaming corpus-intake quality gate, written ONCE for batch
    and streaming (unified API; parity-tested): per source, how many
    arriving documents pass the text-quality cut
    (queries/text.py's gate — length, type/token ratio, stopword
    presence) and the running token volume.

    Streaming shape: stateless per-row scoring (pure codegen
    expressions), then one aggregation keyed by ``source`` — state
    is bounded by the number of distinct sources (domains), not by
    stream length, so no watermark is needed; output mode
    ``complete`` re-emits the small per-source table each
    micro-batch. This is the gate a 100 TB intake pipeline puts in
    front of the corpus: reject a dump whose pass rate collapses
    BEFORE it lands in the training mix.
    """
    from hands_on_trino_iceberg_superset_spark.queries.text import (
        STOPWORDS,
        _quality_gate,
    )

    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias(
            "n_stop"
        ),
    )
    # the ONE definition of the quality cut (queries/text.py): the
    # streaming gate and the batch quality score cannot drift
    return (
        scored.withColumn("ok", _quality_gate())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("ok").cast("int")).cast("bigint").alias("n_pass"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_pass",
            (F.col("n_docs") - F.col("n_pass")).alias("n_fail"),
            F.round(F.col("n_pass") / F.col("n_docs"), 6).alias(
                "pass_rate"
            ),
            "total_tokens",
        )
    )


def windowed_user_totals(
    df: DataFrame,
    window_duration: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(window, user) exact value totals — the INCREMENTAL half
    of windowed top-N ("trending users"): this aggregate runs as a
    watermarked stream (state bounded by live windows x active
    users, append mode finalizes windows), and ranking happens on
    its window-grain OUTPUT via :func:`topn_per_window` — rank needs
    a window's full user set, so it is a serving-time projection
    over the finalized aggregate, never stream state."""
    if df.isStreaming:
        df = df.withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window_duration), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_tv"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz")
            .alias("window_start"),
            "user_id",
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


def topn_per_window(totals: DataFrame, n: int = 3) -> DataFrame:
    """Top-``n`` users per finalized window by total value (ties on
    user_id): a rank over the window-grain aggregate — rows are
    (windows x users), never events, so this is serving-cost at any
    stream volume."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
    )
