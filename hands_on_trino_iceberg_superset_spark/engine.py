"""Engine: the SQL/catalog entry point (SURVEY.md §3).

Collapses the reference's Trino-coordinator role
(``/root/reference/compose/compose.yaml:109-127``) into an in-process
object: ``Engine.sql(text)`` is the equivalent of the Trino CLI's
``--execute`` (``compose/seed.sh:9``), ``Engine.ready()`` the
readiness probes (``seed.sh:32-59``), and the introspection methods
the ``information_schema`` surface Superset uses
(``compose/superset/init_db.py:63-67``).
"""

from __future__ import annotations

import re
import threading
import weakref
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.session import configure_runtime, get_spark


def _split_top_level(text: str) -> list[str]:
    """Split on commas outside parentheses and string literals —
    enough to separate ``SET a = f(x, y), b = 'v,w'`` assignments."""
    parts, depth, start, i = [], 0, 0, 0
    while i < len(text):
        ch = text[i]
        if ch == "'":
            i += 1
            while i < len(text):
                if text[i] == "'" and not (
                    i + 1 < len(text) and text[i + 1] == "'"
                ):
                    break
                i += 2 if text[i] == "'" else 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return [p for p in parts if p.strip()]


def _executed_plan_with_metrics(jplan) -> str:
    """Render an EXECUTED JVM physical plan as an indented tree with
    each operator's runtime ``SQLMetric`` values inline — the body of
    Trino's ``EXPLAIN ANALYZE`` output shape. Walks the same node
    graph the Spark UI's SQL tab reads: ``AdaptiveSparkPlanExec``
    descends into its FINAL plan (the initial plan's metrics are
    empty), ``*QueryStageExec`` wrappers into their materialized
    stage plan; metric keys sort for a stable layout (values like
    timings are genuinely run-dependent — that is what ANALYZE
    reports)."""
    lines: list[str] = []

    def metric_parts(node) -> list[str]:
        parts = []
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                try:
                    parts.append(f"{kv._1()}: {kv._2().value()}")
                except Exception:  # noqa: BLE001 — unset metric
                    continue
        except Exception:  # noqa: BLE001 — metric-less node
            pass
        return sorted(parts)

    def walk(node, depth: int) -> None:
        cls = node.getClass().getSimpleName()
        parts = metric_parts(node)
        lines.append(
            "  " * depth + str(node.nodeName())
            + (" [" + ", ".join(parts) + "]" if parts else "")
        )
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), depth + 1)
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan(), depth + 1)
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next(), depth + 1)

    walk(jplan, 0)
    return "\n".join(lines)


#: SparkSession -> {view name: defining SQL}. The backing temp views
#: are SESSION-global, so the registry must be too: two Engine
#: instances over one session share one view namespace (a DROP VIEW
#: through either is observed by both, and CREATE VIEW without OR
#: REPLACE refuses to clobber a view the other registered). Weak keys
#: so a stopped session's registry is collectable.
_SESSION_VIEWS: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" \
    = weakref.WeakKeyDictionary()

#: SparkSession -> information_schema snapshot state: a catalog-state
#: version counter (bumped by DDL routed through any Engine on the
#: session) plus, per virtual table, the key it was last built at.
#: Session-shared for the same reason as _SESSION_VIEWS: the backing
#: temp views are session-global.
_SESSION_INFOSCHEMA: "weakref.WeakKeyDictionary[SparkSession, dict]" \
    = weakref.WeakKeyDictionary()

#: SparkSession -> {executing thread id -> live StreamingQuery list}
#: for streaming-statement cancellation, plus the ids of queries
#: stopped THROUGH a cancel (so the drain can refuse to return a
#: partial snapshot as a normal result). Session-shared so the wire
#: server's DELETE handler reaches drains started by any Engine
#: instance over the same session (statements construct their own
#: Engine objects).
_SESSION_STREAMS: "weakref.WeakKeyDictionary[SparkSession, dict]" \
    = weakref.WeakKeyDictionary()
_SESSION_STREAMS_CANCELLED: \
    "weakref.WeakKeyDictionary[SparkSession, set]" \
    = weakref.WeakKeyDictionary()
#: cancel SCOPES (wire qids) whose DELETE arrived before the
#: statement's drain registered anything to stop — registration
#: consults this so the just-started query is stopped immediately
#: instead of running its whole drain with only the status
#: rewritten afterwards. String tokens only (qids are unique and
#: are cleared by the server when the statement ends); recycled
#: thread-ident keys are never persisted here.
_SESSION_CANCELLED_SCOPES: \
    "weakref.WeakKeyDictionary[SparkSession, set]" \
    = weakref.WeakKeyDictionary()
#: one short-critical-section lock for BOTH structures above: the
#: cancel path must never observe a query after its drain
#: unregistered it (a flag set then would leak forever)
_STREAMS_LOCK = threading.Lock()
#: the executing statement's cancel scope (the wire server sets the
#: statement's qid around execution; qids are unique, so a scope can
#: never be confused across recycled OS thread ids the way a raw
#: thread ident can)
_CANCEL_SCOPE = threading.local()


@dataclass(frozen=True)
class ColumnInfo:
    """SQLAlchemy-``get_columns``-shaped column metadata (reference:
    init_db.py:63-67)."""

    name: str
    type: str
    nullable: bool


class Engine:
    """PySpark-native analytics engine.

    >>> eng = Engine()
    >>> eng.sql("SELECT 1 AS x").collect()
    [Row(x=1)]
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        default_schema: str = "demo",
    ) -> None:
        self.spark = configure_runtime(spark) if spark else get_spark()
        self.default_schema = default_schema
        self._versioned: dict[str, object] = {}
        #: Trino-spelled metadata-table identifier -> safe view name
        self._meta_views: dict[str, str] = {}
        #: view name (lowercased) -> defining SQL text (CREATE VIEW);
        #: keyed off the SparkSession so every Engine over one session
        #: observes the same view state (the temp views themselves are
        #: session-global)
        self._views: dict[str, str] = _SESSION_VIEWS.setdefault(
            self.spark, {}
        )
        #: information_schema snapshot cache state (session-shared)
        self._infoschema_state: dict = _SESSION_INFOSCHEMA.setdefault(
            self.spark, {"version": 0, "built": {}}
        )
        #: ANN index name -> persisted IVF index path (SQL surface)
        self._ann_indexes: dict[str, str] = {}
        #: executing thread id -> live streaming queries (session-
        #: shared; see stop_streams_for_thread)
        self._thread_streams: dict = _SESSION_STREAMS.setdefault(
            self.spark, {}
        )
        self._cancelled_streams: set = \
            _SESSION_STREAMS_CANCELLED.setdefault(self.spark, set())
        self._cancelled_scopes: set = \
            _SESSION_CANCELLED_SCOPES.setdefault(self.spark, set())

    # -- query entry points (reference §3 paths A/C) ------------------

    def sql(self, text: str) -> DataFrame:
        """Execute SQL text; the Trino-CLI ``--execute`` equivalent.

        Supports Trino/Iceberg time-travel syntax on tables
        registered via :meth:`register_versioned_table`:
        ``SELECT ... FROM t FOR VERSION AS OF 3`` and
        ``... FOR TIMESTAMP AS OF TIMESTAMP '2026-01-01 00:00:00'`` —
        and row-level SQL DML on the same tables (the Iceberg-v2
        capability the reference's catalog enables): ``DELETE FROM t
        WHERE …``, ``UPDATE t SET … WHERE …``, ``INSERT INTO t …``,
        each committing a new snapshot through the copy-on-write
        :class:`lakehouse.VersionedTable` path.
        """
        for alias, safe in self._meta_views.items():
            for quoted in (f"`{alias}`", f'"{alias}"'):
                if quoted in text:
                    text = text.replace(quoted, safe)
        if self._CATALOG_DDL_RE.match(text):
            # any statement that can evolve catalog metadata (a
            # CREATE OR REPLACE changing a same-named view's schema,
            # ALTER column evolution, CALL procedures) invalidates
            # the information_schema snapshot — the entry-list part
            # of the cache key cannot see same-name schema changes
            self._infoschema_state["version"] += 1
        text = self._resolve_information_schema(text)
        # an EXPLAIN head reaching resolution would EXECUTE any
        # streaming table function inside it (resolution drains) —
        # the same analysis-only guarantee Engine.explain enforces
        # must hold on this entry too (EXPLAIN ANALYZE has no Spark
        # SQL form and never reaches here). Leading comments are
        # part of the head: '/* x */ EXPLAIN ...' explains too.
        if self._EXPLAIN_HEAD_RE.match(text):
            self._reject_streaming_explain(text, "EXPLAIN")
        text = self._resolve_table_functions(text)
        view = self._resolve_view_ddl(text)
        if view is not None:
            return view
        ddl = self._resolve_versioned_alter(text)
        if ddl is not None:
            return ddl
        call = self._resolve_call(text)
        if call is not None:
            return call
        dml = self._resolve_versioned_dml(text)
        if dml is not None:
            return dml
        stats = self._resolve_show_stats(text)
        if stats is not None:
            return stats
        return self.spark.sql(self._resolve_time_travel(text))

    # -- views (the Trino CREATE VIEW surface Superset's virtual
    # -- datasets sit on; reference README.md's catalog supports it) --

    _CREATE_VIEW = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+"
        r"([A-Za-z_][\w.]*)\s+AS\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_VIEW = re.compile(
        r"^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)"
        r"\s*;?\s*$",
        re.IGNORECASE,
    )
    _SHOW_CREATE_VIEW = re.compile(
        r"^\s*SHOW\s+CREATE\s+VIEW\s+([A-Za-z_][\w.]*)\s*;?\s*$",
        re.IGNORECASE,
    )

    def _view_name(self, raw: str) -> str:
        """Engine view identifier: the default schema qualifier is
        accepted and stripped (Trino writes ``demo.v``; Spark temp
        views are unqualified); any other qualifier is a loud error
        rather than a silently mis-registered name."""
        parts = raw.split(".")
        if len(parts) == 2 and parts[0].lower() == \
                self.default_schema.lower():
            return parts[1]
        if len(parts) > 1:
            raise ValueError(
                f"view name {raw!r} must be unqualified or in the "
                f"default schema {self.default_schema!r}"
            )
        return raw

    def _resolve_view_ddl(self, text: str) -> DataFrame | None:
        """``CREATE [OR REPLACE] VIEW`` / ``DROP VIEW [IF EXISTS]`` /
        ``SHOW CREATE VIEW`` — the persistent-view DDL surface
        (init_db.py's virtual-dataset workflow sits on it). The
        defining SQL is recorded engine-side (the same place Superset
        keeps a virtual dataset's SQL) and the view materializes as a
        session temp view THROUGH :meth:`sql`, so Trino time-travel
        and versioned tables work inside view bodies; introspection
        (M1/M2: ``columns``/``describe``/``tables``) resolves views
        like any table. Spark's own ``CREATE TEMPORARY VIEW`` passes
        through untouched."""
        m = self._SHOW_CREATE_VIEW.match(text)
        if m:
            name = self._view_name(m.group(1)).lower()
            if name not in self._views:
                raise ValueError(f"view not found: {m.group(1)}")
            return self.spark.createDataFrame(
                [(f"CREATE VIEW {name} AS {self._views[name]}",)],
                "create_view string",
            )
        m = self._DROP_VIEW.match(text)
        if m:
            name = self._view_name(m.group(2)).lower()
            if name not in self._views:
                if m.group(1):  # IF EXISTS
                    return self.spark.createDataFrame(
                        [(False,)], "dropped boolean"
                    )
                raise ValueError(f"view not found: {m.group(2)}")
            del self._views[name]
            self.spark.catalog.dropTempView(name)
            return self.spark.createDataFrame(
                [(True,)], "dropped boolean"
            )
        m = self._CREATE_VIEW.match(text)
        if m:
            replace, raw_name, body = m.groups()
            name = self._view_name(raw_name).lower()
            if name in self._views and not replace:
                raise ValueError(
                    f"view already exists: {raw_name} "
                    "(use CREATE OR REPLACE VIEW)"
                )
            body = body.strip().rstrip(";").strip()
            # route the materialization through sql() so meta-view
            # aliases and time-travel resolve inside the body
            out = self.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {body}"
            )
            self._views[name] = body
            return out
        return None

    def views(self) -> dict[str, str]:
        """view name -> defining SQL, for introspection (M1/M2)."""
        return dict(self._views)

    # -- information_schema (reference init_db.py:63-67) ---------------
    #
    # The reference's own bootstrap never calls a bespoke metadata API:
    # SQLAlchemy's ``inspect(engine).get_columns(table, schema="demo")``
    # compiles, in the trino dialect, to SELECTs over
    # ``information_schema.columns`` / ``.tables`` / ``.schemata``
    # issued through POST /v1/statement. These resolve here as VIRTUAL
    # TABLES: any statement referencing ``information_schema.<kind>``
    # (re)materializes a snapshot of the live catalog state — session
    # tables and views, database-cataloged tables, engine-registered
    # versioned tables — as a temp view and rewrites the reference onto
    # it. Trino's column names and type spellings (``varchar``,
    # ``bigint``, ``timestamp(3)``) are used throughout, shared with
    # the wire server's descriptors via :func:`dialect.trino_type`.

    #: leading lookbehind so a USER table whose name merely ends in
    #: ``information_schema`` (``my_information_schema.tables``) is
    #: never rewritten — only the bare/quoted schema itself matches
    _INFOSCHEMA_RE = re.compile(
        r'(?<![\w`"])["`]?information_schema["`]?\s*\.\s*["`]?'
        r"(columns|tables|schemata|views)"
        r'["`]?',
        re.IGNORECASE,
    )

    #: the catalog name the reference's clients connect with
    #: (``trino://trino@trino:8080/iceberg``, init_db.py:8-9)
    _INFO_CATALOG = "iceberg"

    def _info_entries(self) -> list[tuple[str, str, str, bool]]:
        """Live catalog snapshot: (schema, name, resolvable identifier,
        is_view) for every user-visible table — session temp views land
        in the default schema (they ARE the engine's demo tables),
        database-cataloged tables in their database. Engine-internal
        twin views (``__meta_*``, ``__information_schema_*``) stay
        hidden. Driver-side by design: catalog metadata, never data.

        Listed via ``SHOW TABLES`` / ``SHOW VIEWS`` collects — one
        JVM round trip per statement — NOT ``catalog.listTables``,
        which marshals a full Table object per entry over py4j
        (3.3 s vs 0.6 s at a 2k-view catalog; this listing runs in
        every introspection statement's cache key, so it IS the warm
        path — tools/infoschema_cache_bench.py). ``is_view`` keeps
        the prior ``tableType == "VIEW"`` semantics: permanent views
        count, direct temp views don't (engine-registered views are
        tracked in ``self._views``)."""
        try:
            dbs = [d.name for d in self.spark.catalog.listDatabases()]
        except Exception:
            dbs = []
        entries: dict[tuple[str, str], tuple[str, str, str, bool]] = {}
        for db in [None, *dbs]:
            suffix = f" IN `{db}`" if db else ""
            try:
                tables = self.spark.sql(
                    "SHOW TABLES" + suffix).collect()
                perm_views = {
                    r.viewName.lower()
                    for r in self.spark.sql(
                        "SHOW VIEWS" + suffix).collect()
                    if not r.isTemporary
                }
            except Exception:
                continue
            for t in tables:
                name = t.tableName
                if name.startswith("__"):
                    continue
                if t.isTemporary and not t.namespace:
                    schema, resolvable = self.default_schema, name
                else:
                    schema = t.namespace or self.default_schema
                    resolvable = f"{schema}.{name}"
                key = (schema.lower(), name.lower())
                if key in entries:
                    continue
                is_view = (name.lower() in self._views
                           or (not t.isTemporary
                               and name.lower() in perm_views))
                entries[key] = (schema, name, resolvable, is_view)
        return sorted(entries.values())

    #: statement heads that can evolve catalog metadata — bump the
    #: information_schema snapshot version (see Engine.sql). Reads
    #: and row DML (INSERT/UPDATE/DELETE change data, never columns)
    #: deliberately excluded.
    _CATALOG_DDL_RE = re.compile(
        r"^\s*(CREATE|DROP|ALTER|CALL|REPLACE|TRUNCATE)\b",
        re.IGNORECASE,
    )

    def _resolve_information_schema(self, text: str) -> str:
        """Materialize the ``information_schema`` virtual tables a
        statement references and rewrite the references onto them
        (literal-aware: a string containing 'information_schema.x'
        passes through byte-identical).

        The snapshot is CACHED per catalog-state key: (DDL version
        counter, the entry list, the engine view registry). The
        expensive part — one ``spark.table(t).schema`` analysis per
        catalog entry for the ``columns`` view — reruns only when the
        key changes, so consecutive introspection statements against
        an unchanged catalog rebuild nothing (at a 10k-table catalog
        the per-statement rebuild would be a driver stall). The entry
        list catches tables/views added or dropped OUTSIDE the engine
        (direct ``createOrReplaceTempView``); the version counter
        catches same-name schema evolution routed through
        :meth:`sql` (ALTER, CREATE OR REPLACE, CALL); and the
        temp-view plan digest (:meth:`_temp_view_digest`) catches
        same-name swaps done DIRECTLY on the SparkSession — the
        repo's dominant view-registration pattern (r12 ADVICE closed
        that staleness window). The digest is one catalog hash-code
        lookup per temp view — no schema analysis — so the key stays
        cheap where it scales (global tables are DDL-versioned and
        cost nothing; see tools/infoschema_cache_bench.py)."""
        from hands_on_trino_iceberg_superset_spark.dialect import (
            _outside_literals,
        )

        kinds: set[str] = set()

        def scan(seg: str) -> str:
            kinds.update(m.group(1).lower()
                         for m in self._INFOSCHEMA_RE.finditer(seg))
            return seg

        _outside_literals(text, scan)
        if not kinds:
            return text

        entries = self._info_entries()
        key = (
            self._infoschema_state["version"],
            tuple(entries),
            tuple(sorted(self._views.items())),
            self._temp_view_digest(entries),
        )
        built: dict = self._infoschema_state["built"]
        stale = {k for k in kinds if built.get(k) != key}
        if stale:
            self._build_information_schema(stale, entries)
            for k in stale:
                built[k] = key

        return _outside_literals(
            text,
            lambda seg: self._INFOSCHEMA_RE.sub(
                lambda m: "__information_schema_" + m.group(1).lower(),
                seg,
            ),
        )

    def _temp_view_digest(self, entries: list) -> tuple:
        """Per-temp-view SCHEMA digest for the snapshot cache key:
        the session catalog's stored plan's StructType content hash —
        a few py4j lookups per temp view, NO table analysis. A
        same-name ``createOrReplaceTempView`` swap that changes the
        schema re-digests (rebuild); a swap to an identically-shaped
        view doesn't — which is exactly right, because
        information_schema serves schema metadata only. The SCHEMA
        hash is the digest (StructType is content-hashed) rather
        than the plan object's own hash: SQL-text temp views
        re-instantiate their stored plan per catalog lookup with
        fresh expression ids, so a plan-object hash flaps and would
        rebuild on every statement. Undigestable views fall back to
        a constant — degrading THAT view to the r12 documented
        staleness, never to per-statement rebuilds. Global
        (non-temp) tables are excluded: their evolution is
        DDL-versioned, so the digest's cost scales with temp-view
        count only (tools/infoschema_cache_bench.py)."""
        out = []
        try:
            jcat = self.spark._jsparkSession.sessionState().catalog()
        except Exception:
            return ()
        for schema, name, resolvable, _ in entries:
            if "." in resolvable:
                continue  # database-cataloged: DDL-versioned
            try:
                opt = jcat.getTempView(name)
                h = (opt.get().schema().hashCode()
                     if opt.isDefined() else 0)
                out.append((name, h))
            except Exception:
                out.append((name, -1))
        return tuple(out)

    def _build_information_schema(self, kinds: set[str],
                                  entries: list) -> None:
        """(Re)materialize the referenced virtual tables as temp
        views. Driver-side by design: catalog metadata, never data."""
        from hands_on_trino_iceberg_superset_spark.dialect import (
            trino_type,
        )

        if "columns" in kinds:
            rows = []
            for schema, name, resolvable, _ in entries:
                try:
                    fields = self.spark.table(resolvable).schema.fields
                except Exception:
                    continue  # dangling catalog entry
                rows.extend(
                    (self._INFO_CATALOG, schema, name, f.name, i + 1,
                     None, "YES" if f.nullable else "NO",
                     trino_type(f.dataType.simpleString()))
                    for i, f in enumerate(fields)
                )
            self.spark.createDataFrame(
                rows,
                "table_catalog string, table_schema string, "
                "table_name string, column_name string, "
                "ordinal_position long, column_default string, "
                "is_nullable string, data_type string",
            ).createOrReplaceTempView("__information_schema_columns")
        if "tables" in kinds:
            self.spark.createDataFrame(
                [(self._INFO_CATALOG, schema, name,
                  "VIEW" if is_view else "BASE TABLE")
                 for schema, name, _, is_view in entries],
                "table_catalog string, table_schema string, "
                "table_name string, table_type string",
            ).createOrReplaceTempView("__information_schema_tables")
        if "schemata" in kinds:
            schemas = {s for s, *_ in entries}
            try:
                schemas |= {d.name for d in
                            self.spark.catalog.listDatabases()}
            except Exception:
                pass
            schemas |= {self.default_schema, "information_schema"}
            self.spark.createDataFrame(
                [(self._INFO_CATALOG, s) for s in sorted(schemas)],
                "catalog_name string, schema_name string",
            ).createOrReplaceTempView("__information_schema_schemata")
        if "views" in kinds:
            self.spark.createDataFrame(
                [(self._INFO_CATALOG, self.default_schema, name, sql)
                 for name, sql in sorted(self._views.items())],
                "table_catalog string, table_schema string, "
                "table_name string, view_definition string",
            ).createOrReplaceTempView("__information_schema_views")

    _SHOW_STATS_RE = re.compile(
        r"^\s*SHOW\s+STATS\s+FOR\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.I
    )

    def _resolve_show_stats(self, text: str) -> DataFrame | None:
        """Trino's ``SHOW STATS FOR <table>`` (the surface Trino's
        cost-based optimizer and Superset's cost preview read):
        per-column ``data_size`` (string columns), EXACT
        ``distinct_values_count``, ``nulls_fraction``, and
        ``low_value``/``high_value`` (numeric columns), plus the
        summary row carrying ``row_count`` — Trino's exact output
        shape. All statistics come from ONE aggregate pass over the
        table (a single job; multiple count-distincts plan through
        one expand). Exact NDV keeps the surface oracle-checkable;
        at 100 TB swap :func:`F.countDistinct` for
        ``approx_count_distinct`` — Trino itself serves estimates.
        Timestamp/date low/high are withheld (engine-specific text
        formatting), matching the documented subset posture."""
        m = self._SHOW_STATS_RE.match(text)
        if not m:
            return None
        import pyspark.sql.types as T

        df = self.spark.sql(f"SELECT * FROM {m.group(1)}")
        fields = df.schema.fields
        aggs = [F.count(F.lit(1)).alias("__n")]
        for fld in fields:
            c, nm = F.col(fld.name), fld.name
            aggs.append(F.countDistinct(c).alias(f"ndv__{nm}"))
            aggs.append(F.count(c).alias(f"nn__{nm}"))
            if isinstance(fld.dataType, T.StringType):
                # Trino's data_size is BYTES on disk, not characters
                # — octet_length so multi-byte UTF-8 sizes match
                aggs.append(
                    F.sum(F.octet_length(c)).cast("double")
                    .alias(f"sz__{nm}")
                )
            if isinstance(fld.dataType, T.NumericType):
                aggs.append(F.min(c).cast("string").alias(f"lo__{nm}"))
                aggs.append(F.max(c).cast("string").alias(f"hi__{nm}"))
        row = df.agg(*aggs).collect()[0].asDict()
        total = row["__n"]
        out = []
        for fld in fields:
            nm = fld.name
            out.append((
                nm,
                row.get(f"sz__{nm}"),
                float(row[f"ndv__{nm}"]),
                (float(total - row[f"nn__{nm}"]) / total
                 if total else 0.0),
                None,
                row.get(f"lo__{nm}"),
                row.get(f"hi__{nm}"),
            ))
        out.append((None, None, None, None, float(total), None, None))
        return self.spark.createDataFrame(
            out,
            "column_name string, data_size double, "
            "distinct_values_count double, nulls_fraction double, "
            "row_count double, low_value string, high_value string",
        )

    # -- SQL-reachable retrieval (north-star extension) -----------------
    #
    # The similarity/retrieval operators (operators/similarity.py,
    # operators/retrieval.py) are Python-API queries; this seam makes
    # top-k retrieval reachable from plain SQL — and therefore from
    # the Trino wire and from BI virtual datasets — as Trino-style
    # table functions:
    #
    #   SELECT * FROM TABLE(ann_topk(
    #       corpus  => 'embeddings',   -- exact brute-force path, OR
    #       index   => 'emb_ivf',      -- registered IVF index:
    #                                  --   partition-pruned probe
    #       queries => 'query_view',   -- table with (id, vector)
    #       k => 10 [, n_probe => 8]
    #       [, id_col => 'vec_id'] [, vec_col => 'embedding']
    #       [, match_cols => 'a,b']    -- FILTERED search (equality
    #                                  --   pre-filter, both arms)
    #       [, exclude_cols => 'c']))  -- hard-negative mining
    #                                  --   (inequality; index arm)
    #     -> (query_id, neighbor_id, cos_sim, rank)
    #
    #   SELECT * FROM TABLE(bm25_topk(
    #       docs => 'documents', queries => 'q_view',  -- (qid, qtext)
    #       k => 10 [, text_col => 'text'] [, id_col => 'doc_id']))
    #     -> (qid, rank, doc_id, score)         -- exact-decimal BM25
    #
    #   SELECT * FROM TABLE(hybrid_topk(
    #       docs => 'documents',       -- lexical side (BM25)
    #       corpus => 'embeddings'     -- vector side: exact, OR
    #       [index => 'emb_ivf'],      --   IVF probe at scale
    #       queries => 'q_view',       -- (qid, qtext, qvec)
    #       k => 10 [, c => 60] [, n_probe => 8] [, col names...]))
    #     -> (qid, rank, doc_id, r_lex, r_vec, rrf)  -- RRF fusion
    #
    # Each call resolves to a LAZY temp view over the operator's
    # DataFrame — the outer statement composes (joins, filters,
    # aggregation) and the physical plan keeps the operator's shape:
    # the indexed ANN path scans ONLY the probed cell partitions and
    # the BM25 postings join broadcasts the query terms (both
    # plan-gated in tests/test_plans.py), never a cartesian.

    #   SELECT * FROM TABLE(dedup_exact(
    #       docs => 'documents' [, text_col => 'text']
    #       [, id_col => 'doc_id']))
    #     -> (fingerprint, keep_id, n_dups)   -- hash-groupBy dedup
    #
    #   SELECT * FROM TABLE(simhash_pairs(
    #       docs => 'documents', [max_hamming => 3] [, col names]))
    #     -> (id_a, id_b, hamming)   -- pigeonhole-banded near-dups
    #
    #   SELECT * FROM TABLE(minhash_pairs(
    #       docs => 'documents', threshold => 0.4
    #       [, n => 2] [, num_hashes => 32] [, bands => 16]
    #       [, col names]))
    #     -> (id_a, id_b, jaccard_sim)   -- MinHash-LSH banding, the
    #                                    -- 100 TB near-dup workhorse
    #
    #   SELECT * FROM TABLE(containment_pairs(
    #       docs => 'documents', threshold => 0.9
    #       [, n => 8] [, max_df => 10] [, col names]))
    #     -> (id_a, id_b, containment, jaccard_sim)  -- asymmetric
    #                                    -- quote-inside-page pass
    #
    #   SELECT * FROM TABLE(asof_join(
    #       left => 'purchases', right => 'clicks',
    #       on => 'user_id[,k2,...]', order_col => 'ts',
    #       carry_cols => 'a[,b,...]'
    #       [, tiebreak_col => 'id'] [, strict => 1]))
    #     -> left columns + carry_cols from the latest right row at
    #        or before each left row — the events-family workhorse
    #        (union + last-value carry-forward, ONE shuffle, no join)
    #
    # Argument grammar: named-only scalars — 'string' (with ''
    # escaping; parentheses allowed INSIDE a quoted value), integer,
    # or decimal. Nested calls / subqueries as arguments are refused
    # LOUDLY (_reject_unresolved_table_fns) instead of falling
    # through to Spark's parser, which has no TABLE() form and would
    # answer with an unrelated syntax error.
    _TABLE_FN_RE = re.compile(
        r"TABLE\s*\(\s*(ann_topk|bm25_topk|hybrid_topk"
        r"|dedup_exact|simhash_pairs|minhash_pairs|containment_pairs"
        r"|asof_join|tokenize|quality_scores|lang_id"
        r"|repetition_signals|stream_window|stream_sessionize)"
        r"\s*\(((?:'[^']*'|[^()'])*)\)\s*\)",
        re.IGNORECASE | re.DOTALL,
    )

    #: any TABLE(ident(...)) head the resolver did NOT consume — the
    #: loud-refusal detector's probe (the full argument body is not
    #: re-parsed; reaching an unconsumed head alone is the defect)
    _TABLE_FN_HEAD_RE = re.compile(
        r"TABLE\s*\(\s*([A-Za-z_]\w*)\s*\(", re.IGNORECASE
    )

    def register_ann_index(self, name: str, index_path: str) -> None:
        """Expose a persisted IVF index
        (:func:`operators.similarity.build_ivf_index`) to the SQL
        table functions under ``index => '<name>'``."""
        self._ann_indexes[name.lower()] = index_path

    def _resolve_table_functions(self, text: str) -> str:
        # the argument list itself carries string literals, so
        # literal-awareness is positional: a call STARTING inside a
        # string literal is left untouched, one starting outside is
        # resolved whole (its own quoted arguments included)
        from hands_on_trino_iceberg_superset_spark.dialect import (
            _in_literal,
        )

        out: list[str] = []
        last = 0
        for m in self._TABLE_FN_RE.finditer(text):
            if _in_literal(text, m.start()):
                continue
            out.append(text[last:m.start()])
            out.append(self._materialize_table_fn(
                m.group(1).lower(), m.group(2)
            ))
            last = m.end()
        if not out:
            self._reject_unresolved_table_fns(text)
            return text
        out.append(text[last:])
        resolved = "".join(out)
        self._reject_unresolved_table_fns(resolved)
        return resolved

    #: table-function name -> its argument names, for error messages
    _TABLE_FN_GRAMMAR = {
        "ann_topk": "queries => '<table>' [, corpus|index, k, "
                    "n_probe, id_col, vec_col, match_cols, "
                    "exclude_cols]",
        "bm25_topk": "docs => '<t>', queries => '<t>' [, k, "
                     "text_col, id_col]",
        "hybrid_topk": "docs => '<t>', queries => '<t>' [, corpus|"
                       "index, k, c, n_probe, text_col, id_col, "
                       "vec_col]",
        "dedup_exact": "docs => '<t>' [, text_col, id_col]",
        "simhash_pairs": "docs => '<t>' [, max_hamming, text_col, "
                         "id_col, hasher]",
        "minhash_pairs": "docs => '<t>', threshold => 0.4 [, n, "
                         "num_hashes, bands, text_col, id_col]",
        "containment_pairs": "docs => '<t>', threshold => 0.9 [, n, "
                             "max_df, text_col, id_col]",
        "asof_join": "left => '<t>', right => '<t>', on => 'k[,k2]', "
                     "order_col => 'ts', carry_cols => 'a[,b]' [, "
                     "tiebreak_col, strict]",
        "tokenize": "docs => '<t>' [, algo => 'wordpiece'|'unigram'"
                    "|'bpe', top_k, n_merges, text_col, id_col]",
        "quality_scores": "docs => '<t>' [, text_col, id_col, "
                          "chars_col, carry_cols => 'a[,b]']",
        "lang_id": "docs => '<t>' [, text_col, id_col, "
                   "carry_cols => 'a[,b]']",
        "repetition_signals": "docs => '<t>' [, text_col, id_col, "
                              "carry_cols => 'a[,b]']",
        "stream_window": "events => '<t with ts/event_type/value>' "
                         "[, window => '6 hours', slide, "
                         "watermark => '1 hour']",
        "stream_sessionize": "events => '<t with ts/user_id/value>' "
                             "[, gap => '30 minutes', "
                             "watermark => '1 hour']",
    }

    def _reject_unresolved_table_fns(self, text: str) -> None:
        """A ``TABLE(fn(...))`` head surviving resolution means the
        argument list did not fit the named-scalar grammar (nested
        call, subquery, unbalanced quotes) or the function name is
        unknown. Spark's parser has no ``TABLE()`` form, so letting
        the raw text fall through surfaces as an unrelated Spark
        syntax error — refuse here with the supported grammar
        instead (VERDICT r12 'What's missing' item 4)."""
        from hands_on_trino_iceberg_superset_spark.dialect import (
            _in_literal,
        )

        for m in self._TABLE_FN_HEAD_RE.finditer(text):
            if _in_literal(text, m.start()):
                continue
            fn = m.group(1).lower()
            if fn in self._TABLE_FN_GRAMMAR:
                raise ValueError(
                    f"TABLE({fn}(...)): argument list could not be "
                    "parsed — arguments are named scalars only "
                    "(name => 'string' | integer | decimal; nested "
                    "function calls and subqueries are not "
                    "supported). Expected: "
                    f"TABLE({fn}({self._TABLE_FN_GRAMMAR[fn]}))"
                )
            raise ValueError(
                f"unknown table function {fn!r} in TABLE({fn}(...)); "
                "supported: "
                + ", ".join(sorted(self._TABLE_FN_GRAMMAR))
            )

    @staticmethod
    def _named_args(fn: str, raw: str, known: set[str],
                    required: set[str]) -> dict[str, object]:
        """Parse a table function's named-only argument list (string
        literals unquoted, everything else an int), refusing unknown
        or missing names loudly."""
        args: dict[str, object] = {}
        for part in _split_top_level(raw):
            if "=>" not in part:
                raise ValueError(
                    f"{fn} arguments must be named (k => 10, ...); "
                    f"got {part.strip()!r}"
                )
            key, val = part.split("=>", 1)
            val = val.strip()
            if val.startswith("'") and val.endswith("'"):
                args[key.strip().lower()] = val[1:-1].replace("''", "'")
            else:
                try:
                    args[key.strip().lower()] = int(val)
                except ValueError:
                    try:
                        # decimal scalars (minhash/containment
                        # thresholds); anything else is outside the
                        # named-scalar grammar and refuses loudly
                        args[key.strip().lower()] = float(val)
                    except ValueError:
                        raise ValueError(
                            f"{fn}: argument {key.strip()!r} must be "
                            f"a 'string', integer, or decimal scalar"
                            f"; got {val!r}"
                        ) from None
        unknown = set(args) - known
        if unknown:
            raise ValueError(
                f"unknown {fn} argument(s): {sorted(unknown)}"
            )
        missing = required - set(args)
        if missing:
            raise ValueError(
                f"{fn}: missing argument(s) "
                + ", ".join(f"{a} => '<table>'" for a in sorted(missing))
            )
        return args

    @staticmethod
    def _content_tag(raw: str) -> str:
        """Whitespace/case-insensitive digest of a table-function
        argument list — names the materialized view AND any memory
        sink after the CALL's content, so re-running the same
        statement replaces one registration instead of accumulating
        a new one per execution (a long-lived serving engine would
        otherwise leak a memory-sink table per streaming
        statement)."""
        import hashlib

        return hashlib.md5(
            re.sub(r"\s+", " ", raw.strip().lower()).encode()
        ).hexdigest()[:10]

    def _materialize_table_fn(self, fn: str, raw: str) -> str:
        df = {"ann_topk": self._table_fn_ann,
              "bm25_topk": self._table_fn_bm25,
              "hybrid_topk": self._table_fn_hybrid,
              "dedup_exact": self._table_fn_dedup_exact,
              "simhash_pairs": self._table_fn_simhash,
              "minhash_pairs": self._table_fn_minhash,
              "containment_pairs": self._table_fn_containment,
              "asof_join": self._table_fn_asof,
              "tokenize": self._table_fn_tokenize,
              "quality_scores": self._table_fn_quality_scores,
              "lang_id": self._table_fn_lang_id,
              "repetition_signals": self._table_fn_repetition_signals,
              "stream_window": self._table_fn_stream_window,
              "stream_sessionize":
                  self._table_fn_stream_sessionize}[fn](raw)
        # content-keyed name: re-resolving the same call (e.g. a view
        # body re-materialized through sql()) reuses one view
        view = f"__{fn}_{self._content_tag(raw)}"
        df.createOrReplaceTempView(view)
        return view

    def _ann_arm(self, fn: str, args: dict,
                 queries_df: "DataFrame | None" = None) -> "DataFrame":
        """The shared vector arm: exact cosine over ``corpus`` XOR a
        partition-pruned probe of a registered ``index``.
        ``queries_df`` lets hybrid_topk pass its already-stored
        queries frame instead of re-resolving (and re-computing) the
        view."""
        from hands_on_trino_iceberg_superset_spark.operators import (
            similarity as S,
        )

        if ("corpus" in args) == ("index" in args):
            raise ValueError(
                f"{fn}: exactly one of corpus => '<table>' "
                "(exact scan) or index => '<name>' (IVF probe) "
                "is required"
            )
        k = int(args.get("k", 10))
        id_col = str(args.get("id_col", "vec_id"))
        vec_col = str(args.get("vec_col", "embedding"))
        queries = (queries_df if queries_df is not None
                   else self.spark.table(str(args["queries"])))
        if fn == "hybrid_topk":
            # the hybrid queries table carries (qid, qtext, qvec);
            # shape the vector side to the corpus' column names
            queries = queries.select(
                F.col("qid").alias(id_col),
                F.col("qvec").alias(vec_col),
            )
        def cols(name: str) -> list[str]:
            return [c.strip() for c in str(args.get(name, "")).split(",")
                    if c.strip()]

        match_cols, exclude_cols = cols("match_cols"), cols("exclude_cols")
        if "index" in args:
            idx = self._ann_indexes.get(str(args["index"]).lower())
            if idx is None:
                raise ValueError(
                    f"{fn}: no ANN index registered as "
                    f"{args['index']!r} (register_ann_index)"
                )
            return S.ivf_probe(
                queries, idx, k=k,
                n_probe=int(args.get("n_probe", 4)),
                id_col=id_col, vec_col=vec_col,
                match_cols=match_cols or None,
                exclude_cols=exclude_cols or None,
            )
        if exclude_cols:
            raise ValueError(
                f"{fn}: exclude_cols (hard-negative mining) requires "
                "index => — the exact corpus arm supports match_cols "
                "only"
            )
        return S.cosine_topk(
            self.spark.table(str(args["corpus"])), queries,
            k=k, id_col=id_col, vec_col=vec_col,
            match_cols=match_cols or None,
        )

    def _table_fn_ann(self, raw: str) -> "DataFrame":
        args = self._named_args(
            "ann_topk", raw,
            known={"corpus", "index", "queries", "k", "n_probe",
                   "id_col", "vec_col", "match_cols", "exclude_cols"},
            required={"queries"},
        )
        return self._ann_arm("ann_topk", args)

    def _table_fn_bm25(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            retrieval as R,
        )

        args = self._named_args(
            "bm25_topk", raw,
            known={"docs", "queries", "k", "text_col", "id_col"},
            required={"docs", "queries"},
        )
        return R.bm25_topk(
            self.spark.table(str(args["docs"])),
            self.spark.table(str(args["queries"])),
            k=int(args.get("k", 10)),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
        )

    def _table_fn_dedup_exact(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            dedup as D,
        )

        args = self._named_args(
            "dedup_exact", raw,
            known={"docs", "text_col", "id_col"},
            required={"docs"},
        )
        return D.exact_duplicates(
            self.spark.table(str(args["docs"])),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
        )

    def _table_fn_simhash(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            dedup as D,
        )

        args = self._named_args(
            "simhash_pairs", raw,
            known={"docs", "max_hamming", "text_col", "id_col",
                   "hasher"},
            required={"docs"},
        )
        return D.simhash_pairs(
            self.spark.table(str(args["docs"])),
            max_hamming=int(args.get("max_hamming", 3)),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
            hasher=str(args.get("hasher", "xxhash64")),
        )

    def _table_fn_minhash(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            dedup as D,
        )

        args = self._named_args(
            "minhash_pairs", raw,
            known={"docs", "threshold", "n", "num_hashes", "bands",
                   "text_col", "id_col"},
            required={"docs", "threshold"},
        )
        return D.minhash_lsh_pairs(
            self.spark.table(str(args["docs"])),
            threshold=float(args["threshold"]),
            n=int(args.get("n", 2)),
            num_hashes=int(args.get("num_hashes", 32)),
            bands=int(args.get("bands", 16)),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
        )

    def _table_fn_containment(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            dedup as D,
        )

        args = self._named_args(
            "containment_pairs", raw,
            known={"docs", "threshold", "n", "max_df", "text_col",
                   "id_col"},
            required={"docs", "threshold"},
        )
        max_df = args.get("max_df")
        return D.containment_pairs_auto(
            self.spark.table(str(args["docs"])),
            threshold=float(args["threshold"]),
            n=int(args.get("n", 8)),
            max_df=int(max_df) if max_df is not None else None,
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
        )

    def _table_fn_asof(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            asof as A,
        )

        args = self._named_args(
            "asof_join", raw,
            known={"left", "right", "on", "order_col", "carry_cols",
                   "tiebreak_col", "strict"},
            required={"left", "right", "on", "order_col",
                      "carry_cols"},
        )

        def cols(val: object) -> list[str]:
            return [c.strip() for c in str(val).split(",")
                    if c.strip()]

        tb = args.get("tiebreak_col")
        return A.asof_join(
            self.spark.table(str(args["left"])),
            self.spark.table(str(args["right"])),
            on=cols(args["on"]),
            order_col=str(args["order_col"]),
            carry_cols=cols(args["carry_cols"]),
            tiebreak_col=str(tb) if tb is not None else None,
            strict=bool(int(args.get("strict", 0))),
        )

    def _table_fn_tokenize(self, raw: str) -> "DataFrame":
        """Tokenizer ENCODE as a table function — the last
        high-traffic LLM-pipeline family off the SQL seam (VERDICT
        r13 item 4). ``algo`` selects the word-level encode paths
        (``wordpiece`` greedy longest-match, ``unigram`` Viterbi —
        both return one row per DISTINCT corpus word: the
        vocab-bounded table a 100 TB corpus pass dictionary-joins
        against) or the document-level ``bpe`` stream (one row per
        document: tokens + conservation counts). Volume routing is
        the operators': the only corpus-sized op is the
        word-frequency groupBy; vocab selection and the Arrow-batch
        segmentation run on the vocab-sized word table."""
        args = self._named_args(
            "tokenize", raw,
            known={"docs", "algo", "top_k", "n_merges", "text_col",
                   "id_col"},
            required={"docs"},
        )
        docs = self.spark.table(str(args["docs"]))
        algo = str(args.get("algo", "wordpiece")).lower()
        text_col = str(args.get("text_col", "text"))
        if algo == "wordpiece":
            from hands_on_trino_iceberg_superset_spark.operators import (
                wordpiece as WP,
            )

            # vocab-sized, materialized once: vocab selection and
            # the encode pass both reference it (r14 optimization)
            words = WP.word_frequencies(docs, text_col) \
                .localCheckpoint(eager=False)
            return WP.encode_words(
                words, WP.select_vocab(
                    words, top_k=int(args.get("top_k", 40)))
            )
        if algo == "unigram":
            from hands_on_trino_iceberg_superset_spark.operators import (
                unigram as UG,
            )

            from hands_on_trino_iceberg_superset_spark.operators import (
                wordpiece as WP,
            )

            words = WP.word_frequencies(docs, text_col) \
                .localCheckpoint(eager=False)
            return UG.viterbi_encode(
                words, UG.prune_vocab(
                    words, int(args.get("top_k", 20)))
            )
        if algo == "bpe":
            from hands_on_trino_iceberg_superset_spark.operators import (
                bpe as B,
            )

            merges = B.bpe_train(
                docs, n_merges=int(args.get("n_merges", 16)),
                text_col=text_col,
            )
            return B.bpe_encode(
                docs, merges, text_col=text_col,
                id_col=str(args.get("id_col", "doc_id")),
            )
        raise ValueError(
            f"tokenize: unknown algo {algo!r}; supported: "
            "'wordpiece', 'unigram', 'bpe'"
        )

    # ----- streaming-statement cancellation ------------------------
    #
    # Spark job-group cancellation is thread-local, and a streaming
    # drain runs its jobs in the MICROBATCH thread — cancelJobGroup
    # against the statement's executing thread never reaches it. The
    # engine therefore tracks every live StreamingQuery a statement
    # starts, keyed by the statement's CANCEL SCOPE (the wire qid —
    # unique per statement, unlike an OS thread ident, which the
    # per-request threads recycle: a tid-keyed cancel could stop an
    # innocent later statement that reused the id). Outside a scope
    # (direct Engine.sql callers) the thread ident is the fallback
    # key. All registry/flag mutations hold _STREAMS_LOCK so a
    # cancel can never flag a query its drain already unregistered.

    @staticmethod
    def _cancel_scope_key():
        scope = getattr(_CANCEL_SCOPE, "token", None)
        return scope if scope is not None else threading.get_ident()

    def enter_cancel_scope(self, token: str) -> None:
        """Mark the current thread as executing statement ``token``
        (the wire server passes its qid); streams started until
        :meth:`exit_cancel_scope` register under it."""
        _CANCEL_SCOPE.token = token

    def exit_cancel_scope(self) -> None:
        token = getattr(_CANCEL_SCOPE, "token", None)
        _CANCEL_SCOPE.token = None
        if token is not None:
            with _STREAMS_LOCK:
                self._cancelled_scopes.discard(token)

    def _register_stream(self, query) -> None:
        with _STREAMS_LOCK:
            key = self._cancel_scope_key()
            self._thread_streams.setdefault(key, []).append(query)
            # a DELETE that beat this registration: flag-and-stop
            # NOW, or the drain would run to completion with only
            # its final status rewritten
            already_cancelled = key in self._cancelled_scopes
            if already_cancelled:
                self._cancelled_streams.add(query.id)
        if already_cancelled:
            try:
                query.stop()
            except Exception:  # noqa: BLE001 — cancel is best-effort
                pass

    def stop_streams_for_scope(self, key) -> int:
        """Stop every live streaming query registered under cancel
        scope ``key`` (a wire qid, or a thread ident for direct
        callers). Returns how many were stopped; best-effort per
        query. The cancelled flag is set under the lock BEFORE the
        stop, so the drain can never observe a stop without it
        (partial snapshot returned as a normal result)."""
        with _STREAMS_LOCK:
            targets = list(self._thread_streams.get(key, []))
            for q in targets:
                self._cancelled_streams.add(q.id)
            if isinstance(key, str):
                # remember the cancelled scope so a drain that has
                # not STARTED yet stops at registration (qids only —
                # the server clears this when the statement ends;
                # recycled thread idents must never persist)
                self._cancelled_scopes.add(key)
        stopped = 0
        for q in targets:
            try:
                q.stop()
                stopped += 1
            except Exception:  # noqa: BLE001 — cancel is best-effort
                pass
        return stopped

    # kept name for direct (non-wire) callers cancelling their own
    # thread's drains
    def stop_streams_for_thread(self, tid: int) -> int:
        return self.stop_streams_for_scope(tid)

    def _drain_stream_statement(self, out, sink_name: str):
        """Drain ``out`` into a memory sink with the query
        registered for cancellation while it runs. A drain stopped
        by a cancel raises — the memory sink holds at most a
        PARTIAL snapshot, and returning it as a normal result would
        be a silent wrong answer."""
        import uuid as _uuid

        from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (  # noqa: E501
            run_available_now_to_memory,
        )

        started: list = []

        def on_start(q) -> None:
            started.append(q)
            self._register_stream(q)

        def run(name: str):
            return run_available_now_to_memory(
                out, name, output_mode="complete", on_start=on_start,
            )

        was_cancelled = False
        retry_name = None
        try:
            try:
                result = run(sink_name)
            except Exception as exc:  # noqa: BLE001
                # content-keyed sink names collide when two clients
                # run the SAME statement concurrently (Spark refuses
                # a second ACTIVE query with the name) — retry once
                # under a unique suffix; serial re-runs still reuse
                # the one registration
                if "already active" not in str(exc):
                    raise
                retry_name = f"{sink_name}_{_uuid.uuid4().hex[:6]}"
                result = run(retry_name)
            # decouple the returned frame from the SHARED sink: a
            # later identical statement repopulates the same
            # content-keyed memory table batch by batch, and a still
            # -lazy earlier result reading through it would observe
            # an intermediate snapshot. localCheckpoint materializes
            # the result (aggregate-sized) to executor storage, so
            # every caller's frame is immutable from here on.
            result = result.localCheckpoint(eager=True)
            if retry_name is not None:
                # the one-off retry sink would otherwise pin a full
                # result snapshot in driver memory for the session
                self.spark.catalog.dropTempView(retry_name)
        finally:
            with _STREAMS_LOCK:
                key = self._cancel_scope_key()
                streams = self._thread_streams.get(key, [])
                for q in started:
                    if q in streams:
                        streams.remove(q)
                    if q.id in self._cancelled_streams:
                        was_cancelled = True
                        self._cancelled_streams.discard(q.id)
                if not streams:
                    self._thread_streams.pop(key, None)
        if was_cancelled:
            raise RuntimeError(
                "streaming statement cancelled before the drain "
                "completed; partial snapshot discarded"
            )
        return result

    def _table_as_stream(self, name: str, tmp_prefix: str):
        """Turn a registered (batch) table into a file-source
        stream for the streaming seam. Zero-copy when the table is
        a bare parquet scan — the stream reads the table's OWN
        files (streamable_parquet_root; the 100 TB path: no corpus
        rewrite); any derived frame (projection, filter, join)
        snapshots to a temp parquet source first, which is correct
        for every plan shape. At production scale both swap for
        Kafka with everything downstream unchanged."""
        import os
        import tempfile

        from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (  # noqa: E501
            streamable_parquet_root,
            streamable_projected_scan,
        )

        df = self.spark.table(name)
        root = streamable_parquet_root(df)
        if root is not None:
            return (
                self.spark.readStream.schema(df.schema).parquet(root)
            )
        # r14 optimization round: a deterministic Project/Filter
        # chain over one parquet relation (the normalized events
        # view) streams the relation's own files with the chain
        # re-applied — no corpus rewrite; any other shape still
        # snapshots
        projected = streamable_projected_scan(df)
        if projected is not None:
            return projected
        src = os.path.join(tempfile.mkdtemp(prefix=tmp_prefix), "src")
        df.write.mode("overwrite").parquet(src)
        return (
            self.spark.readStream.schema(df.schema)
            .option("recursiveFileLookup", "true").parquet(src)
        )

    def _table_fn_stream_window(self, raw: str) -> "DataFrame":
        """Windowed event-time aggregation run through the
        STRUCTURED STREAMING engine from plain SQL — the streaming
        family's seam entry (the last family off the seam, VERDICT
        r13 'What's missing' item 4). The named table becomes a file
        stream (_table_as_stream: zero-copy from the table's own
        parquet files when it is a bare scan, temp snapshot for
        derived frames), runs through
        streaming/pipeline.windowed_event_stats (watermark + window
        + DECIMAL-stable totals — the exact incremental operator,
        not the batch twin), and drains with an availableNow trigger
        into a memory sink whose final COMPLETE-mode snapshot is the
        returned frame. Batch/stream parity is the operator's
        guarantee (tests/test_streaming.py); at production scale the
        file source swaps for Kafka and everything downstream is
        unchanged."""
        from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (  # noqa: E501
            windowed_event_stats,
        )

        args = self._named_args(
            "stream_window", raw,
            known={"events", "window", "slide", "watermark"},
            required={"events"},
        )
        stream = self._table_as_stream(
            str(args["events"]), "sql_stream_window_"
        )
        slide = args.get("slide")
        out = windowed_event_stats(
            stream,
            window_duration=str(args.get("window", "6 hours")),
            watermark=str(args.get("watermark", "1 hour")),
            slide_duration=str(slide) if slide is not None else None,
        )
        return self._drain_stream_statement(
            out, f"__stream_window_{self._content_tag(raw)}"
        )

    def _table_fn_stream_sessionize(self, raw: str) -> "DataFrame":
        """Dynamic-gap session windows through the STREAMING engine
        from plain SQL (Spark's session_window — the operator the
        reference stack has no equivalent for), same table ->
        file-stream -> availableNow -> memory-sink drain as
        ``stream_window``."""
        from hands_on_trino_iceberg_superset_spark.streaming.pipeline import (  # noqa: E501
            sessionize,
        )

        args = self._named_args(
            "stream_sessionize", raw,
            known={"events", "gap", "watermark"},
            required={"events"},
        )
        stream = self._table_as_stream(
            str(args["events"]), "sql_stream_sessionize_"
        )
        out = sessionize(
            stream,
            gap=str(args.get("gap", "30 minutes")),
            watermark=str(args.get("watermark", "1 hour")),
        )
        return self._drain_stream_statement(
            out, f"__stream_sessionize_{self._content_tag(raw)}"
        )

    @staticmethod
    def _carry_cols(args: dict) -> list[str]:
        """Parse the comma-separated ``carry_cols`` argument shared
        by the textstats-family table functions."""
        return [c.strip()
                for c in str(args.get("carry_cols", "")).split(",")
                if c.strip()]

    def _table_fn_quality_scores(self, raw: str) -> "DataFrame":
        """Per-document quality scoring from SQL — the text-analysis
        family's seam entry (zero-exchange pure map; plan-gated)."""
        from hands_on_trino_iceberg_superset_spark.operators import (
            textstats as TS,
        )

        args = self._named_args(
            "quality_scores", raw,
            known={"docs", "text_col", "id_col", "chars_col",
                   "carry_cols"},
            required={"docs"},
        )
        chars = args.get("chars_col")
        carry = self._carry_cols(args)
        return TS.quality_scores(
            self.spark.table(str(args["docs"])),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
            chars_col=str(chars) if chars is not None else None,
            carry_cols=carry,
        )

    def _table_fn_lang_id(self, raw: str) -> "DataFrame":
        """Per-document language-ID heuristic from SQL; carry_cols
        pass label columns through so a downstream confusion matrix
        needs no join back to the corpus."""
        from hands_on_trino_iceberg_superset_spark.operators import (
            textstats as TS,
        )

        args = self._named_args(
            "lang_id", raw,
            known={"docs", "text_col", "id_col", "carry_cols"},
            required={"docs"},
        )
        carry = self._carry_cols(args)
        return TS.lang_id(
            self.spark.table(str(args["docs"])),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
            carry_cols=carry,
        )

    def _table_fn_repetition_signals(self, raw: str) -> "DataFrame":
        """Per-document Gopher repetition counts from SQL (exact
        integers — downstream flags/ratios stay engine-exact);
        carry_cols pass metadata through so per-source reports need
        no join back to the corpus. Zero-shuffle pure map like the
        rest of the textstats seam."""
        from hands_on_trino_iceberg_superset_spark.operators import (
            textstats as TS,
        )

        args = self._named_args(
            "repetition_signals", raw,
            known={"docs", "text_col", "id_col", "carry_cols"},
            required={"docs"},
        )
        carry = self._carry_cols(args)
        return TS.repetition_signals(
            self.spark.table(str(args["docs"])),
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
            carry_cols=carry,
        )

    def _table_fn_hybrid(self, raw: str) -> "DataFrame":
        from hands_on_trino_iceberg_superset_spark.operators import (
            retrieval as R,
        )

        args = self._named_args(
            "hybrid_topk", raw,
            known={"docs", "corpus", "index", "queries", "k", "c",
                   "n_probe", "text_col", "id_col", "vec_col"},
            required={"docs", "queries"},
        )
        k = int(args.get("k", 10))
        # the queries table is read by BOTH arms (qtext for BM25,
        # qvec for the vector ranker); a temp view defined over a
        # join/projection would re-run it per arm, so store it once —
        # query batches are small by the broadcast contract (r15
        # optimization round)
        queries = self.spark.table(str(args["queries"])) \
            .localCheckpoint(eager=False)
        lex = R.bm25_topk(
            self.spark.table(str(args["docs"])),
            queries.select("qid", "qtext"),
            k=k,
            text_col=str(args.get("text_col", "text")),
            id_col=str(args.get("id_col", "doc_id")),
        )
        vec = self._ann_arm("hybrid_topk", args,
                            queries_df=queries).select(
            F.col("query_id").alias("qid"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        return R.rrf_fuse(lex, vec, k=k, c=int(args.get("c", 60)))

    # -- Trino SHOW family (output-shape parity) ------------------------
    #
    # Spark's own SHOW statements answer with different column names
    # and shapes than Trino's (SHOW COLUMNS: Spark's single col_name
    # vs Trino's Column/Type/Extra/Comment; SHOW TABLES: Spark's
    # namespace/tableName/isTemporary vs Trino's single Table), and
    # SHOW SCHEMAS FROM <catalog> only parses when the alias catalog
    # is registered. A Trino client (CLI tab-completion, DBeaver,
    # Superset's schema browser) expects Trino's exact spellings, so
    # the trino_sql path serves these four from the same catalog
    # snapshot machinery as information_schema; the Spark-dialect
    # Engine.sql path keeps Spark's native shapes.

    _TRINO_SHOW_RE = re.compile(
        r"^\s*SHOW\s+(CATALOGS|SCHEMAS|TABLES|COLUMNS|FUNCTIONS)\b"
        r'(?:\s+(?:FROM|IN)\s+("?[\w.]+"?))?'
        r"(?:\s+LIKE\s+'((?:[^']|'')*)')?\s*;?\s*$",
        re.IGNORECASE,
    )

    #: Trino's bare ``DESCRIBE <table>`` / ``DESC <table>`` is an
    #: alias for SHOW COLUMNS (Spark's ``DESCRIBE TABLE`` spelling
    #: passes through to Spark with Spark's shape; INPUT/OUTPUT are
    #: the wire server's prepared-statement forms)
    _TRINO_DESCRIBE_RE = re.compile(
        r"^\s*DESC(?:RIBE)?\s+(?!INPUT\b|OUTPUT\b|TABLE\b)"
        r'("?[\w.]+"?)\s*;?\s*$',
        re.IGNORECASE,
    )

    @staticmethod
    def _like_filter(names: list[str], pattern: str | None) -> list[str]:
        """Trino's SHOW ... LIKE: SQL LIKE semantics (% and _)."""
        if pattern is None:
            return names
        rx = re.compile(
            "^" + re.escape(pattern.replace("''", "'"))
            .replace("%", ".*").replace("_", ".") + "$"
        )
        return [n for n in names if rx.match(n)]

    def _catalog_names(self) -> set[str]:
        """The ONE catalog set every catalog-shaped answer serves
        (SHOW CATALOGS, SHOW SCHEMAS FROM validation; the wire
        server's _known_catalogs reads the same shape) — the two
        built-ins plus whatever the Spark session has registered."""
        cats = {self._INFO_CATALOG, "spark_catalog"}
        try:
            cats |= {c.name for c in self.spark.catalog.listCatalogs()}
        except Exception:
            pass
        return cats

    #: window-ranking functions Spark files under plain
    #: ``expressions`` (no package marker to classify by)
    _WINDOW_FN_NAMES = frozenset({
        "rank", "dense_rank", "row_number", "percent_rank",
        "cume_dist", "ntile", "lag", "lead", "nth_value",
    })

    #: per-row nondeterministic builtins (Trino's Deterministic
    #: column means "same arguments -> same value")
    _NONDETERMINISTIC_FN_NAMES = frozenset({
        "rand", "randn", "random", "uuid", "shuffle",
        "monotonically_increasing_id", "randstr", "uniform",
    })

    def _show_functions(self, like: str | None) -> DataFrame:
        """Trino's ``SHOW FUNCTIONS`` output shape (Function, Return
        Type, Argument Types, Function Type, Deterministic,
        Description) over THIS engine's function catalog — the
        statement Superset's SQL Lab autocomplete issues. Documented
        divergence: the function INVENTORY is Spark's, not Trino's
        (autocomplete must reflect what actually executes here), and
        Return/Argument Types are served empty — Spark resolves
        signatures per call site (many builtins accept any orderable
        type), so any single printed signature would be wrong.
        Function Type classifies from the implementing class's
        package (aggregate) plus the ranking-function names Spark
        files under plain expressions (window); generators register
        as scalar, matching how they compose in a SELECT list."""
        rows = []
        for f in self.spark.catalog.listFunctions():
            cls = f.className or ""
            if ".aggregate." in cls:
                ftype = "aggregate"
            elif f.name.lower() in self._WINDOW_FN_NAMES:
                ftype = "window"
            else:
                ftype = "scalar"
            rows.append((
                f.name, "", "", ftype,
                f.name.lower() not in self._NONDETERMINISTIC_FN_NAMES,
                f.description or "",
            ))
        names = self._like_filter(sorted(r[0] for r in rows), like)
        keep = set(names)
        return self.spark.createDataFrame(
            sorted((r for r in rows if r[0] in keep)),
            "Function string, `Return Type` string, "
            "`Argument Types` string, `Function Type` string, "
            "Deterministic boolean, Description string",
        )

    def _resolve_trino_show(self, text: str) -> DataFrame | None:
        """Serve SHOW CATALOGS/SCHEMAS/TABLES/COLUMNS with Trino's
        output shape (column spellings and types), or None when the
        statement is not one of them (SHOW STATS / SHOW CREATE VIEW
        keep their own handlers)."""
        m = self._TRINO_SHOW_RE.match(text)
        if m:
            kind = m.group(1).upper()
            target = m.group(2).strip('"') if m.group(2) else None
            like = m.group(3)
        else:
            m = self._TRINO_DESCRIBE_RE.match(text)
            if not m:
                return None
            kind, target, like = "COLUMNS", m.group(1).strip('"'), None

        def one_col(col: str, names: list[str]) -> DataFrame:
            return self.spark.createDataFrame(
                [(n,) for n in self._like_filter(sorted(names), like)],
                f"{col} string",
            )

        if kind == "CATALOGS":
            return one_col("Catalog", list(self._catalog_names()))
        if kind == "SCHEMAS":
            # validate against the SAME catalog set SHOW CATALOGS
            # serves (r12 ADVICE: a catalog listed there could be
            # refused here when only the two built-ins were checked)
            if target is not None and target.lower() not in {
                c.lower() for c in self._catalog_names()
            }:
                raise ValueError(f"unknown catalog: {target!r}")
            schemas = {self.default_schema, "information_schema"}
            try:
                schemas |= {d.name for d in
                            self.spark.catalog.listDatabases()}
            except Exception:
                pass
            return one_col("Schema", list(schemas))
        if kind == "FUNCTIONS":
            return self._show_functions(like)
        if kind == "TABLES":
            schema = (target or self.default_schema).lower()
            # a catalog-qualified FROM (iceberg.demo) folds to the
            # schema part, same defaulting as the dialect strip
            if "." in schema:
                schema = schema.rsplit(".", 1)[1]
            names = [name for s, name, _, _ in self._info_entries()
                     if s.lower() == schema]
            return one_col("Table", names)
        # SHOW COLUMNS FROM <table>
        if target is None:
            raise ValueError("SHOW COLUMNS requires FROM <table>")
        from hands_on_trino_iceberg_superset_spark.dialect import (
            trino_type,
        )

        name = target
        for prefix in (f"{self._INFO_CATALOG}.",):
            if name.lower().startswith(prefix):
                name = name[len(prefix):]
        parts = name.split(".")
        if len(parts) == 2 and parts[0].lower() == \
                self.default_schema.lower() and \
                self.spark.catalog.tableExists(parts[1]):
            name = parts[1]  # default schema = temp-view namespace
        fields = self.spark.table(name).schema.fields
        return self.spark.createDataFrame(
            [(f.name, trino_type(f.dataType.simpleString()), "", "")
             for f in fields],
            "Column string, Type string, Extra string, "
            "Comment string",
        )

    def trino_sql(self, text: str) -> DataFrame:
        """Execute a Trino-dialect statement (the reference's own SQL
        flavor, seed.sh / README.md) through the dialect shims.

        When the `iceberg` alias catalog is registered on this session
        (session.py:ALIAS_CATALOG_JAR), three-part identifiers pass
        through and resolve natively; otherwise the dialect strips the
        catalog qualifier as a fallback. The SHOW family
        (CATALOGS/SCHEMAS/TABLES/COLUMNS) answers in Trino's exact
        output shape (:meth:`_resolve_trino_show`)."""
        from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

        show = self._resolve_trino_show(text)
        if show is not None:
            return show

        has_alias = bool(
            self.spark.conf.get("spark.sql.catalog.iceberg", None)
        )
        # time-travel rewriting needs the bare table name, so the
        # catalog prefix is stripped first even when the alias
        # catalog could resolve it
        strip = (
            ("iceberg",) if self._versioned or not has_alias else ()
        )
        return self.sql(trino_to_spark(text, strip_catalogs=strip))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- readiness (reference seed.sh:32-59) ---------------------------

    def ready(self) -> bool:
        """``SELECT 1`` + catalog-visibility probe."""
        try:
            self.sql("SELECT 1").collect()
            self.sql("SHOW CATALOGS").collect()
            return True
        except Exception:
            return False

    # -- DDL helpers (reference seed.sh:65-69) -------------------------

    def create_schema(self, name: str | None = None, location: str | None = None) -> None:
        schema = name or self.default_schema
        loc = f" LOCATION '{location}'" if location else ""
        self.sql(f"CREATE DATABASE IF NOT EXISTS {schema}{loc}")

    def drop_table(self, name: str) -> None:
        self.sql(f"DROP TABLE IF EXISTS {name}")

    # -- introspection (reference init_db.py:63-67) --------------------

    def columns(self, table: str) -> list[ColumnInfo]:
        """Machine-readable column metadata, ``get_columns`` shaped."""
        df = self.spark.table(table)
        return [
            ColumnInfo(name=f.name, type=f.dataType.simpleString(), nullable=f.nullable)
            for f in df.schema.fields
        ]

    def tables(self, schema: str | None = None) -> list[str]:
        return [
            t.name
            for t in self.spark.catalog.listTables(schema or self.default_schema)
        ]

    def describe(self, table: str) -> DataFrame:
        return self.sql(f"DESCRIBE TABLE {table}")

    # -- versioned tables: SQL time travel (Iceberg surface) -----------

    #: ``t FOR VERSION AS OF 3`` / ``t FOR TIMESTAMP AS OF TIMESTAMP '…'``
    _TIME_TRAVEL = re.compile(
        r"\b(\w+)\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
        r"(?:TIMESTAMP\s+)?('(?:[^']|'')*'|\d+)",
        re.IGNORECASE,
    )

    def register_iceberg_table(self, name: str, table_or_path) -> None:
        """Expose a SPEC-format Iceberg table
        (:class:`lakehouse.iceberg.IcebergTable` or its directory) to
        the full SQL surface: current-state SELECT, Trino time-travel
        syntax (``FOR VERSION AS OF <snapshot-id>`` /
        ``FOR TIMESTAMP AS OF``), and routed DELETE/UPDATE/INSERT
        (copy-on-write, one snapshot per statement) — the same
        contract :meth:`register_versioned_table` gives the bespoke
        format, now over metadata any Iceberg reader shares."""
        from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
            IcebergTable,
        )

        t = (
            IcebergTable.load(self.spark, table_or_path)
            if isinstance(table_or_path, str) else table_or_path
        )
        self.register_versioned_table(name, _IcebergSqlAdapter(t))

    def register_versioned_table(self, name: str, table) -> None:
        """Expose a :class:`lakehouse.VersionedTable` to SQL: the
        CURRENT state queries as ``name``, and Trino/Iceberg
        time-travel syntax (``FOR VERSION AS OF`` /
        ``FOR TIMESTAMP AS OF``) resolves against its snapshot
        history. Re-registering refreshes the current-state view.
        Tables exposing ``metadata_table`` (spec Iceberg) also get
        Trino's ``tbl$snapshots``-style introspection views,
        refreshed on every (re-)registration so SQL DML keeps them
        current."""
        table.read().createOrReplaceTempView(name)
        # a re-registration can carry an evolved schema under the
        # same name — invisible to the snapshot cache's entry list
        self._infoschema_state["version"] += 1
        # Spark resolves view names case-insensitively; the DML/DDL/
        # time-travel routing must agree, so the registry is keyed
        # lowercase and every lookup folds case
        self._versioned[name.lower()] = table
        meta_src = getattr(table, "table", table)
        if hasattr(meta_src, "metadata_table"):
            # Spark view names reject '$', so the Trino-spelled
            # identifier (`tbl$snapshots` / "tbl$snapshots") is
            # rewritten by Engine.sql onto a safe twin view
            for kind in ("snapshots", "history", "refs", "manifests",
                         "files", "partitions"):
                safe = f"__meta_{name}__{kind}"
                meta_src.metadata_table(kind).createOrReplaceTempView(
                    safe
                )
                self._meta_views[f"{name}${kind}"] = safe

    _CALL = re.compile(
        r"^\s*CALL\s+(?:\w+\.)?system\.(\w+)\s*\((.*)\)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    def _resolve_call(self, text: str) -> DataFrame | None:
        """Trino/Spark procedure syntax — ``CALL <catalog>.system.
        <proc>(...)`` — for the Iceberg maintenance surface the
        reference's catalog enables (``iceberg.properties:19``
        switches ``register_table`` on):

        - ``register_table(table_name => 't', table_location => p)``
          (Trino's ``schema_name`` accepted and ignored — registered
          names are flat here)
        - ``add_files(table => 't', location => p)``
        - ``expire_snapshots(table => 't'[, retain_last => n])``
        - ``rewrite_data_files(table => 't')``
        - ``rewrite_manifests(table => 't')``
        - ``remove_orphan_files(table => 't'[, dry_run => true])``
        - ``cherrypick_snapshot(table => 't', snapshot_id => n)``

        Positional arguments work in the same order. Returns a small
        status DataFrame, or None when the text is not a CALL."""
        m = self._CALL.match(text)
        if not m:
            return None
        proc = m.group(1).lower()
        raw_args = [
            a.strip() for a in _split_top_level(m.group(2)) if a.strip()
        ]
        named: dict[str, str] = {}
        pos: list[str] = []

        def unlit(v: str):
            v = v.strip()
            if v.startswith("'") and v.endswith("'"):
                return v[1:-1].replace("''", "'")
            if v.lower() in ("true", "false"):
                return v.lower() == "true"
            return int(v)

        for a in raw_args:
            if "=>" in a:
                k, v = a.split("=>", 1)
                named[k.strip().lower()] = unlit(v)
            else:
                pos.append(unlit(a))

        def arg(name: str, idx: int, default=None, required=True):
            if name in named:
                return named[name]
            if idx < len(pos):
                return pos[idx]
            if required and default is None:
                raise ValueError(
                    f"CALL system.{proc}: missing argument {name!r}"
                )
            return default

        from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
            IcebergTable,
        )

        def status(msg: str) -> DataFrame:
            return self.spark.createDataFrame(
                [(msg,)], "result string"
            )

        if proc == "register_table":
            # Trino signature: (schema_name, table_name, table_location)
            off = 1 if ("schema_name" not in named and len(pos) == 3) \
                else 0
            name = arg("table_name", 0 + off)
            loc = arg("table_location", 1 + off)
            self.register_iceberg_table(name, loc)
            return status(f"registered {name}")

        def ice_of(name: str) -> IcebergTable:
            adapter = self._versioned.get(str(name).lower())
            inner = getattr(adapter, "table", None)
            if inner is None or not isinstance(inner, IcebergTable):
                raise ValueError(
                    f"CALL system.{proc}: {name!r} is not a "
                    "registered Iceberg table"
                )
            return inner

        if proc == "add_files":
            t = ice_of(arg("table", 0))
            n = t.add_files(str(arg("location", 1)))
            self.register_iceberg_table(str(arg("table", 0)), t)
            return status(f"added {n} files")
        if proc == "expire_snapshots":
            t = ice_of(arg("table", 0))
            keep = arg("retain_last", 1, default=1, required=False)
            expired = t.expire_snapshots(keep_last=int(keep))
            return status(f"expired {len(expired)} snapshots")
        if proc == "rewrite_data_files":
            name = arg("table", 0)
            t = ice_of(name)
            t.rewrite_data_files()
            self.register_iceberg_table(str(name), t)
            return status("rewritten")
        if proc == "rewrite_manifests":
            name = arg("table", 0)
            t = ice_of(name)
            did = t.rewrite_manifests()
            self.register_iceberg_table(str(name), t)
            return status("manifests rewritten" if did
                          else "no-op (single manifest)")
        if proc == "remove_orphan_files":
            t = ice_of(arg("table", 0))
            dry = bool(arg("dry_run", 1, default=True, required=False))
            orphans = t.remove_orphan_files(dry_run=dry)
            return status(f"{len(orphans)} orphan files"
                          f"{' (dry run)' if dry else ' removed'}")
        if proc == "cherrypick_snapshot":
            name = arg("table", 0)
            t = ice_of(name)
            t.cherry_pick(int(arg("snapshot_id", 1)))
            self.register_iceberg_table(str(name), t)
            return status("cherry-picked")
        raise ValueError(f"unknown procedure system.{proc}")

    _ALTER_ADD = re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+"
        r"([\w]+(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)\s*;?\s*$",
        re.IGNORECASE,
    )
    _ALTER_RENAME = re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+"
        r"(\w+)\s*;?\s*$",
        re.IGNORECASE,
    )
    _ALTER_DROP = re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$",
        re.IGNORECASE,
    )
    _ALTER_TYPE = re.compile(
        r"^\s*ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+"
        r"(?:SET\s+DATA\s+)?TYPE\s+"
        r"([\w]+(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)\s*;?\s*$",
        re.IGNORECASE,
    )

    def _resolve_versioned_alter(self, text: str) -> DataFrame | None:
        """Route ALTER TABLE schema-evolution statements (both Trino's
        ``SET DATA TYPE`` and Spark's ``TYPE`` spelling) to the
        registered table's metadata-only evolution: ADD COLUMN,
        RENAME COLUMN, DROP COLUMN, widening type promotion. Returns
        a one-row status DataFrame, or None when the statement is not
        ours (plain Spark SQL handles or rejects it downstream)."""
        from pyspark.sql import types as T

        def parse_spark_type(s: str) -> T.DataType:
            return T._parse_datatype_string(s)

        def ice_type(s: str) -> str:
            dt = parse_spark_type(s)
            m = {"integer": "int", "bigint": "long", "float": "float",
                 "double": "double"}
            simple = dt.simpleString()
            return m.get(simple, simple)  # decimal(p,s) passes through

        for pattern in (self._ALTER_ADD, self._ALTER_RENAME,
                        self._ALTER_DROP, self._ALTER_TYPE):
            m = pattern.match(text)
            if not m or m.group(1).lower() not in self._versioned:
                continue
            name = m.group(1)
            adapter = self._versioned[name.lower()]
            inner = getattr(adapter, "table", adapter)
            spec = hasattr(inner, "rename_column")  # spec IcebergTable
            if pattern is self._ALTER_ADD:
                if spec:
                    inner.add_column(m.group(2),
                                     parse_spark_type(m.group(3)))
                else:
                    inner.add_column(m.group(2), m.group(3))
            elif not spec:
                raise ValueError(
                    f"{name!r} is a bespoke versioned table; only ADD "
                    "COLUMN is supported — register a spec Iceberg "
                    "table for rename/drop/type evolution"
                )
            elif pattern is self._ALTER_RENAME:
                inner.rename_column(m.group(2), m.group(3))
            elif pattern is self._ALTER_DROP:
                inner.drop_column(m.group(2))
            else:
                inner.promote_column(m.group(2), ice_type(m.group(3)))
            # refresh the current-state + metadata views
            self.register_versioned_table(name, adapter)
            return self.spark.createDataFrame(
                [("OK",)], "result string"
            )
        return None

    _DML_DELETE = re.compile(
        r"^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DML_UPDATE = re.compile(
        r"^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DML_INSERT = re.compile(
        r"^\s*INSERT\s+INTO\s+(\w+)\s+(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    def _resolve_versioned_dml(self, text: str) -> DataFrame | None:
        """Route DELETE/UPDATE/INSERT statements that target a
        registered versioned table through its copy-on-write DML;
        returns the statement's result DataFrame (rows_affected, like
        an engine's update count), or None when the statement is not
        versioned-table DML (plain Spark SQL handles it)."""
        for pattern in (self._DML_DELETE, self._DML_UPDATE,
                        self._DML_INSERT):
            m = pattern.match(text)
            if not m or m.group(1).lower() not in self._versioned:
                continue
            name = m.group(1)
            table = self._versioned[name.lower()]
            before = table.current().row_count
            if pattern is self._DML_DELETE:
                table.delete(m.group(2))
                affected = before - table.current().row_count
            elif pattern is self._DML_UPDATE:
                assignments = {
                    k.strip(): v.strip()
                    for k, v in (
                        a.split("=", 1)
                        for a in _split_top_level(m.group(2))
                    )
                }
                where = m.group(3) if m.group(3) else "true"
                # rows_affected = rows the predicate matches (row
                # count is unchanged by UPDATE, so a before/after
                # delta can't measure it)
                affected = table.read().where(where).count()
                table.update(assignments, where=where)
            else:
                body = m.group(2).strip()
                if body.upper().startswith("VALUES"):
                    src = self.spark.sql(
                        f"SELECT * FROM (VALUES {body[len('VALUES'):]})"
                    )
                elif body.upper().startswith("SELECT"):
                    src = self.spark.sql(self._resolve_time_travel(body))
                else:
                    # column-list or other forms: not routed; plain
                    # Spark SQL gives the proper error downstream
                    continue
                # SQL INSERT coerces literals to the target schema
                # (a DECIMAL 1.5 must land in a DOUBLE column as a
                # double, not as a mismatched physical type)
                target = table.read()
                src = src.toDF(*target.columns).select(
                    *[
                        F.col(c).cast(dt).alias(c)
                        for c, dt in target.dtypes
                    ]
                )
                table.append(src)
                affected = table.current().row_count - before
            # refresh the current-state view
            self.register_versioned_table(name, table)
            return self.spark.createDataFrame(
                [(affected,)], "rows_affected long"
            )
        return None

    def _resolve_time_travel(self, text: str):
        def sub(m) -> str:
            name, kind, lit = m.group(1), m.group(2).upper(), m.group(3)
            table = self._versioned.get(name.lower())
            if table is None:
                return m.group(0)  # not ours; let Spark handle/raise
            if kind == "VERSION":
                if lit.startswith("'"):
                    # Trino's branch/tag form: FOR VERSION AS OF 'ref'
                    ref = lit.strip("'")
                    inner = getattr(table, "table", None)
                    if not hasattr(inner, "read") or not hasattr(
                            inner, "refs"):
                        raise ValueError(
                            f"FOR VERSION AS OF {lit}: named refs "
                            "need a spec Iceberg table; "
                            f"{name!r} has numeric versions only"
                        )
                    df = inner.read(ref=ref)
                    tag = "".join(
                        c if c.isalnum() else "_" for c in ref
                    )
                else:
                    df = table.read(version=int(lit))
                    tag = lit
            else:
                # canonicalize the SQL literal through a real
                # datetime parse (handles date-only, minute- and
                # second-precision forms) into the snapshot-ts shape
                # — ISO 'T'-separated UTC with microseconds and Z —
                # so the lexicographic comparison in read(as_of=) is
                # a correct time comparison and exact-boundary
                # snapshots are included
                import datetime as _dt

                parsed = _dt.datetime.fromisoformat(
                    lit.strip("'").rstrip("Zz")
                )
                if parsed.tzinfo is not None:
                    # a literal carrying a UTC offset (e.g.
                    # '… 10:00:00+05:30') must be converted to UTC —
                    # strftime would silently DROP the offset and
                    # reinterpret the wall-clock as UTC, selecting
                    # the wrong snapshot
                    parsed = parsed.astimezone(
                        _dt.timezone.utc
                    ).replace(tzinfo=None)
                as_of = parsed.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
                df = table.read(as_of=as_of)
                tag = "".join(c if c.isalnum() else "_" for c in as_of)
            view = f"{name}__asof_{tag}"
            df.createOrReplaceTempView(view)
            return view

        return self._TIME_TRAVEL.sub(sub, text)

    # -- table adoption (reference iceberg.properties:19, S8) ----------

    def register_table(self, name: str, location: str,
                       file_format: str = "parquet") -> None:
        """Adopt existing data as a queryable table — Iceberg's
        ``register_table`` procedure (enabled in the reference at
        ``compose/trino/catalog/iceberg.properties:19``).

        If ``location`` holds REAL Iceberg metadata (a ``metadata/``
        dir with ``*.metadata.json``), the table is adopted through
        the spec reader (:mod:`.lakehouse.iceberg`): its manifests —
        not a directory listing — decide the live files, so deleted
        or uncommitted files are invisible, and the view always
        reflects the current snapshot at registration time. Plain
        data directories fall back to an external Spark table over
        the files. Dropping either later leaves the files in place."""
        import os

        if os.path.isdir(os.path.join(location, "metadata")) and any(
            f.endswith(".metadata.json")
            for f in os.listdir(os.path.join(location, "metadata"))
        ):
            from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
                load_iceberg,
            )

            load_iceberg(self.spark, location).createOrReplaceTempView(name)
            return
        self.sql(
            f"CREATE TABLE IF NOT EXISTS {name} USING {file_format} "
            f"LOCATION '{location}'"
        )

    # -- result output (reference seed.sh:9 --output-format CSV, S11) --

    def to_csv(self, df: DataFrame, limit: int | None = None) -> str:
        """Render a result as CSV text, the seeder-CLI sink shape.
        Driver-side by design — results at this point are small
        (verification outputs, chart pages); large exports go through
        ``df.write.csv`` instead."""
        import csv
        import io

        rows = df.limit(limit).collect() if limit else df.collect()
        buf = io.StringIO()
        writer = csv.writer(buf)
        writer.writerow(df.columns)
        for r in rows:
            writer.writerow(list(r))
        return buf.getvalue()

    # -- cost surface (reference superset_config.py:3-5, M7) -----------

    def explain_cost(self, sql_text: str) -> str:
        """EXPLAIN with statistics — the query-cost-estimation surface
        Superset's ESTIMATE_QUERY_COST flag would call (explicitly
        disabled in the reference at ``superset_config.py:3-5``,
        available here)."""
        return self.explain(sql_text, type_="IO")

    #: read-only statement heads EXPLAIN accepts — anything else
    #: (routed DDL/DML, CALL, Spark commands) EXECUTES inside
    #: ``spark.sql``/the engine handlers, and an EXPLAIN must never
    #: execute
    _EXPLAINABLE = re.compile(
        r"^\s*(SELECT|WITH|VALUES|TABLE|SHOW|DESCRIBE)\b",
        re.IGNORECASE,
    )

    def explain(self, sql_text: str, type_: str = "DISTRIBUTED",
                trino: bool = False) -> str:
        """Trino's ``EXPLAIN (TYPE <t>)`` semantics over the Spark
        planner: LOGICAL -> parsed/analyzed/optimized plans
        (``extended``), DISTRIBUTED (Trino's default) -> the physical
        plan with its exchanges (``formatted``), IO -> plan with
        statistics (``cost``). Analysis-only: the statement is
        restricted to read shapes so EXPLAIN can never execute
        anything."""
        modes = {"LOGICAL": "extended", "DISTRIBUTED": "formatted",
                 "IO": "cost"}
        t = type_.upper()
        if t not in modes:
            raise ValueError(
                f"EXPLAIN type {type_!r} not supported "
                f"(one of {sorted(modes)} or VALIDATE)"
            )
        if not self._EXPLAINABLE.match(sql_text):
            raise ValueError(
                "EXPLAIN supports read statements only (DDL/DML "
                "routes through handlers that execute)"
            )
        self._reject_streaming_explain(sql_text, "EXPLAIN")
        df = self.trino_sql(sql_text) if trino else self.sql(sql_text)
        return self.spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), modes[t]
        )

    #: streaming table-function heads: RESOLVING one executes the
    #: availableNow drain (the returned frame is the drained memory
    #: sink), so a plain EXPLAIN over it would run the job it
    #: promises only to plan
    _STREAM_FN_RE = re.compile(
        r"TABLE\s*\(\s*stream_(window|sessionize)\s*\(",
        re.IGNORECASE,
    )

    #: EXPLAIN as the statement head, allowing leading /* */ and --
    #: comments (Spark treats them as part of the statement, so a
    #: commented EXPLAIN still explains — and must still refuse
    #: streaming table functions)
    _EXPLAIN_HEAD_RE = re.compile(
        r"^\s*(?:(?:/\*.*?\*/|--[^\n]*(?:\n|$))\s*)*EXPLAIN\b",
        re.IGNORECASE | re.DOTALL,
    )

    def _reject_streaming_explain(self, sql_text: str,
                                  what: str) -> None:
        if self._STREAM_FN_RE.search(sql_text):
            raise ValueError(
                f"{what} of a streaming table function would execute "
                "the availableNow drain (resolution materializes the "
                "memory-sink snapshot); use EXPLAIN ANALYZE to "
                "execute-and-report, or EXPLAIN the batch twin of "
                "the aggregation"
            )

    def explain_analyze(self, sql_text: str,
                        trino: bool = True) -> str:
        """Trino's ``EXPLAIN ANALYZE``: EXECUTE the statement and
        return the executed physical plan annotated with REAL
        runtime metrics — each operator's ``SQLMetric`` values
        (numOutputRows and friends) read off
        ``QueryExecution.executedPlan`` after the collect fills
        them, AQE's final plan (not the initial guess) included.
        Read shapes only, same guard as :meth:`explain`: routed
        DDL/DML executes inside its handler, so ANALYZE of
        ``DELETE ...`` would commit the delete a second time —
        refuse instead (the r12 VALIDATE read-shape guard, kept)."""
        if not self._EXPLAINABLE.match(sql_text):
            raise ValueError(
                "EXPLAIN ANALYZE supports read statements only "
                "(DDL/DML routes through handlers that execute)"
            )
        df = self.trino_sql(sql_text) if trino else self.sql(sql_text)
        # Execute THIS QueryExecution's physical plan JVM-side and
        # count rows without materializing them on the driver —
        # Trino's ANALYZE executes and DISCARDS the result, so an
        # ANALYZE of a 100 TB SELECT must not collect it; task
        # execution fills every operator's SQLMetrics either way.
        qe = df._jdf.queryExecution()
        n = qe.executedPlan().execute().count()
        plan = _executed_plan_with_metrics(qe.executedPlan())
        return f"Query Plan (executed; {n} rows returned)\n{plan}"


class _IcebergSqlAdapter:
    """Shape a :class:`lakehouse.iceberg.IcebergTable` to the small
    protocol the SQL surface drives (``read``/``delete``/``update``/
    ``append``/``current().row_count``): VERSION AS OF resolves to
    the snapshot id, TIMESTAMP AS OF to the snapshot-log timestamp."""

    def __init__(self, table):
        self.table = table

    def read(self, version=None, as_of=None):
        if version is not None:
            return self.table.read(snapshot_id=int(version))
        if as_of is not None:
            import datetime as dt

            iso = str(as_of).rstrip("Zz").replace(" ", "T")
            ts = dt.datetime.fromisoformat(iso).replace(
                tzinfo=dt.timezone.utc
            )
            return self.table.read(as_of_ms=int(ts.timestamp() * 1000))
        return self.table.read()

    def delete(self, predicate):
        self.table.delete(predicate)

    def update(self, assignments, where):
        self.table.update(assignments, where)

    def append(self, df):
        self.table.append(df)

    def current(self):
        from types import SimpleNamespace

        plan = self.table.plan_scan()
        if plan.deletes:
            # merge-on-read state: manifest record counts are
            # pre-delete (and delete entries may dangle), so the
            # exact row count needs the subtracted read
            rows = self.table.read().count()
        else:
            rows = sum(f.record_count for f in plan.files)
        return SimpleNamespace(
            row_count=rows,
            version=plan.snapshot_id,
        )
