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
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.session import configure_runtime, get_spark


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

    # -- query entry points (reference §3 paths A/C) ------------------

    def sql(self, text: str) -> DataFrame:
        """Execute SQL text; the Trino-CLI ``--execute`` equivalent.

        Supports Trino/Iceberg time-travel syntax on tables
        registered via :meth:`register_versioned_table`:
        ``SELECT ... FROM t FOR VERSION AS OF 3`` and
        ``... FOR TIMESTAMP AS OF TIMESTAMP '2026-01-01 00:00:00'``.
        """
        return self.spark.sql(self._resolve_time_travel(text))

    def trino_sql(self, text: str) -> DataFrame:
        """Execute a Trino-dialect statement (the reference's own SQL
        flavor, seed.sh / README.md) through the dialect shims.

        When the `iceberg` alias catalog is registered on this session
        (session.py:ALIAS_CATALOG_JAR), three-part identifiers pass
        through and resolve natively; otherwise the dialect strips the
        catalog qualifier as a fallback."""
        from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

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

    def register_versioned_table(self, name: str, table) -> None:
        """Expose a :class:`lakehouse.VersionedTable` to SQL: the
        CURRENT state queries as ``name``, and Trino/Iceberg
        time-travel syntax (``FOR VERSION AS OF`` /
        ``FOR TIMESTAMP AS OF``) resolves against its snapshot
        history. Re-registering refreshes the current-state view."""
        table.read().createOrReplaceTempView(name)
        self._versioned[name] = table

    def _resolve_time_travel(self, text: str):
        def sub(m) -> str:
            name, kind, lit = m.group(1), m.group(2).upper(), m.group(3)
            table = self._versioned.get(name)
            if table is None:
                return m.group(0)  # not ours; let Spark handle/raise
            if kind == "VERSION":
                df = table.read(version=int(lit))
                tag = lit
            else:
                # snapshot ts format is ISO-'T'-separated UTC with
                # microseconds and a Z suffix; shape the SQL literal
                # to the same form so the lexicographic comparison in
                # read(as_of=) is a correct time comparison at any
                # literal precision
                as_of = lit.strip("'").replace(" ", "T").rstrip("Zz")
                if "." not in as_of:
                    as_of += ".000000"
                as_of += "Z"
                df = table.read(as_of=as_of)
                tag = "".join(c if c.isalnum() else "_" for c in as_of)
            view = f"{name}__asof_{tag}"
            df.createOrReplaceTempView(view)
            return view

        return self._TIME_TRAVEL.sub(sub, text)

    # -- table adoption (reference iceberg.properties:19, S8) ----------

    def register_table(self, name: str, location: str,
                       file_format: str = "parquet") -> None:
        """Adopt existing data files as a catalog table — the Spark-
        native equivalent of Iceberg's ``register_table`` procedure
        (enabled but never called in the reference). External table:
        dropping it later leaves the files in place."""
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
        disabled in the reference, available here)."""
        df = self.sql(sql_text)
        return self.spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "cost"
        )
