"""Row-level DML + time-travel inventory entries, backed by the
copy-on-write :mod:`lakehouse` table format — the Iceberg-enabled
capability of the reference stack
(``/root/reference/compose/trino/catalog/iceberg.properties:1-19``)
restated Spark-first.

Each query's versioned table is a PERSISTED per-corpus artifact
(created from the driver parquet, deterministic DML applied once per
corpus content-token, atomically published — see
``_versioned_artifact``); the query itself opens the finished
history and returns the post-DML (or time-travel) state, and the
DuckDB oracle recomputes that state declaratively from the same
inputs. Everything is a pure function of the input data, so the
driver hash is stable.

Determinism notes: updates are ADDITIVE on money columns (keeps the
2-decimal scale exact; multiplicative updates create .xx5 rounding
ties where Spark and DuckDB disagree), and aggregates follow the
DECIMAL-exact contract from queries/base.py.

The scd2_* entries at the end are the DIMENSION-HISTORY tier of the
same lakehouse surface (lakehouse/scd.py): pure window/join
analytics building and consuming type-2 validity ranges — no
versioned-table materialization, but they live here because SCD is
how a lakehouse's DML history becomes queryable time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.lakehouse import VersionedTable
from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
from hands_on_trino_iceberg_superset_spark.sources import load_table


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


def _versioned_artifact(spark: SparkSession, sf_dir: str, name: str,
                        params: str, mutate,
                        partition_col: str | None = None,
                        ) -> VersionedTable:
    """Post-DML versioned table as a per-corpus PERSISTED artifact:
    create from orders, apply ``mutate(t)`` (the deterministic DML),
    publish atomically — once per corpus content-token, like the
    Iceberg DML fixtures and the ANN indexes. Manifests reference
    data dirs relatively, so the publish rename is safe; every
    invocation (across processes) then opens the finished history
    and times only its read path."""
    from hands_on_trino_iceberg_superset_spark.queries.artifacts import (
        artifact_path,
        ensure_artifact,
    )

    def build(tmp: str) -> None:
        t = VersionedTable.create(
            spark, tmp, _orders(spark, sf_dir),
            partition_col=partition_col,
        )
        mutate(t)

    path = ensure_artifact(
        artifact_path(
            sf_dir, name, "orders",
            # the layout knob is part of the artifact's identity —
            # changing partition_col must build a fresh artifact,
            # never silently reuse the old layout
            params=f"{params};part={partition_col}",
        ),
        build,
    )
    return VersionedTable(spark, path, partition_col=partition_col)


@register(
    "dml_merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, 'X' AS new_status, o_totalprice + 1000 AS new_price
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', CAST(1.0 AS DOUBLE)
      FROM orders WHERE o_orderkey % 1000 = 7
    ), merged AS (
      SELECT coalesce(s.new_status, t.o_orderstatus) AS o_orderstatus,
             coalesce(s.new_price, t.o_totalprice) AS o_totalprice
      FROM orders t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
    doc="MERGE INTO (upsert): every 10th order re-statused to 'X' "
        "with +1000 price, plus synthetic new 'N' orders inserted — "
        "runs through the copy-on-write VersionedTable (partitioned "
        "by o_orderstatus, so updated rows MOVE partitions and "
        "untouched partitions carry over by reference). Returns the "
        "post-MERGE per-status aggregate; the oracle restates MERGE "
        "as a FULL JOIN. lakehouse/table.py:merge.",
)
def dml_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _merged_table(spark, sf_dir)
    return t.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
    )


def _apply_reference_merge(t: VersionedTable) -> None:
    orders = t.read(version=1)
    updates = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        *[c for c in orders.columns
          if c not in ("o_orderkey", "o_orderstatus",
                       "o_totalprice")],
    )
    inserts = orders.where(F.col("o_orderkey") % 1000 == 7).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
        *[c for c in orders.columns
          if c not in ("o_orderkey", "o_orderstatus",
                       "o_totalprice")],
    )
    t.merge(
        updates.unionByName(inserts),
        on="o_orderkey",
        when_matched_update={
            "o_orderstatus": "s.o_orderstatus",
            "o_totalprice": "s.o_totalprice",
        },
    )


def _merged_table(spark: SparkSession, sf_dir: str) -> VersionedTable:
    return _versioned_artifact(
        spark, sf_dir, "dml_merge_upsert",
        params="upd=mod10-X,+1000;ins=mod1000-7",
        mutate=_apply_reference_merge,
        partition_col="o_orderstatus",
    )


@register(
    "dml_delete_time_travel",
    oracle="""
    SELECT 'v1' AS snapshot, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    UNION ALL
    SELECT 'v2', count(*),
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 3 = 0)
    """,
    doc="Row-level DELETE + snapshot time travel (VERSION AS OF): "
        "delete a third of the 'F' orders, then read BOTH snapshots "
        "— v1 via time travel must still show the pre-delete state "
        "(snapshot isolation), v2 the post-delete state. "
        "lakehouse/table.py:delete/read(version=).",
)
def dml_delete_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _deleted_table(spark, sf_dir)

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
        ).select(F.lit(tag).alias("snapshot"), "n_orders", "total_price")

    return agg(t.read(version=1), "v1").unionByName(agg(t.read(), "v2"))


@register(
    "dml_update_rewrite",
    oracle="""
    WITH updated AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice + 500 ELSE o_totalprice END
               AS o_totalprice,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN 'EXPEDITED' ELSE o_orderpriority END
               AS o_orderpriority
      FROM orders
    )
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM updated GROUP BY o_orderpriority
    """,
    doc="UPDATE ... SET with copy-on-write rewrite: urgent orders get "
        "a surcharge and a new priority label; returns the "
        "post-UPDATE per-priority aggregate. "
        "lakehouse/table.py:update.",
)
def dml_update_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _updated_table(spark, sf_dir)
    return t.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
    )


@register(
    "dml_branch_merge",
    oracle="""
    WITH final AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderstatus = 'O'
                  THEN o_totalprice + 250 ELSE o_totalprice END
               AS o_totalprice
      FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 2 = 0)
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM final GROUP BY o_orderstatus
    """,
    doc="Nessie-style branch workflow: fork an 'etl' branch (O(1) "
        "metadata, shared data dirs), surcharge the 'O' partition ON "
        "THE BRANCH while main concurrently deletes half the 'F' "
        "partition, then three-way merge the branch back — disjoint "
        "partitions, so both changes land; the oracle recomputes the "
        "final state declaratively. Isolation is asserted in-flight: "
        "main must not see the branch's update before the merge. "
        "lakehouse/table.py:create_branch/merge_branch.",
)
def dml_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _branch_merged_table(spark, sf_dir)
    return t.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
    )


@register(
    "dml_sql_statements",
    oracle="""
    WITH after_delete AS (
      SELECT * FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
    ), after_update AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice + 100 ELSE o_totalprice END
               AS o_totalprice
      FROM after_delete
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM after_update GROUP BY o_orderstatus
    """,
    doc="Row-level DML through the SQL ENTRY POINT (the Iceberg-v2 "
        "statement surface): DELETE FROM ... WHERE and UPDATE ... "
        "SET ... WHERE strings run via Engine.sql against a "
        "registered versioned table, committing copy-on-write "
        "snapshots; the final per-status aggregate is read back "
        "through the same SQL surface. engine.py:"
        "_resolve_versioned_dml.",
)
def dml_sql_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine

    eng = Engine(spark)
    eng.register_versioned_table(
        "orders_vt", _sql_dml_table(spark, sf_dir)
    )
    return eng.sql(
        "SELECT o_orderstatus, count(*) AS n_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS total_price FROM orders_vt GROUP BY o_orderstatus"
    )


def _apply_sql_dml(t: VersionedTable) -> None:
    """The DELETE/UPDATE strings run through the SQL entry point AT
    BUILD TIME — once per corpus content-token; the statement
    surface stays gated by tests/test_engine.py's SQL-DML suite."""
    from hands_on_trino_iceberg_superset_spark.engine import Engine

    eng = Engine(t.spark)
    eng.register_versioned_table("orders_vt_build", t)
    eng.sql(
        "DELETE FROM orders_vt_build "
        "WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0"
    ).collect()
    eng.sql(
        "UPDATE orders_vt_build "
        "SET o_totalprice = o_totalprice + 100 "
        "WHERE o_orderpriority = '1-URGENT'"
    ).collect()


def _sql_dml_table(spark: SparkSession, sf_dir: str) -> VersionedTable:
    return _versioned_artifact(
        spark, sf_dir, "dml_sql_statements",
        params="del=F-mod5,upd=urgent+100",
        mutate=_apply_sql_dml,
        partition_col="o_orderstatus",
    )


def _deleted_table(spark: SparkSession, sf_dir: str) -> VersionedTable:
    return _versioned_artifact(
        spark, sf_dir, "dml_delete_tt", params="del=F-mod3",
        mutate=lambda t: t.delete(
            "o_orderstatus = 'F' AND o_orderkey % 3 = 0"),
        partition_col="o_orderstatus",
    )


def _updated_table(spark: SparkSession, sf_dir: str) -> VersionedTable:
    return _versioned_artifact(
        spark, sf_dir, "dml_update_rw", params="urgent+500-expedited",
        mutate=lambda t: t.update(
            {"o_totalprice": "o_totalprice + 500",
             "o_orderpriority": "'EXPEDITED'"},
            where="o_orderpriority = '1-URGENT'",
        ),
    )


def _branch_and_merge(t: VersionedTable) -> None:
    etl = t.create_branch("etl")
    etl.update({"o_totalprice": "o_totalprice + 250"},
               where="o_orderstatus = 'O'")
    # isolation gate: the branch commit is invisible on main
    if t.current().version != 1:
        raise RuntimeError("branch commit moved main's head")
    t.delete("o_orderstatus = 'F' AND o_orderkey % 2 = 0")
    t.merge_branch("etl")


def _branch_merged_table(spark: SparkSession,
                         sf_dir: str) -> VersionedTable:
    return _versioned_artifact(
        spark, sf_dir, "dml_branch_merge",
        params="etl=O+250,main-del=F-mod2",
        mutate=_branch_and_merge,
        partition_col="o_orderstatus",
    )


def _register_prewarmers() -> None:
    from hands_on_trino_iceberg_superset_spark.queries.artifacts import (
        register_prewarmer,
    )

    register_prewarmer(
        "dml_merge_upsert",
        lambda spark, sf: _merged_table(spark, sf).path)
    register_prewarmer(
        "dml_sql_statements",
        lambda spark, sf: _sql_dml_table(spark, sf).path)
    register_prewarmer(
        "dml_delete_tt",
        lambda spark, sf: _deleted_table(spark, sf).path)
    register_prewarmer(
        "dml_update_rw",
        lambda spark, sf: _updated_table(spark, sf).path)
    register_prewarmer(
        "dml_branch_merge",
        lambda spark, sf: _branch_merged_table(spark, sf).path)


_register_prewarmers()


def _customer_segment_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE customer-segment SCD-2 history both scd2_* queries
    consume (the as-of join's premise is that it reads the same
    dimension history the history query emits — sharing the builder
    enforces it). Epoch '1900-01-01' is strictly before any
    plausible order date so the base snapshot can never tie with a
    real event (scd2_history requires unique (key, ts))."""
    from hands_on_trino_iceberg_superset_spark.lakehouse.scd import (
        scd2_history,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    ts_type = orders.schema["o_orderdate"].dataType
    base = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1900-01-01 00:00:00").cast(ts_type).alias("ts"),
    )
    daily = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_custkey", "c_mktsegment", "o_orderdate")
        .agg(F.max("o_totalprice").alias("top"))
        .select(
            "c_custkey",
            F.when(F.col("top") > 150000, F.lit("BIG-SPENDER"))
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    return scd2_history(
        base.unionByName(daily), ["c_custkey"], ["segment"], "ts"
    )


@register(
    "scd2_customer_segment_history",
    oracle="""
    WITH snaps AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1900-01-01 00:00:00' AS ts
      FROM customer
      UNION ALL
      SELECT c.c_custkey,
             CASE WHEN max(o.o_totalprice) > 150000
                  THEN 'BIG-SPENDER' ELSE c.c_mktsegment END AS segment,
             o.o_orderdate AS ts
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, o.o_orderdate
    ), changed AS (
      SELECT c_custkey, segment, ts FROM (
        SELECT s.*,
               lag(segment) OVER (PARTITION BY c_custkey
                                  ORDER BY ts) AS prev
        FROM snaps s
      ) WHERE prev IS NULL OR prev <> segment
    )
    SELECT c_custkey, segment,
           CAST(ts AS VARCHAR) AS valid_from,
           CAST(lead(ts) OVER w AS VARCHAR) AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changed
    WINDOW w AS (PARTITION BY c_custkey ORDER BY ts)
    """,
    doc="Slowly-changing-dimension TYPE 2 history "
        "(lakehouse/scd.py scd2_history): the customer dimension's "
        "segment attribute tracked through time — base state at the "
        "epoch, then one deterministic snapshot per order date "
        "(customers whose day's biggest order tops 150k flip to "
        "'BIG-SPENDER'); consecutive no-change snapshots compress "
        "away and lead() stitches half-open validity ranges with "
        "is_current on the open row. This is how facts join a "
        "dimension AS-OF event time in every BI lakehouse. 100 TB "
        "shape: one shuffle keyed by the dimension key carries both "
        "windows (change filter + range stitching) AND the "
        "per-(customer, day) snapshot aggregate; keys are "
        "high-cardinality so it balances. Oracle rebuilds the "
        "entire history declaratively.",
)
def scd2_customer_segment_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    hist = _customer_segment_hist(spark, sf_dir)
    return hist.select(
        "c_custkey",
        "segment",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    )


@register(
    "scd2_asof_revenue_by_segment",
    oracle="""
    WITH snaps AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1900-01-01 00:00:00' AS ts
      FROM customer
      UNION ALL
      SELECT c.c_custkey,
             CASE WHEN max(o.o_totalprice) > 150000
                  THEN 'BIG-SPENDER' ELSE c.c_mktsegment END AS segment,
             o.o_orderdate AS ts
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_mktsegment, o.o_orderdate
    ), changed AS (
      SELECT c_custkey, segment, ts FROM (
        SELECT s.*,
               lag(segment) OVER (PARTITION BY c_custkey
                                  ORDER BY ts) AS prev
        FROM snaps s
      ) WHERE prev IS NULL OR prev <> segment
    ), hist AS (
      SELECT c_custkey, segment, ts AS valid_from,
             lead(ts) OVER (PARTITION BY c_custkey ORDER BY ts)
               AS valid_to
      FROM changed
    )
    SELECT h.segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN hist h
      ON h.c_custkey = o.o_custkey
     AND o.o_orderdate >= h.valid_from
     AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
    GROUP BY h.segment
    ORDER BY h.segment
    """,
    doc="The SCD-2 payoff query: facts joined to the dimension "
        "AS-OF event time — every order lands in the segment its "
        "customer belonged to ON THAT DATE (a customer who flips to "
        "BIG-SPENDER attributes later orders there, earlier orders "
        "to the original segment), which is the temporally-correct "
        "revenue attribution a current-state join silently gets "
        "wrong. Plan shape: the validity-range predicate rides ON "
        "TOP of the c_custkey equi-join, so this is a hash join "
        "plus a residual filter — never a cross/range explosion — "
        "and history rows per key are bounded by change count. "
        "Oracle rebuilds history and attribution declaratively.",
)
def scd2_asof_revenue_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    hist = _customer_segment_hist(spark, sf_dir)
    joined = orders.join(
        hist,
        (hist.c_custkey == orders.o_custkey)
        & (orders.o_orderdate >= hist.valid_from)
        & (hist.valid_to.isNull() | (orders.o_orderdate < hist.valid_to)),
    )
    return (
        joined.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment")
    )
