"""Wire-protocol inventory entry: the full network round trip the
reference exercises on every query (Trino CLI -> HTTP -> engine,
``/root/reference/compose/seed.sh:6-9``), as a driver-checkable
query.

The Spark side starts a :class:`TrinoWireServer` on an ephemeral
port, POSTs Trino-dialect SQL over real HTTP, drains the paged
protocol with a stdlib client that knows nothing about Spark, and
returns the received rows; the DuckDB oracle computes the same
aggregate directly. A hash match proves the whole chain — dialect,
execution, JSON encoding, paging — end to end.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.reference import SEED_CTE
from hands_on_trino_iceberg_superset_spark.sources import load_table

WIRE_SQL = (
    "SELECT o_orderstatus AS status, count(*) AS n_orders "
    "FROM orders GROUP BY o_orderstatus"
)


def _drain_statement(base_url: str, sql: str) -> list[list]:
    """POST one statement and drain the paged Trino protocol with a
    stdlib client that knows nothing about Spark; returns the raw
    JSON rows that crossed the wire."""
    req = urllib.request.Request(
        f"{base_url}/v1/statement",
        data=sql.encode(),
        method="POST",
        headers={"X-Trino-User": "driver"},
    )
    with urllib.request.urlopen(req) as resp:
        payload = json.load(resp)
    if "error" in payload:
        raise RuntimeError(payload["error"]["message"])
    rows = list(payload.get("data", []))
    while "nextUri" in payload:
        with urllib.request.urlopen(payload["nextUri"]) as resp:
            payload = json.load(resp)
        # a page-fetch failure (cancelled/evicted query) arrives as
        # an error payload with no nextUri — returning the truncated
        # rows as a normal result would be a silent wrong answer
        if "error" in payload:
            raise RuntimeError(payload["error"]["message"])
        rows.extend(payload.get("data", []))
    return rows


@register(
    "sql_over_http",
    oracle="""
    SELECT o_orderstatus AS status, count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="SQL-over-HTTP round trip through the Trino REST client "
        "protocol (server.py): POST /v1/statement, follow nextUri, "
        "decode JSON rows. Result-set shape is control-plane sized "
        "by design (BI clients page modest results; bulk data moves "
        "via parquet), so re-creating a DataFrame from the received "
        "rows is the honest representation of what crossed the wire.",
)
def sql_over_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import TrinoWireServer

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(srv.url, WIRE_SQL)
    finally:
        srv.stop()
    return spark.createDataFrame(
        [(r[0], int(r[1])) for r in rows], "status string, n_orders long"
    )


@register(
    "wire_prepared_execute",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_totalprice >= 1000.0 AND o_orderstatus <> 'X'
    GROUP BY o_orderstatus
    """,
    doc="Prepared-statement round trip over the Trino REST client "
        "protocol (server.py): PREPARE ... FROM a parameterized "
        "aggregate returns X-Trino-Added-Prepare, the client "
        "re-presents the statement via X-Trino-Prepared-Statement "
        "(the protocol's client-side statement store, exactly how "
        "Trino's SQLAlchemy/JDBC drivers connect), and EXECUTE ... "
        "USING substitutes validated SQL literals into the ? "
        "placeholders server-side — with a whitelisted SET SESSION "
        "property (hash_partition_count) applied around the "
        "statement through X-Trino-Session. The received grid is "
        "re-framed and hash-checked against the oracle running the "
        "same aggregate with the parameters inlined.",
)
def wire_prepared_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from urllib.parse import quote

    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import TrinoWireServer

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    stmt = (
        "SELECT o_orderstatus AS status, count(*) AS n_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS total_price "
        "FROM orders WHERE o_totalprice >= ? AND o_orderstatus <> ? "
        "GROUP BY o_orderstatus"
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"{srv.url}/v1/statement",
            data=f"PREPARE q FROM {stmt}".encode(),
            method="POST",
            headers={"X-Trino-User": "driver"},
        )
        with urllib.request.urlopen(req) as resp:
            if "error" in json.load(resp):
                raise RuntimeError("PREPARE failed")
            added = resp.headers["X-Trino-Added-Prepare"]
        req = urllib.request.Request(
            f"{srv.url}/v1/statement",
            data=b"EXECUTE q USING 1000.0, 'X'",
            method="POST",
            headers={
                "X-Trino-User": "driver",
                "X-Trino-Prepared-Statement": added,
                "X-Trino-Session":
                    f"hash_partition_count={quote('8')}",
            },
        )
        with urllib.request.urlopen(req) as resp:
            payload = json.load(resp)
        if "error" in payload:
            raise RuntimeError(payload["error"]["message"])
        rows = list(payload.get("data", []))
        while "nextUri" in payload:
            with urllib.request.urlopen(payload["nextUri"]) as resp:
                payload = json.load(resp)
            if "error" in payload:
                raise RuntimeError(payload["error"]["message"])
            rows.extend(payload.get("data", []))
    finally:
        srv.stop()
    return spark.createDataFrame(
        [(r[0], int(r[1]), float(r[2])) for r in rows],
        "status string, n_orders long, total_price double",
    )


@register(
    "catalog_over_http",
    oracle="""
    WITH ice AS (
      SELECT * FROM orders
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM ice
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Catalog-over-HTTP round trip through the Nessie REST wire "
        "protocol (nessie.py; the role iceberg.nessie-catalog.uri "
        "plays in the reference's Trino conf): start "
        "NessieCatalogServer on an ephemeral port, drive "
        "config -> create branch -> commit the orders Iceberg "
        "table's metadataLocation pointer -> three-way merge to "
        "main -> resolve the pointer through NessieClient.load_table "
        "over real HTTP, then scan the resolved table and aggregate. "
        "The DuckDB oracle recomputes the aggregate from the same "
        "parquet — a hash match proves the whole chain: reference "
        "CRUD, optimistic commit, merge, pointer resolution, and the "
        "catalog-consistent Iceberg read. The sql_over_http "
        "treatment, applied to the catalog wire (reference S10).",
)
def catalog_over_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieCatalogServer,
        NessieClient,
    )
    from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
    from hands_on_trino_iceberg_superset_spark.queries.iceberg import (
        _orders_iceberg,
    )

    t = _orders_iceberg(spark, sf_dir)
    srv = NessieCatalogServer()
    srv.start()
    try:
        cli = NessieClient(srv.url)
        if cli.config()["defaultBranch"] != "main":
            raise RuntimeError("catalog config did not resolve")
        # publish on a branch, then merge to main — the reference's
        # promotion flow, all over the wire
        cli.create_branch("publish")
        cli.put("publish", "demo.orders", t.metadata_location,
                "register orders")
        cli.merge("main", "publish")
        adopted = cli.load_table(spark, "demo.orders", ref="main")
        df = adopted.read()
    finally:
        # resolution happened over HTTP above; the returned plan
        # reads the (local) warehouse files, not the catalog
        srv.stop()
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "bi_chart_over_http",
    oracle=SEED_CTE
    + """
    SELECT currency, transaction_type,
           count(*) AS count,
           CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount
    FROM seed_transactions
    GROUP BY currency, transaction_type
    ORDER BY count DESC, currency, transaction_type
    """,
    doc="The reference's entry point B closed end to end (SURVEY "
        "§3.2): a Superset chart's form_data blob compiled to SQL "
        "TEXT (bi/compiler.py form_data_to_sql — what Superset sends "
        "its Trino database at view time), POSTed through the Trino "
        "REST wire server, paged back as a JSON result grid, and "
        "re-stated as a DataFrame. Same chart and oracle as "
        "bi_chart_agg_transactions, so a hash match proves the SQL "
        "emission, the wire round trip, and the JSON decimal "
        "encoding all preserve the chart's values.",
)
def bi_chart_over_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.bi.compiler import (
        form_data_to_sql,
    )
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
    from hands_on_trino_iceberg_superset_spark.seed import seed_frames
    from hands_on_trino_iceberg_superset_spark.server import TrinoWireServer

    tx = seed_frames(spark)["transactions"].withColumn(
        "amount_dec", dec("amount")
    )
    tx.createOrReplaceTempView("seed_transactions_wire")
    sql = form_data_to_sql(
        "seed_transactions_wire",
        {
            "query_mode": "aggregate",
            "groupby": ["currency", "transaction_type"],
            "metrics": [
                "count",
                {"aggregate": "SUM", "column": "amount_dec",
                 "label": "sum_amount"},
            ],
            "order_by": [["count", False], ["currency", True],
                         ["transaction_type", True]],
        },
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(srv.url, sql)
    finally:
        srv.stop()
    # decimals cross the wire as strings (Trino client shape);
    # restate them at the declared type before the double cast so
    # the result is bit-identical to the Catalyst-native chart
    out = spark.createDataFrame(
        [(r[0], r[1], int(r[2]), r[3]) for r in rows],
        "currency string, transaction_type string, "
        "count long, sum_amount string",
    )
    return out.withColumn(
        "sum_amount", dbl(F.col("sum_amount").cast("decimal(18,2)"))
    )


def _orders_two_snapshots_path(spark: SparkSession, sf_dir: str) -> str:
    """Two-snapshot orders Iceberg table (full load, then the
    deterministic late-batch append) as a persisted per-corpus
    artifact: the table tree is immutable once written, so the build
    runs once per corpus content-token and every invocation reads
    the published v1/v2 metadata files — same prewarm economics as
    the ANN indexes and the compacted table."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )
    from hands_on_trino_iceberg_superset_spark.queries.artifacts import (
        artifact_path,
        ensure_artifact,
    )

    def build(tmp: str) -> None:
        orders = load_table(spark, sf_dir, "orders")
        t = IcebergTable.create(spark, tmp, orders)
        late = (
            orders.where((F.col("o_orderkey") % 100) == 0)
            .withColumn("o_orderkey",
                        F.col("o_orderkey") + F.lit(10_000_000))
        ).select(*orders.columns)
        t.append(late)

    return ensure_artifact(
        artifact_path(sf_dir, "orders_two_snaps", "orders",
                      params="late=mod100,off=1e7"),
        build,
    )


def _register_prewarmers() -> None:
    from hands_on_trino_iceberg_superset_spark.queries.artifacts import (
        register_prewarmer,
    )

    register_prewarmer("orders_two_snaps", _orders_two_snapshots_path)


_register_prewarmers()


@register(
    "catalog_tag_pinned_read",
    oracle="""
    WITH ice AS (
      SELECT * FROM orders
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT 'main' AS ref, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM ice
    UNION ALL
    SELECT 'release-v1' AS ref, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    ORDER BY ref
    """,
    doc="Wire-level TAG references (Nessie 0.105.6 capability, "
        "compose.yaml:94): publish snapshot-1's metadataLocation on "
        "main, create TAG release-v1 at that head over HTTP, then "
        "advance main to snapshot-2's metadataLocation. A read AT "
        "the tag resolves the pinned pre-append state while main "
        "serves the appended table — both aggregated in one result "
        "keyed by ref. The DuckDB oracle recomputes both states from "
        "the source parquet, so a hash match proves tag creation, "
        "immutable pinning, and catalog-consistent resolution of "
        "BOTH refs. Tag immutability (commit to a tag -> 400) is "
        "gated in tests/test_nessie.py.",
)
def catalog_tag_pinned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieCatalogServer,
        NessieClient,
    )
    from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec

    path = _orders_two_snapshots_path(spark, sf_dir)
    v1_location = os.path.join(path, "metadata", "v1.metadata.json")
    v2_location = os.path.join(path, "metadata", "v2.metadata.json")

    srv = NessieCatalogServer()
    srv.start()
    try:
        cli = NessieClient(srv.url)
        cli.put("main", "demo.orders", v1_location, "publish v1")
        tag = cli.create_tag("release-v1", source="main")
        if tag["type"] != "TAG":
            raise RuntimeError(f"expected a TAG reference, got {tag}")
        cli.put("main", "demo.orders", v2_location, "advance to v2")

        def agg(ref: str) -> DataFrame:
            df = cli.load_table(spark, "demo.orders", ref=ref).read()
            return df.agg(
                F.count(F.lit(1)).alias("n_orders"),
                dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
            ).select(F.lit(ref).alias("ref"), "n_orders", "total_price")

        out = agg("main").unionByName(agg("release-v1")).orderBy("ref")
        # resolution happened over HTTP above; the plan reads the
        # (local) warehouse files, so the servers can stop
        out = spark.createDataFrame(
            out.collect(),
            "ref string, n_orders long, total_price double",
        )
    finally:
        srv.stop()
    return out


@register(
    "lakehouse_full_stack",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="The reference's FULL topology in one row — the exact wiring "
        "of iceberg.properties:4-15 (Nessie catalog URI + S3 "
        "endpoint in one config): an Iceberg v2 table is committed "
        "locally, its immutable tree ships to the warehouse bucket "
        "through the SigV4-signing s3a filesystem, the catalog "
        "pointer (metadataLocation on s3a://) is committed to the "
        "Nessie wire server on a branch and merged to main, then "
        "NessieClient.load_table resolves the pointer over HTTP, the "
        "metadata JSON and Avro manifests are fetched through the "
        "same signed filesystem, the scan plan prunes partitions, "
        "and the surviving parquet is read via signed ranged GETs. "
        "The local table tree is DELETED before the read — every "
        "byte of the answer must cross both wires. The DuckDB oracle "
        "recomputes the aggregate from the source parquet.",
)
def lakehouse_full_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )
    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieCatalogServer,
        NessieClient,
    )
    from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
    from hands_on_trino_iceberg_superset_spark.sources.object_store import (
        LITE_IMPL,
        apply_object_store_profile,
        ensure_lite_fs,
        mirror_to_object_store,
        s3a_profile,
    )
    from hands_on_trino_iceberg_superset_spark.sources.s3_server import (
        MiniS3Server,
    )

    ensure_lite_fs(spark)
    s3 = MiniS3Server(access_key="admin", secret_key="admin12345",
                      page_size=7)
    s3.start()
    s3.create_bucket("lakehouse")
    nessie = NessieCatalogServer()
    nessie.start()
    profile = s3a_profile(s3.url, "admin", "admin12345", impl=LITE_IMPL)
    profile["spark.hadoop.fs.s3a.lite.readahead"] = str(256 * 1024)
    # shared session Hadoop conf: snapshot + restore (same discipline
    # as warehouse_over_s3)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prior = {
        key[len("spark.hadoop."):]:
            hconf.get(key[len("spark.hadoop."):])
        for key in profile
    }
    try:
        apply_object_store_profile(spark, profile)
        tmp = tempfile.mkdtemp(prefix="lakehouse_full_stack_")
        try:
            local = os.path.join(tmp, "orders")
            t = IcebergTable.create(
                spark, local, load_table(spark, sf_dir, "orders"),
                partition_by="o_orderstatus",
            )
            meta_name = os.path.basename(t.metadata_location)
            mirror_to_object_store(spark, local, "s3a://lakehouse/orders")
        finally:
            # the local tree is gone BEFORE the read: a resolve that
            # fell back to local files would FileNotFoundError, so a
            # hash match proves the bytes crossed the wire
            shutil.rmtree(tmp, ignore_errors=True)
        cli = NessieClient(nessie.url)
        cli.create_branch("etl")
        cli.put("etl", "demo.orders_s3",
                f"s3a://lakehouse/orders/metadata/{meta_name}",
                "publish orders on the warehouse bucket")
        cli.merge("main", "etl")
        adopted = cli.load_table(spark, "demo.orders_s3", ref="main")
        rows = (
            adopted.read(filter={"o_orderstatus": "F"})
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
            )
            .orderBy("o_orderpriority")
            .collect()
        )
    finally:
        for k, v in prior.items():
            if v is None:
                hconf.unset(k)
            else:
                hconf.set(k, v)
        s3.stop()
        nessie.stop()
    return spark.createDataFrame(
        rows,
        "o_orderpriority string, n_orders long, total_price double",
    )


@register(
    "warehouse_over_s3",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="The object-store warehouse loop in a driver-green row "
        "(reference S9; iceberg.properties:10-15 + compose.yaml's "
        "MinIO): start the in-process S3 server with SigV4 "
        "verification ON, write orders through the s3a:// filesystem "
        "(signed requests; a small part size forces the MULTIPART "
        "path), read it back through ranged GETs, and aggregate. "
        "The DuckDB oracle recomputes the aggregate from the local "
        "parquet, so a hash match proves the whole wire stack — "
        "signing, multipart assembly, windowed reads, ListObjectsV2 "
        "pagination — preserved every row. Rows are materialized "
        "before the endpoint stops (the result is control-plane "
        "sized; the data plane lived on the wire).",
)
def warehouse_over_s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
    from hands_on_trino_iceberg_superset_spark.sources.object_store import (
        LITE_IMPL,
        apply_object_store_profile,
        ensure_lite_fs,
        s3a_profile,
    )
    from hands_on_trino_iceberg_superset_spark.sources.s3_server import (
        MiniS3Server,
    )

    ensure_lite_fs(spark)
    srv = MiniS3Server(access_key="admin", secret_key="admin12345",
                       page_size=7)
    srv.start()
    srv.create_bucket("warehouse")
    profile = s3a_profile(srv.url, "admin", "admin12345",
                          impl=LITE_IMPL)
    # force the multipart write path and several ranged reads
    profile["spark.hadoop.fs.s3a.lite.part.size"] = str(256 * 1024)
    profile["spark.hadoop.fs.s3a.lite.readahead"] = str(256 * 1024)
    # the session's Hadoop conf is SHARED with every other query in
    # the run: snapshot what this query overrides and restore it, so
    # a later s3a user doesn't inherit a dead endpoint or the tiny
    # test part size
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prior = {
        key[len("spark.hadoop."):]:
            hconf.get(key[len("spark.hadoop."):])
        for key in profile
    }
    try:
        apply_object_store_profile(spark, profile)
        uri = "s3a://warehouse/orders.parquet"
        load_table(spark, sf_dir, "orders").write.mode(
            "overwrite"
        ).parquet(uri)
        rows = (
            spark.read.parquet(uri)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
            )
            .orderBy("o_orderpriority")
            .collect()
        )
    finally:
        for k, v in prior.items():
            if v is None:
                hconf.unset(k)
            else:
                hconf.set(k, v)
        srv.stop()
    return spark.createDataFrame(
        rows,
        "o_orderpriority string, n_orders long, total_price double",
    )


@register(
    "catalog_diff_scan",
    oracle="""
    WITH base AS (SELECT count(*) AS n FROM orders),
    late AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 100 = 0)
    SELECT 'demo.added' AS key, 'added' AS change,
           CAST(b.n AS BIGINT) AS n_rows
    FROM base b
    UNION ALL
    SELECT 'demo.orders', 'changed', CAST(b.n + l.n AS BIGINT)
    FROM base b, late l
    UNION ALL
    SELECT 'demo.retired', 'removed', CAST(b.n AS BIGINT)
    FROM base b
    """,
    doc="Catalog DIFF over the wire (Nessie API v2 "
        "GET /trees/{from}/diff/{to} — the CI review surface for an "
        "ETL branch before merge): publish orders v1 on main, "
        "branch, advance the pointer to v2 and add a table on the "
        "branch, add one more on main; the diff classifies every "
        "key (changed / added / removed from main's perspective) "
        "and each entry's live side is OPENED and counted through "
        "the pointed-to Iceberg metadata — the diff output drives "
        "real scans, so a wrong pointer or a phantom diff entry "
        "breaks the count, not just a label. Oracle recomputes the "
        "expected counts from the raw data.",
)
def catalog_diff_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hands_on_trino_iceberg_superset_spark.nessie import (
        NessieCatalogServer,
        NessieClient,
    )

    path = _orders_two_snapshots_path(spark, sf_dir)
    v1 = os.path.join(path, "metadata", "v1.metadata.json")
    v2 = os.path.join(path, "metadata", "v2.metadata.json")

    srv = NessieCatalogServer()
    srv.start()
    try:
        cli = NessieClient(srv.url)
        cli.put("main", "demo.orders", v1, "publish v1")
        cli.create_branch("etl")
        cli.put("etl", "demo.orders", v2, "advance to v2")
        cli.put("etl", "demo.added", v1, "new table on branch")
        cli.put("main", "demo.retired", v1, "main-only table")
        rows = []
        for e in cli.diff("main", "etl"):
            key = ".".join(e["key"]["elements"])
            if e["from"] is None:
                change, side = "added", e["to"]
            elif e["to"] is None:
                change, side = "removed", e["from"]
            else:
                change, side = "changed", e["to"]
            from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (  # noqa: E501
                IcebergTable,
            )

            n = IcebergTable.from_metadata_file(
                spark, side["metadataLocation"]
            ).read().count()
            rows.append((key, change, n))
    finally:
        srv.stop()
    return spark.createDataFrame(
        rows, "key string, change string, n_rows long"
    )


@register(
    "wire_information_schema",
    oracle="""
    SELECT table_name, column_name,
           CAST(ordinal_position AS BIGINT) AS ordinal_position,
           CASE data_type
             WHEN 'BIGINT'    THEN 'bigint'
             WHEN 'INTEGER'   THEN 'integer'
             WHEN 'VARCHAR'   THEN 'varchar'
             WHEN 'DOUBLE'    THEN 'double'
             WHEN 'FLOAT'     THEN 'real'
             WHEN 'DATE'      THEN 'date'
             WHEN 'BOOLEAN'   THEN 'boolean'
             WHEN 'TIMESTAMP' THEN 'timestamp(3)'
             ELSE lower(data_type)
           END AS data_type,
           is_nullable
    FROM information_schema.columns
    WHERE table_name IN ('orders', 'customer')
    ORDER BY table_name, ordinal_position
    """,
    doc="The reference's OWN introspection flow end to end over HTTP "
        "(init_db.py:63-67): SQLAlchemy's "
        "inspect(engine).get_columns(table, schema='demo') compiles, "
        "in the trino dialect, to a double-quoted SELECT over "
        "information_schema.columns POSTed through /v1/statement — "
        "the first statement a stock Superset/SQLAlchemy client "
        "issues against the wire. The server routes it through the "
        "dialect shims (double-quoted identifiers -> backticks) to "
        "the engine's information_schema virtual tables "
        "(engine.py:_resolve_information_schema), which snapshot the "
        "live catalog with Trino's column names and type spellings. "
        "The oracle asks DuckDB's own information_schema the same "
        "question about the same parquet-backed views and maps "
        "DuckDB's spellings onto Trino's — a hash match proves both "
        "engines describe identical tables identically (names, "
        "order, types, nullability) across two independent catalog "
        "implementations.",
)
def wire_information_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import TrinoWireServer

    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    # the statement shape SQLAlchemy's trino dialect emits (every
    # identifier double-quoted), one table per inspector call
    stmt = (
        'SELECT "table_name", "column_name", "ordinal_position", '
        '"data_type", "is_nullable" '
        'FROM "information_schema"."columns" '
        "WHERE \"table_schema\" = 'demo' AND \"table_name\" = '{t}' "
        'ORDER BY "ordinal_position"'
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = []
        for t in ("customer", "orders"):
            rows.extend(_drain_statement(srv.url, stmt.format(t=t)))
    finally:
        srv.stop()
    return spark.createDataFrame(
        [(r[0], r[1], int(r[2]), r[3], r[4]) for r in rows],
        "table_name string, column_name string, "
        "ordinal_position long, data_type string, is_nullable string",
    )


def _dashboard_canon(value, wire_type: str) -> str:
    """Canonical cell rendering shared with the DuckDB oracle:
    integers verbatim, doubles at exact DECIMAL(18,2) (both engines
    round the same shortest-repr doubles), timestamps at second
    precision, booleans lowercase — so the grid fingerprint is
    engine-independent."""
    if wire_type == "boolean":
        return "true" if value else "false"
    if wire_type == "double":
        from decimal import ROUND_HALF_UP, Decimal

        return str(Decimal(str(value)).quantize(
            Decimal("0.01"), ROUND_HALF_UP))
    if wire_type.startswith("timestamp"):
        return str(value)[:19]
    return str(value)


def _dashboard_oracle() -> str:
    """One UNION ALL arm per reference chart, each replaying the
    raw-mode page (preferred columns, ORDER BY key, LIMIT 100) and
    hashing the canonical grid."""
    arms = []
    for table, cols, key in _DASHBOARD_CHARTS:
        cells = []
        for c, typ in cols:
            ident = f'"{c}"' if c == "timestamp" else c
            if typ == "double":
                cells.append(
                    f"CAST(CAST({ident} AS DECIMAL(18,2)) AS VARCHAR)")
            elif typ == "timestamp":
                cells.append(f"strftime({ident}, '%Y-%m-%d %H:%M:%S')")
            else:
                cells.append(f"CAST({ident} AS VARCHAR)")
        line = " || '|' || ".join(cells)
        arms.append(f"""
    SELECT '{table}' AS chart, CAST(count(*) AS BIGINT) AS n_rows,
           md5(string_agg(line, chr(10) ORDER BY line)) AS grid_md5
    FROM (SELECT {line} AS line
          FROM (SELECT * FROM seed_{table} ORDER BY {key} LIMIT 100) p)
        """)
    sql = "\n    UNION ALL\n".join(arms)
    return SEED_CTE + sql + "\n    ORDER BY chart"


#: the reference dashboard's five charts (init_db.py:187-193):
#: (table, preferred columns with their wire types, order key)
_DASHBOARD_CHARTS = [
    ("events", [("id", "bigint"), ("ts", "timestamp"),
                ("event_type", "varchar"), ("user_id", "bigint"),
                ("amount", "double")], "id"),
    ("users", [("user_id", "bigint"), ("username", "varchar"),
               ("email", "varchar"), ("country", "varchar"),
               ("active", "boolean")], "user_id"),
    ("orders", [("order_id", "bigint"), ("user_id", "bigint"),
                ("product_id", "bigint"), ("quantity", "integer"),
                ("price", "double"), ("status", "varchar")],
     "order_id"),
    ("products", [("product_id", "bigint"), ("name", "varchar"),
                  ("category", "varchar"), ("price", "double"),
                  ("stock", "integer")], "product_id"),
    ("transactions", [("transaction_id", "bigint"),
                      ("user_id", "bigint"), ("amount", "double"),
                      ("currency", "varchar"),
                      ("transaction_type", "varchar"),
                      ("status", "varchar")], "transaction_id"),
]


@register(
    "bi_dashboard_render",
    oracle=_dashboard_oracle(),
    doc="The seeded dashboard rendered END TO END in one row — the "
        "reference's whole BI story (init_db.py:187-193 chart "
        "configs + the 2-per-row dashboard grid) as a single parity "
        "statement: all five raw-mode table charts (each table's "
        "preferred columns, row_limit 100) are composed into a "
        "bi.Dashboard, each chart's form_data compiles to SQL TEXT "
        "(form_data_to_sql — what Superset sends its database at "
        "view time), POSTs through the Trino wire server, and the "
        "received JSON grid is canonicalized cell-by-cell (shared "
        "rules with the oracle: DECIMAL(18,2) doubles, second-"
        "precision timestamps, lowercase booleans) and fingerprinted "
        "with md5 over the sorted line set — per chart: name, page "
        "row count, grid hash. ONE deviation from the verbatim "
        "init_db.py blobs, stated: order_by is pinned to each "
        "table's key column because a LIMIT-100 page of an unordered "
        "corpus is not a deterministic set to hash (Superset users "
        "pin sort keys the same way; the position grid itself is "
        "parity-tested in tests/test_bi.py). The oracle replays "
        "every page, canonical rendering, and hash from the seed "
        "CTEs — a match proves chart compilation, the wire, JSON "
        "encoding, and all five grids' every cell.",
)
def bi_dashboard_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.bi.compiler import (
        form_data_to_sql,
    )
    from hands_on_trino_iceberg_superset_spark.bi.entities import (
        Chart,
        Dashboard,
        Database,
    )
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.seed import seed_frames
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    frames = seed_frames(spark)
    db = Database("spark", Engine(spark))
    charts = []
    for table, cols, key in _DASHBOARD_CHARTS:
        view = f"seed_{table}_dash"
        frames[table].createOrReplaceTempView(view)
        charts.append(Chart(
            name=f"{table.title()} Overview",
            dataset=db.dataset(view),
            form_data={
                "viz_type": "table",
                "query_mode": "raw",
                "all_columns": [c for c, _ in cols],
                "order_by": [[key, True]],   # determinism pin (doc)
                "row_limit": 100,
                "time_range": "No filter",
            },
        ))
    dash = Dashboard(title="Demo Dashboard", charts=charts)
    # the grid itself must hold together (2/row reference layout)
    pos = dash.position_json()
    if len([k for k in pos if k.startswith("ROW-")]) != 3:
        raise RuntimeError("dashboard grid lost its 2-per-row layout")

    srv = TrinoWireServer(db.engine, port=0)
    srv.start()
    lines = []
    try:
        for (table, cols, _), chart in zip(_DASHBOARD_CHARTS, charts):
            sql = form_data_to_sql(f"seed_{table}_dash",
                                   chart.form_data)
            req = urllib.request.Request(
                f"{srv.url}/v1/statement", data=sql.encode(),
                method="POST", headers={"X-Trino-User": "driver"},
            )
            with urllib.request.urlopen(req) as resp:
                payload = json.load(resp)
            if "error" in payload:
                raise RuntimeError(payload["error"]["message"])
            types = [c["type"] for c in payload["columns"]]
            rows = list(payload.get("data", []))
            while "nextUri" in payload:
                with urllib.request.urlopen(payload["nextUri"]) as r2:
                    payload = json.load(r2)
                if "error" in payload:
                    raise RuntimeError(payload["error"]["message"])
                rows.extend(payload.get("data", []))
            for r in rows:
                lines.append((table, "|".join(
                    _dashboard_canon(v, t) for v, t in zip(r, types)
                )))
    finally:
        srv.stop()
    grid = spark.createDataFrame(lines, "chart string, line string")
    return (
        grid.groupBy("chart")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(F.concat_ws(
                "\n", F.array_sort(F.collect_list("line"))
            )).alias("grid_md5"),
        )
        .orderBy("chart")
    )


@register(
    "wire_session_context",
    oracle="""
    SELECT 'demo' AS ctx, o_orderstatus AS grp,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'wire_session_ctx' AS ctx, o_orderpriority AS grp,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY o_orderpriority
    ORDER BY ctx, grp
    """,
    doc="Wire session context end to end — how every real Trino "
        "client actually connects (catalog in the URI "
        "trino://trino@trino:8080/iceberg, reference init_db.py:8-9; "
        "schema pinned per dataset, init_db.py:29-35) and then sends "
        "UNQUALIFIED table names with the context in X-Trino-Catalog/"
        "X-Trino-Schema headers: the query POSTs USE "
        "iceberg.wire_session_ctx, copies the X-Trino-Set-Catalog/"
        "Schema echo headers verbatim into its next requests (the "
        "protocol's client-side context store, like prepared "
        "statements), and runs one unqualified aggregate against a "
        "REAL Spark database table (current-database resolution, "
        "write-lock scoped and restored) plus one against the "
        "default demo schema (the temp-view namespace) — both "
        "over plain HTTP, keyed by context in one result. The oracle "
        "recomputes both aggregates from the same parquet, so a hash "
        "match proves USE validation, header echo semantics, and "
        "per-request name resolution under both context kinds.",
)
def wire_session_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    def drain(base_url: str, sql: str,
              headers: dict) -> tuple[list[list], dict]:
        req = urllib.request.Request(
            f"{base_url}/v1/statement", data=sql.encode(),
            method="POST",
            headers={"X-Trino-User": "driver", **headers},
        )
        with urllib.request.urlopen(req) as resp:
            payload = json.load(resp)
            resp_hdrs = dict(resp.headers)
        if "error" in payload:
            raise RuntimeError(payload["error"]["message"])
        rows = list(payload.get("data", []))
        while "nextUri" in payload:
            with urllib.request.urlopen(payload["nextUri"]) as resp:
                payload = json.load(resp)
            if "error" in payload:
                raise RuntimeError(payload["error"]["message"])
            rows.extend(payload.get("data", []))
        return rows, resp_hdrs

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders"
    )
    # a REAL Spark database holding an external table over the same
    # parquet — the unqualified name 'orders_ctx' resolves ONLY
    # under the wire_session_ctx schema context
    spark.sql("CREATE DATABASE IF NOT EXISTS wire_session_ctx")
    spark.sql("DROP TABLE IF EXISTS wire_session_ctx.orders_ctx")
    spark.sql(
        "CREATE TABLE wire_session_ctx.orders_ctx USING parquet "
        f"LOCATION '{os.path.join(sf_dir, 'orders.parquet')}'"
    )
    agg = ("SELECT {grp} AS grp, count(*) AS n_orders, "
           "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS double) "
           "AS total_price FROM {tbl} GROUP BY {grp}")
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        # USE -> echo headers -> the client carries them forward
        _, use_hdrs = drain(srv.url, "USE iceberg.wire_session_ctx",
                            {})
        ctx = {"X-Trino-Catalog": use_hdrs["X-Trino-Set-Catalog"],
               "X-Trino-Schema": use_hdrs["X-Trino-Set-Schema"]}
        if ctx != {"X-Trino-Catalog": "iceberg",
                   "X-Trino-Schema": "wire_session_ctx"}:
            raise RuntimeError(f"USE echoed wrong context: {ctx}")
        db_rows, _ = drain(
            srv.url,
            agg.format(grp="o_orderpriority", tbl="orders_ctx"), ctx)
        demo_rows, _ = drain(
            srv.url, agg.format(grp="o_orderstatus", tbl="orders"),
            {"X-Trino-Schema": "demo"})
    finally:
        srv.stop()
        spark.sql("DROP DATABASE IF EXISTS wire_session_ctx CASCADE")
    return spark.createDataFrame(
        [("demo", r[0], int(r[1]), float(r[2])) for r in demo_rows]
        + [("wire_session_ctx", r[0], int(r[1]), float(r[2]))
           for r in db_rows],
        "ctx string, grp string, n_orders long, total_price double",
    ).orderBy("ctx", "grp")


@register(
    "wire_show_functions",
    oracle="""
    SELECT * FROM (VALUES
      ('abs',        'scalar',    true),
      ('avg',        'aggregate', true),
      ('lower',      'scalar',    true),
      ('rand',       'scalar',    false),
      ('row_number', 'window',    true),
      ('sum',        'aggregate', true)
    ) AS t(function, function_type, deterministic)
    ORDER BY function
    """,
    doc="Trino's SHOW FUNCTIONS over the wire (r13; the statement "
        "SQL Lab autocomplete issues) — served in Trino's six-column "
        "shape from Spark's own function catalog (engine."
        "_show_functions). The full inventory is engine-specific by "
        "design (autocomplete must reflect what actually executes "
        "here; Return/Argument Types are empty because Spark "
        "resolves signatures per call site), so the oracle pins a "
        "six-function subset spanning every classification the "
        "surface makes: scalar/aggregate/window and the "
        "deterministic flag. The row drains the statement over real "
        "HTTP and filters to the pinned names client-side; the "
        "shape itself (all six columns, >300 functions) is gated in "
        "tests/test_server.py::test_show_functions_over_wire.",
)
def wire_show_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    pinned = {"abs", "avg", "lower", "rand", "row_number", "sum"}
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(srv.url, "SHOW FUNCTIONS")
    finally:
        srv.stop()
    return spark.createDataFrame(
        [(r[0], r[3], bool(r[4])) for r in rows if r[0] in pinned],
        "function string, function_type string, deterministic boolean",
    ).orderBy("function")


@register(
    "wire_explain_analyze",
    oracle="""
    SELECT 'result' AS stage,
           CAST(count(DISTINCT n_regionkey) AS BIGINT) AS rows_out
    FROM nation
    UNION ALL
    SELECT 'scan' AS stage, CAST(count(*) AS BIGINT) AS rows_out
    FROM nation
    ORDER BY stage
    """,
    doc="EXPLAIN ANALYZE over the wire (VERDICT r13 item 3; "
        "formerly a loud refusal at server.py): the statement SQL "
        "Lab's 'Run with EXPLAIN ANALYZE' habit issues EXECUTES the "
        "read statement and returns Trino's one-row 'Query Plan' "
        "shape carrying the EXECUTED plan with real per-operator "
        "SQLMetric values (Engine.explain_analyze walking "
        "QueryExecution.executedPlan after the collect — AQE's "
        "final plan, not the initial guess; DML still refuses "
        "rather than double-executes). The row drains the statement "
        "over real HTTP and extracts the two metrics that are "
        "deterministic facts of the DATA rather than the run: the "
        "parquet scan's numOutputRows (the table's row count — no "
        "filter, so a short-read is a correctness bug) and the "
        "returned-row count of the aggregate (one per distinct "
        "region key); the oracle recomputes both from the table. "
        "Timings/bytes are asserted present but unpinned — that is "
        "what ANALYZE reports. Full text shape gated in "
        "tests/test_server.py::test_explain_over_wire.",
)
def wire_explain_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation"
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(
            srv.url,
            "EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n "
            "FROM nation GROUP BY n_regionkey",
        )
    finally:
        srv.stop()
    assert len(rows) == 1 and len(rows[0]) == 1
    plan = rows[0][0]
    m = re.search(r"executed; (\d+) rows returned", plan)
    scans = re.findall(r"Scan parquet[^\n]*?numOutputRows: (\d+)",
                       plan)
    if m is None or len(scans) != 1:
        raise ValueError(
            "EXPLAIN ANALYZE text missing executed metrics:\n"
            + plan)
    return spark.createDataFrame(
        [("result", int(m.group(1))), ("scan", int(scans[0]))],
        "stage string, rows_out long",
    ).orderBy("stage")


@register(
    "wire_runtime_tasks",
    oracle="""
    SELECT 'FINISHED' AS state,
           CAST(1 AS BIGINT) AS splits,
           CAST(1 AS BIGINT) AS completed_splits,
           CAST(count(*) AS BIGINT) AS output_rows
    FROM nation
    """,
    doc="system.runtime.tasks over the wire (r14; the remaining "
        "system.runtime member SQL Lab's query-detail pane reads): "
        "run a fixed scan statement, then read its task row through "
        "a second wire statement joining tasks to queries on "
        "query_id (tasks carries no SQL text — exactly Trino's "
        "normalization). The hash-gated columns are the protocol "
        "facts of the one-task-per-statement execution model "
        "(state FINISHED, splits 1/1) plus output_rows, which the "
        "oracle derives from the data (the scan's materialized row "
        "count = count(*) of the table). Lifecycle instants and the "
        "full 24-column Trino shape are gated in "
        "tests/test_server.py::test_system_runtime_tasks.",
)
def wire_runtime_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation"
    )
    marker = "wire_tasks_row_probe"
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        _drain_statement(srv.url,
                         f"SELECT /* {marker} */ * FROM nation")
        rows = _drain_statement(
            srv.url,
            "SELECT t.state, t.splits, t.completed_splits, "
            "t.output_rows "
            "FROM system.runtime.tasks t "
            "JOIN system.runtime.queries q "
            "ON t.query_id = q.query_id "
            f"WHERE q.query LIKE '%{marker}%' "
            "AND q.query NOT LIKE '%system.runtime%'",
        )
    finally:
        srv.stop()
    return spark.createDataFrame(
        [(r[0], int(r[1]), int(r[2]), int(r[3])) for r in rows],
        "state string, splits long, completed_splits long, "
        "output_rows long",
    )


@register(
    "bi_chart_native_over_http",
    oracle=SEED_CTE
    + """
    SELECT currency,
           count(*) AS count,
           CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_amount
    FROM seed_transactions
    WHERE transaction_type IN ('payment', 'refund')
      AND status <> 'failed'
    GROUP BY currency
    ORDER BY count DESC, currency
    """,
    doc="The full dashboard-filter loop over the WIRE: a chart's "
        "form_data carrying extra_form_data (the SIP-68 native "
        "filter channel — one query-object filter plus one "
        "adhoc-shaped filter, r14) compiles through form_data_to_sql "
        "(the merge runs in the SQL-text path), POSTs through the "
        "Trino wire server, and the received grid is re-framed and "
        "hash-checked — what actually happens when a Superset user "
        "touches the filter bar on a dashboard backed by this "
        "engine over trino://. The oracle restates the merged WHERE "
        "over the regenerated seed.",
)
def bi_chart_native_over_http(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.bi.compiler import (
        form_data_to_sql,
    )
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.queries.core import (
        dbl,
        dec,
    )
    from hands_on_trino_iceberg_superset_spark.seed import seed_frames
    from hands_on_trino_iceberg_superset_spark.server import (
        TrinoWireServer,
    )

    tx = seed_frames(spark)["transactions"].withColumn(
        "amount_dec", dec("amount")
    )
    tx.createOrReplaceTempView("seed_tx_native_wire")
    sql = form_data_to_sql(
        "seed_tx_native_wire",
        {
            "query_mode": "aggregate",
            "groupby": ["currency"],
            "metrics": [
                "count",
                {"aggregate": "SUM", "column": "amount_dec",
                 "label": "sum_amount"},
            ],
            "order_by": [["count", False], ["currency", True]],
            "extra_form_data": {
                "filters": [{"col": "transaction_type", "op": "IN",
                             "val": ["payment", "refund"]}],
                "adhoc_filters": [
                    {"expressionType": "SIMPLE", "clause": "WHERE",
                     "subject": "status", "operator": "!=",
                     "comparator": "failed"},
                ],
            },
        },
    )
    srv = TrinoWireServer(Engine(spark), port=0)
    srv.start()
    try:
        rows = _drain_statement(srv.url, sql)
    finally:
        srv.stop()
    out = spark.createDataFrame(
        [(r[0], int(r[1]), r[2]) for r in rows],
        "currency string, count long, sum_amount string",
    )
    return out.withColumn(
        "sum_amount", dbl(F.col("sum_amount").cast("decimal(18,2)"))
    )
