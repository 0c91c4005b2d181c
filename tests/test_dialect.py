"""The reference's Trino-dialect SQL runs verbatim through
Engine.trino_sql — the 'switch engines without rewriting your SQL'
guarantee. Statements exercise every construct the reference uses
(seed.sh:65-118, README.md:52-65): catalog-qualified names, schema
properties, varchar DDL + casts, UNNEST(sequence()) row generation,
CASE-over-modulo, || concatenation, interval arithmetic, niladic
current_timestamp, reserved-ish column/alias names."""

from __future__ import annotations

import pytest

from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark
from hands_on_trino_iceberg_superset_spark.engine import Engine


def test_rewrite_rules() -> None:
    assert trino_to_spark("SELECT * FROM iceberg.demo.events") == (
        "SELECT * FROM demo.events"
    )
    assert trino_to_spark(
        "CREATE SCHEMA IF NOT EXISTS iceberg.demo WITH (location='s3://w/d/')"
    ) == "CREATE SCHEMA IF NOT EXISTS demo"
    assert trino_to_spark("SELECT CAST(n AS varchar) FROM t") == (
        "SELECT CAST(n AS STRING) FROM t"
    )
    assert trino_to_spark("CREATE TABLE t (payload varchar, v varchar(3))") == (
        "CREATE TABLE t (payload STRING, v varchar(3))"
    )
    assert trino_to_spark(
        "SELECT n FROM UNNEST(sequence(1, 10)) AS t(n)"
    ) == "SELECT n FROM (SELECT explode(sequence(1, 10)) AS n) t"


@pytest.fixture(scope="module")
def trino_engine(spark):
    from hands_on_trino_iceberg_superset_spark.seed.seeder import _delete_path

    eng = Engine(spark, default_schema="demo_dialect")
    eng.trino_sql(
        "CREATE SCHEMA IF NOT EXISTS iceberg.demo_dialect "
        "WITH (location='s3://warehouse/demo/')"
    )
    for t in ("events", "transactions"):
        eng.trino_sql(f"DROP TABLE IF EXISTS iceberg.demo_dialect.{t}")
        if not spark.catalog.tableExists(f"demo_dialect.{t}"):
            # a previous session's warehouse dir can outlive the
            # in-memory catalog entry (see seed_into_catalog)
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            _delete_path(spark, f"{warehouse}/demo_dialect.db/{t}")
    return eng


def test_reference_seed_flow_in_trino_dialect(trino_engine) -> None:
    eng = trino_engine
    # seed.sh:72-75 shape — full expression surface E1-E11
    eng.trino_sql(
        "CREATE TABLE IF NOT EXISTS iceberg.demo_dialect.events ("
        " id bigint, ts timestamp, event_type varchar, payload varchar,"
        " user_id bigint, amount double)"
    )
    eng.trino_sql("""
        INSERT INTO iceberg.demo_dialect.events
        SELECT n AS id,
               current_timestamp - INTERVAL '1' DAY * (n % 30) AS ts,
               CASE CAST(n % 5 AS INT) WHEN 0 THEN 'click' WHEN 1 THEN 'purchase'
                    WHEN 2 THEN 'view' WHEN 3 THEN 'login' ELSE 'logout'
               END AS event_type,
               'Event ' || CAST(n AS varchar) AS payload,
               (n % 50) + 1 AS user_id,
               (n * 10.5) + 100.0 AS amount
        FROM UNNEST(sequence(1, 200)) AS t(n)
    """)
    # seed.sh:112-115 shape — reserved-word column name `timestamp`
    eng.trino_sql(
        "CREATE TABLE IF NOT EXISTS iceberg.demo_dialect.transactions ("
        " transaction_id bigint, currency varchar, timestamp timestamp)"
    )
    eng.trino_sql("""
        INSERT INTO iceberg.demo_dialect.transactions
        SELECT n AS transaction_id,
               CASE CAST(n % 3 AS INT) WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR'
                    ELSE 'GBP' END AS currency,
               current_timestamp - INTERVAL '1' HOUR * (n % 720) AS timestamp
        FROM UNNEST(sequence(1, 300)) AS t(n)
    """)
    # seed.sh:117-118 — verification query with `rows` output alias
    rows = eng.trino_sql("""
        SELECT 'events' AS table_name, count(*) AS rows
        FROM iceberg.demo_dialect.events
        UNION ALL
        SELECT 'transactions' AS table_name, count(*) AS rows
        FROM iceberg.demo_dialect.transactions
        ORDER BY table_name
    """).collect()
    assert [(r.table_name, r.rows) for r in rows] == [
        ("events", 200), ("transactions", 300),
    ]
    # spot-check the generated values (README.md:65 SELECT * path)
    first = eng.trino_sql(
        "SELECT * FROM iceberg.demo_dialect.events WHERE id = 7"
    ).collect()[0]
    assert (first.event_type, first.payload, first.user_id, first.amount) == (
        "view", "Event 7", 8, 173.5
    )


def test_rewrites_leave_string_literals_alone() -> None:
    from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

    sql = ("INSERT INTO iceberg.demo.t "
           "SELECT 'cast as varchar iceberg.demo.x (' AS payload, "
           "CAST(n AS varchar) AS s FROM iceberg.demo.src")
    out = trino_to_spark(sql)
    # literal untouched, code rewritten
    assert "'cast as varchar iceberg.demo.x ('" in out
    assert out.count("iceberg.") == 1  # only inside the literal
    assert "CAST(n AS STRING)" in out


def test_unnest_scan_survives_paren_in_literal() -> None:
    from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

    sql = ("SELECT concat('(', CAST(n AS varchar)) "
           "FROM UNNEST(sequence(1, 3)) AS t(n)")
    out = trino_to_spark(sql)
    assert "(SELECT explode(sequence(1, 3)) AS n) t" in out
    assert "concat('('" in out


def test_three_part_identifiers_resolve_natively(trino_engine) -> None:
    """With the alias catalog registered (session.py), the
    reference's `iceberg.demo.*` identifiers are NOT stripped — they
    resolve through a real second Spark catalog."""
    eng = trino_engine
    assert eng.spark.conf.get("spark.sql.catalog.iceberg", None)
    from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

    kept = trino_to_spark(
        "SELECT count(*) FROM iceberg.demo_dialect.events", strip_catalogs=()
    )
    assert "iceberg.demo_dialect.events" in kept
    eng.trino_sql(
        "CREATE TABLE IF NOT EXISTS iceberg.demo_dialect.events ("
        " id bigint, ts timestamp, event_type varchar, payload varchar,"
        " user_id bigint, amount double)"
    )
    # native three-part read on the engine session
    n = eng.sql("SELECT count(*) AS c FROM iceberg.demo_dialect.events")
    assert n.collect()[0].c >= 0
    # catalog visible to SHOW CATALOGS (reference readiness probe S1)
    cats = {r.catalog for r in eng.sql("SHOW CATALOGS").collect()}
    assert "iceberg" in cats


def test_literals_pass_through_all_rewrites():
    """The module contract — payload literals byte-identical — must
    hold for EVERY rewrite, including UNNEST and WITH(location=...)."""
    from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

    lit = "'use UNNEST(seq) AS t(n) here'"
    out = trino_to_spark(f"INSERT INTO demo.notes VALUES ({lit})")
    assert lit in out
    lit2 = "'WITH (location = ''/x'')'"
    out2 = trino_to_spark(f"SELECT {lit2} AS s")
    assert lit2 in out2


def test_unbalanced_unnest_left_untouched():
    """A typo'd statement must reach Spark's parser verbatim, not as
    a truncated rewrite."""
    from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

    bad = "SELECT * FROM UNNEST(sequence(1, 10) AS t(n)"
    assert trino_to_spark(bad, strip_catalogs=()) == bad


def test_trino_scalar_function_shims(spark):
    """Renamed scalar functions and date_diff's literal-unit ->
    identifier rewrite; payload literals containing the names pass
    through untouched."""
    from hands_on_trino_iceberg_superset_spark.dialect import (
        trino_to_spark,
    )

    out = trino_to_spark(
        "SELECT strpos(a, '-'), approx_distinct(b), "
        "json_extract_scalar(j, '$.k'), arbitrary(c), "
        "format_datetime(t, 'yyyy-MM'), "
        "date_diff('hour', t1, t2) FROM t"
    )
    assert "instr(a, '-')" in out
    assert "approx_count_distinct(b)" in out
    assert "get_json_object(j, '$.k')" in out
    assert "any_value(c)" in out
    assert "date_format(t, 'yyyy-MM')" in out
    assert "timestampdiff(HOUR, t1, t2)" in out
    # names inside string literals stay byte-identical
    kept = trino_to_spark(
        "SELECT 'call strpos(x) or date_diff(''day'', a, b)' AS s"
    )
    assert "strpos(x)" in kept and "date_diff(''day''" in kept
    # the rewritten SQL actually executes
    got = spark.sql(trino_to_spark(
        "SELECT strpos('1-URGENT', '-') AS p, "
        "date_diff('day', DATE '2024-01-01', DATE '2024-01-31') AS d"
    )).collect()[0]
    assert (got.p, got.d) == (2, 30)


def test_double_quoted_identifiers_rewrite():
    """Trino double-quoted identifiers -> Spark backticks: the shape
    every statement SQLAlchemy's trino dialect emits (quoted
    identifiers throughout), with "" as the escaped inner quote, and
    single-quoted string literals left byte-identical."""
    from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark

    out = trino_to_spark(
        'SELECT "col a", "t"."b" FROM "demo"."my table" '
        "WHERE \"c\" = 'keep \"this\" literal'"
    )
    assert "`col a`" in out and "`t`.`b`" in out
    assert "`demo`.`my table`" in out
    assert "'keep \"this\" literal'" in out  # literal untouched
    # escaped "" inside an identifier becomes one quote character
    assert trino_to_spark('SELECT "we""ird"').strip() \
        == 'SELECT `we"ird`'
    # backticked catalog qualifier strips like the bare spelling
    assert "iceberg" not in trino_to_spark(
        'SELECT * FROM "iceberg"."demo"."t"'
    )


def test_single_quote_inside_double_quoted_identifier():
    """ADVICE r11: a double-quoted identifier containing a single
    quote (legal in Trino) must not desync the literal scan — the
    tokenizing pass scans both quote kinds together, so keyword
    rewrites neither leak into real string literals nor skip real
    code after such an identifier."""
    from hands_on_trino_iceberg_superset_spark.dialect import (
        trino_to_spark,
    )

    out = trino_to_spark(
        'SELECT "it\'s", CAST(x AS varchar) AS s, '
        "'varchar stays' AS lit FROM t"
    )
    assert "`it's`" in out
    # code AFTER the quote-bearing identifier is still rewritten
    assert "CAST(x AS STRING)" in out
    # the string literal is byte-identical
    assert "'varchar stays'" in out
    # mirrored case: a double quote inside a single-quoted literal
    # does not open an identifier span
    out2 = trino_to_spark(
        "SELECT 'he said \"hi' AS a, \"col\", "
        "CAST(y AS varchar) FROM t"
    )
    assert "'he said \"hi'" in out2 and "`col`" in out2
    assert "CAST(y AS STRING)" in out2
