"""Engine surface tests (SURVEY.md §2.1 DDL + §2.6 introspection +
§2.7 readiness)."""

from __future__ import annotations

from hands_on_trino_iceberg_superset_spark.engine import Engine


def test_ready_and_sql(spark) -> None:
    eng = Engine(spark)
    assert eng.ready()
    assert eng.sql("SELECT 1 AS x").collect()[0].x == 1


def test_ddl_roundtrip(spark, tmp_path) -> None:
    eng = Engine(spark)
    eng.create_schema("demo")
    eng.drop_table("demo.t_roundtrip")
    eng.sql(
        "CREATE TABLE demo.t_roundtrip (id BIGINT, ts TIMESTAMP_NTZ, payload STRING) "
        f"USING parquet LOCATION '{tmp_path}/t_roundtrip'"
    )
    # reference README.md:62 INSERT VALUES path
    eng.sql(
        "INSERT INTO demo.t_roundtrip VALUES (1, current_timestamp(), 'hello')"
    )
    rows = eng.sql("SELECT id, payload FROM demo.t_roundtrip").collect()
    assert [(r.id, r.payload) for r in rows] == [(1, "hello")]
    cols = eng.columns("demo.t_roundtrip")
    assert [c.name for c in cols] == ["id", "ts", "payload"]
    assert cols[0].type == "bigint"
    eng.drop_table("demo.t_roundtrip")


def test_show_catalogs_probe(spark) -> None:
    # reference seed.sh:46-59 readiness shape
    eng = Engine(spark)
    cats = [r[0] for r in eng.sql("SHOW CATALOGS").collect()]
    assert "spark_catalog" in cats
