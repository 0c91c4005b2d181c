"""Interchange-format source layer: full-fidelity roundtrips."""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.sources import load_table
from hands_on_trino_iceberg_superset_spark.sources.formats import (
    avro_to_spark_schema,
    read_avro,
    read_formatted,
    spark_to_avro_schema,
    write_avro,
    write_formatted,
)

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return sorted(df.collect(), key=lambda r: r[key])


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_orders_roundtrip_exact(spark, tmp_path, fmt):
    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / fmt)
    write_formatted(orders, path, fmt)
    back = read_formatted(spark, path, fmt)
    assert back.schema == orders.schema
    assert _sorted_rows(back, "o_orderkey") == \
        _sorted_rows(orders, "o_orderkey")


def test_csv_array_columns_via_json_cells(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings").limit(50)
    path = str(tmp_path / "emb_csv")
    write_formatted(emb, path, "csv")
    back = read_formatted(spark, path, "csv")
    assert back.schema == emb.schema
    a = _sorted_rows(back, "vec_id")
    b = _sorted_rows(emb, "vec_id")
    assert [r.vec_id for r in a] == [r.vec_id for r in b]
    assert a[0].embedding == pytest.approx(b[0].embedding)


def test_csv_nulls_survive(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None, 2.5), (2, "x", None)],
        "id long, s string, v double",
    )
    path = str(tmp_path / "nulls")
    write_formatted(df, path, "csv")
    back = _sorted_rows(read_formatted(spark, path, "csv"), "id")
    assert back[0].s is None and back[1].v is None


def test_avro_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_avro")
    n_files = write_avro(docs.repartition(4), path)
    assert 1 <= n_files <= 4
    assert [f for f in sorted(os.listdir(path)) if f.endswith(".avro")]
    back = read_avro(spark, path)
    assert back.schema == docs.schema
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_avro_roundtrip_float_arrays(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings").limit(100)
    path = str(tmp_path / "emb_avro")
    write_avro(emb, path)
    back = read_avro(spark, path)
    assert back.schema == emb.schema
    a = _sorted_rows(back, "vec_id")
    b = _sorted_rows(emb, "vec_id")
    assert a == b  # float32 values survive bit-exactly


def test_avro_schema_conversion_rejects_nested_structs(spark):
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="primitives and arrays"):
        spark_to_avro_schema(T.StructType([
            T.StructField("s", T.StructType([
                T.StructField("x", T.LongType())]))]))


def test_avro_schema_conversion_roundtrip(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.ArrayType(T.FloatType(), False), True),
        T.StructField("d", T.DoubleType(), False),
    ])
    assert avro_to_spark_schema(spark_to_avro_schema(schema)) == schema


def test_avro_nullable_long_with_nulls(spark, tmp_path):
    """Arrow->pandas turns a nullable int64 column with NULLs into
    float64 (NaN for null); the writer must land longs, not floats."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, v long"
    )
    path = str(tmp_path / "nullable_long")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema == df.schema
    got = {r.id: r.v for r in back.collect()}
    assert got == {1: 10, 2: None, 3: 30}
    assert isinstance(got[1], int)


def test_avro_empty_roundtrip_and_overwrite_guard(spark, tmp_path) -> None:
    """An all-empty write still round-trips (schema sidecar), and a
    second write into the same directory refuses instead of merging
    with the first write's part files."""
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    empty_path = str(tmp_path / "avro_empty")
    write_avro(df.where(F.lit(False)), empty_path)
    back = read_avro(spark, empty_path)
    assert back.count() == 0
    assert back.schema == df.schema

    full_path = str(tmp_path / "avro_full")
    write_avro(df.repartition(2), full_path)
    with pytest.raises(FileExistsError, match="never merges"):
        write_avro(df, full_path)


def test_csv_json_timestamp_microseconds_roundtrip(spark, tmp_path) -> None:
    """TIMESTAMP (with-TZ) columns keep microsecond precision through
    the csv and json roundtrips, same as TIMESTAMP_NTZ."""
    df = spark.sql(
        "SELECT CAST('2024-03-01 10:00:00.123456' AS TIMESTAMP) AS ts,"
        "       TIMESTAMP_NTZ'2024-03-01 10:00:00.654321' AS tsn"
    )
    for fmt in ("csv", "json"):
        p = str(tmp_path / f"micro_{fmt}")
        write_formatted(df, p, fmt)
        back = read_formatted(spark, p, fmt)
        r = back.collect()[0]
        assert r.ts.microsecond == 123456, fmt
        assert r.tsn.microsecond == 654321, fmt
