"""Interchange-format source queries: every entry round-trips a
driver table through a non-parquet format (CSV / JSON-lines / ORC /
Avro-via-our-codec) and answers an aggregate from the re-read copy;
the DuckDB oracle answers from the original parquet. A format
round-trip is only correct if NOTHING drifts — types, timestamps,
nulls, row counts — so the oracle differential is exactly the right
gate for the source layer.

Written copies are memoized per ``sf_dir`` (bench repeats entries;
the write is setup, the read is the measured surface).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.queries.core import dbl, dec
from hands_on_trino_iceberg_superset_spark.sources import load_table
from hands_on_trino_iceberg_superset_spark.sources.formats import (
    read_avro,
    read_formatted,
    write_avro,
    write_formatted,
)

_CACHE: dict[tuple[str, str, str], str] = {}


def _roundtrip(spark: SparkSession, sf_dir: str, table: str,
               fmt: str) -> DataFrame:
    key = (sf_dir, table, fmt)
    path = _CACHE.get(key)
    if path is None or not os.path.isdir(path):
        path = os.path.join(
            tempfile.mkdtemp(prefix=f"fmt_{fmt}_"), table
        )
        df = load_table(spark, sf_dir, table)
        if fmt == "avro":
            write_avro(df, path)
        else:
            write_formatted(df, path, fmt)
        _CACHE[key] = path
    if fmt == "avro":
        return read_avro(spark, path)
    return read_formatted(spark, path, fmt)


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           count(DISTINCT o_orderdate) AS n_dates
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="CSV source with exact schema persistence: orders written as "
        "headered CSV (+_schema.json sidecar), re-read with the "
        "explicit schema (no inference pass — inference is an extra "
        "full scan and type-lossy at 100 TB). Timestamp fidelity is "
        "part of the check (n_dates counts distinct re-parsed "
        "timestamps).",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(spark, sf_dir, "orders", "csv")
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec("o_totalprice"))).alias("total_price"),
            F.countDistinct("o_orderdate").alias("n_dates"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             AS total_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="JSON-lines source: documents written as JSONL, re-read with "
        "the persisted explicit schema. Free-text content (quotes, "
        "unicode) must survive the encode/decode byte-exactly for "
        "the token counts to match the oracle.",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(spark, sf_dir, "documents", "json")
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.size(F.split("text", " "))).cast("bigint")
            .alias("total_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS discount_volume
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="ORC source: lineitem through Spark's built-in vectorized "
        "ORC reader/writer — predicate pushdown and column pruning "
        "behave exactly as for parquet (same DataSource V2 scan "
        "machinery), so the q6-shaped filter reaches the ORC scan.",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(spark, sf_dir, "lineitem", "orc")
    return (
        df.where(F.col("l_quantity") < 25)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dbl(F.sum(dec("l_extendedprice") * dec("l_discount")))
            .alias("discount_volume"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "source_avro_scan",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Avro source WITHOUT the spark-avro jar: documents written "
        "as Avro OCF by our pure-Python codec (one file per "
        "partition, encoded executor-side via mapInPandas), then "
        "re-read distributed (per-file decode on the executors; the "
        "file is the split unit). The same codec the Iceberg "
        "manifest layer uses, exercised as a row-data source.",
)
def source_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(spark, sf_dir, "documents", "avro")
    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )
