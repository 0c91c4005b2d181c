"""DuckDB-oracle differential harness (mirrors the driver's t2 gate).

Runs each inventory query through Spark AND its oracle SQL through
DuckDB over the same parquet files, then compares row count, schema
shape, and an order-insensitive value comparison. Used by tests and
by ``tools/check_correctness.py`` for fast iteration; the driver runs
its own equivalent per round (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from hands_on_trino_iceberg_superset_spark.queries import QuerySpec
from hands_on_trino_iceberg_superset_spark.sources import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the testdata views pre-registered
    exactly as the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name,
    values stringified, rows sorted.

    Floats are formatted with full ``repr`` precision so this local
    check is at least as strict as the driver's exact value-hash —
    crucially ``repr(123.0) == '123.0' != '123' == str(123)``, which
    catches engine-side integer/float dtype drift (e.g. DuckDB
    ``sum(BIGINT) -> HUGEINT`` becoming float64 in pandas) that a
    ``%.10g`` format would silently collapse.
    """
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int | None
    rows_match: bool
    values_match: bool | None
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.rows_match and self.values_match is not False


def compare(
    spec: QuerySpec, spark: SparkSession, sf_dir: str
) -> CompareResult:
    sdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return CompareResult(
            spec.name, len(sdf), None, rows_match=len(sdf) >= 0,
            values_match=None, detail="rows-only (no oracle)",
        )
    con = duckdb_connection(sf_dir)
    odf = con.sql(spec.oracle).df()
    con.close()
    rows_match = len(sdf) == len(odf)
    if not rows_match:
        return CompareResult(
            spec.name, len(sdf), len(odf), False, None,
            detail=f"row count {len(sdf)} != {len(odf)}",
        )
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            spec.name, len(sdf), len(odf), True, False,
            detail=f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}",
        )
    if len(sdf) == 0:
        # both empty (row counts matched above): equal by definition —
        # empty pandas frames carry engine-side dtypes that .equals()
        # would spuriously reject
        return CompareResult(spec.name, 0, 0, True, True)
    a, b = _canon(sdf), _canon(odf)
    values_match = a.equals(b)
    detail = ""
    if not values_match:
        neq = (a != b).any(axis=1)
        bad = a[neq].head(3).to_dict("records"), b[neq].head(3).to_dict("records")
        detail = f"first diffs: spark={bad[0]} oracle={bad[1]}"
    return CompareResult(spec.name, len(sdf), len(odf), True, values_match, detail)
