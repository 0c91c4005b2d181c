"""Interchange-format sources beyond parquet: CSV, JSON-lines, ORC,
and Avro — the file formats the reference's Trino connectors read
out of the box and a data-pipeline repo must speak.

Spark-first notes:

- CSV/JSON are read with an EXPLICIT schema, never inference —
  inference is a full extra pass over the data (fatal at 100 TB) and
  type-lossy (timestamps become strings). The writers here persist
  the Spark schema JSON alongside the data (``_schema.json``) so the
  read side restores exact types without a scan.
- CSV cannot hold nested types; arrays are JSON-encoded into the
  cell on write and decoded with ``from_json`` on read — explicit
  and lossless for primitive element types.
- ORC uses Spark's built-in vectorized reader: predicate pushdown
  and column pruning work exactly as for parquet.
- Avro: this container has no ``spark-avro`` datasource jar, so the
  Avro path runs on our own OCF codec (:mod:`..lakehouse.avro`):
  the write distributes one file per partition via
  ``mapInPandas`` (executor-side encode, driver never sees rows);
  the read lists files, broadcasts nothing, and decodes each file
  inside ``mapInPandas`` — parallelism is per-file (files are the
  split unit; fine when the writer controls file sizes, which ours
  does by writing one file per upstream partition).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hands_on_trino_iceberg_superset_spark.lakehouse.avro import (
    read_ocf,
    write_ocf,
)

# ------------------------------------------------------ csv/json/orc


def _schema_path(path: str) -> str:
    return os.path.join(path, "_schema.json")


def _save_schema(df: DataFrame, path: str) -> None:
    with open(_schema_path(path), "w") as fh:
        fh.write(df.schema.json())


def _load_schema(path: str) -> T.StructType:
    with open(_schema_path(path)) as fh:
        return T.StructType.fromJson(json.load(fh))


def write_formatted(df: DataFrame, path: str, fmt: str) -> None:
    """Write ``df`` as ``fmt`` (csv|json|orc|parquet) with exact
    schema persistence for the text formats."""
    if fmt == "csv":
        flat = df
        for f in df.schema.fields:
            if isinstance(f.dataType, T.ArrayType):
                flat = flat.withColumn(f.name, F.to_json(f.name))
            elif isinstance(f.dataType, (T.StructType, T.MapType)):
                flat = flat.withColumn(f.name, F.to_json(f.name))
        (flat.write.option("header", "true")
             .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
             .option("timestampFormat",
                     "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
             .csv(path))
        _save_schema(df, path)
    elif fmt == "json":
        (df.write
           .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
           .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
           .json(path))
        _save_schema(df, path)
    elif fmt in ("orc", "parquet"):
        getattr(df.write, fmt)(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_formatted(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    if fmt == "csv":
        schema = _load_schema(path)
        read_schema = T.StructType([
            T.StructField(
                f.name,
                T.StringType()
                if isinstance(f.dataType,
                              (T.ArrayType, T.StructType, T.MapType))
                else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ])
        df = (spark.read.option("header", "true")
              .option("timestampNTZFormat",
                      "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
              .option("timestampFormat",
                      "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
              .schema(read_schema).csv(path))
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
                df = df.withColumn(
                    f.name, F.from_json(f.name, f.dataType)
                )
        return df.select(*[f.name for f in schema.fields])
    if fmt == "json":
        schema = _load_schema(path)
        return (spark.read
                .option("timestampNTZFormat",
                        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
                .option("timestampFormat",
                        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
                .schema(schema).json(path))
    if fmt in ("orc", "parquet"):
        return getattr(spark.read, fmt)(path)
    raise ValueError(f"unknown format {fmt!r}")


# --------------------------------------------------------------- avro


_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def spark_to_avro_schema(schema: T.StructType, name: str = "row") -> dict:
    def conv(dt: T.DataType) -> object:
        for cls, avro in _SPARK_TO_AVRO.items():
            if isinstance(dt, cls):
                return avro
        if isinstance(dt, T.ArrayType):
            inner = conv(dt.elementType)
            return {"type": "array",
                    "items": ["null", inner] if dt.containsNull else inner}
        raise ValueError(
            f"Avro source supports primitives and arrays; got {dt}"
        )

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name,
             "type": ["null", conv(f.dataType)] if f.nullable
             else conv(f.dataType),
             **({"default": None} if f.nullable else {})}
            for f in schema.fields
        ],
    }


def avro_to_spark_schema(avro: dict) -> T.StructType:
    prim = {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "string": T.StringType(),
        "bytes": T.BinaryType(),
    }

    def conv(t: object) -> tuple[T.DataType, bool]:
        if isinstance(t, list):  # union
            branches = [b for b in t if b != "null"]
            if len(branches) != 1:
                raise ValueError(f"unsupported union {t!r}")
            inner, _ = conv(branches[0])
            return inner, True
        if isinstance(t, str):
            if t not in prim:
                raise ValueError(f"unsupported Avro type {t!r}")
            return prim[t], False
        kind = t["type"]
        if kind in prim:  # annotated primitive (logicalType etc.)
            return prim[kind], False
        if kind == "array":
            el, el_null = conv(t["items"])
            return T.ArrayType(el, containsNull=el_null), False
        if kind == "record":
            fields = []
            for f in t["fields"]:
                dt, nullable = conv(f["type"])
                fields.append(T.StructField(f["name"], dt, nullable))
            return T.StructType(fields), False
        if kind == "enum":
            return T.StringType(), False
        if kind == "fixed":
            return T.BinaryType(), False
        raise ValueError(f"unsupported Avro type {t!r}")

    dt, _ = conv(avro)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level Avro schema must be a record")
    return dt


def write_avro(df: DataFrame, path: str) -> int:
    """Distributed Avro write: one OCF file per partition, encoded
    executor-side (Arrow batches -> python dicts -> our codec).
    Returns the number of files written."""
    # ErrorIfExists parity with the Spark writers: merging new
    # part files into a directory still holding a previous write's
    # parts would silently mix the two datasets on read
    if os.path.isdir(path) and os.listdir(path):
        raise FileExistsError(
            f"{path} already holds files; write_avro never merges"
        )
    os.makedirs(path, exist_ok=True)
    avro_schema = spark_to_avro_schema(df.schema)
    schema_json = json.dumps(avro_schema)
    # schema sidecar: lets an all-empty write (zero part files) still
    # round-trip through read_avro as an empty, correctly-typed frame
    with open(os.path.join(path, "_schema.json"), "w") as fh:
        fh.write(schema_json)
    out_schema = T.StructType([T.StructField("n", T.LongType())])

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        rows: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                clean = {}
                for k, v in rec.items():
                    if hasattr(v, "tolist"):  # numpy scalar/array
                        v = v.tolist()
                    elif isinstance(v, float) and pd.isna(v):
                        v = None
                    clean[k] = v
                rows.append(clean)
        pid = TaskContext.get().partitionId()
        if rows:
            write_ocf(
                os.path.join(path, f"part-{pid:05d}.avro"),
                schema_json, rows,
            )
        yield pd.DataFrame({"n": [len(rows)]})

    counts = df.mapInPandas(encode, out_schema).collect()
    return sum(1 for c in counts if c.n > 0)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read without spark-avro: list the files
    (driver, O(files)), decode each inside ``mapInPandas`` on the
    executors. The file is the split unit."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )
    sidecar = os.path.join(path, "_schema.json")
    if not files:
        if os.path.exists(sidecar):
            schema_obj = json.load(open(sidecar))
            return spark.createDataFrame(
                [], avro_to_spark_schema(schema_obj)
            )
        raise FileNotFoundError(f"no .avro files under {path}")
    # schema from the first file (driver decodes one file; at scale
    # a header-only parse would do — the schema lives in the first
    # few hundred bytes)
    schema_obj, _, _ = read_ocf(files[0])
    spark_schema = avro_to_spark_schema(schema_obj)
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(len(files))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                _, _, records = read_ocf(p)
                if records:
                    yield pd.DataFrame.from_records(records)

    return paths_df.mapInPandas(decode, spark_schema)
