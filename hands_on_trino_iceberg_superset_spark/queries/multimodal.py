"""Multimodal inventory entries: metadata-first statistics (pure JVM)
and the mapInPandas decode path, both DuckDB-oracle-checked by
restating the deterministic fake-media derivation in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.operators import multimodal as M
from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.sources import load_table

_KIND_CASE = """
CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
     WHEN 1 THEN 'audio' ELSE 'video' END
"""


@register(
    "multimodal_metadata_stats",
    oracle=f"""
    SELECT {_KIND_CASE} AS media_type,
           count(*) AS n_media,
           CAST(sum(13 + octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(sum(CAST((doc_id * 37) % 1024 + 16 AS DECIMAL(18,2)))
                AS DOUBLE) / count(*) AS avg_width,
           max((doc_id * 97) % 60000) AS max_duration_ms
    FROM documents
    GROUP BY 1
    """,
    doc="Metadata-first media statistics: all aggregates run on the "
        "typed meta struct — the binary column is never read "
        "(columnar pruning keeps bytes on disk).",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.attach_fake_media(load_table(spark, sf_dir, "documents"))
    return (
        media.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            # exact decimal SUM cast to double, then one double divide —
            # identical bits on both engines (DuckDB's avg(DECIMAL)
            # accumulates in floating point, so avg() itself drifts)
            (
                F.sum(F.col("meta.width").cast("decimal(18,2)"))
                .cast("double") / F.count(F.lit(1))
            ).alias("avg_width"),
            F.max("meta.duration_ms").cast("bigint").alias("max_duration_ms"),
        )
    )


@register(
    "multimodal_decode_stats",
    oracle=f"""
    SELECT {_KIND_CASE} AS media_type,
           count(*) AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT)
             AS total_payload_bytes
    FROM documents
    GROUP BY 1
    """,
    doc="Arrow-batched decode (mapInPandas over binary) -> aggregate: "
        "verifies the decode kernel's header parse + payload split "
        "against the SQL restatement of the fake container.",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.attach_fake_media(load_table(spark, sf_dir, "documents"))
    decoded = M.decode_media(media)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("payload_bytes").alias("total_payload_bytes"),
    )
