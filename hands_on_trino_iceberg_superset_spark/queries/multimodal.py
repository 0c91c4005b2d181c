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


@register(
    "multimodal_frame_sample_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_KIND_CASE} AS media_type,
             octet_length(encode(text)) AS n,
             CAST((doc_id * 97) % 60000 AS INTEGER) AS dur
      FROM documents
    ), per_doc AS (
      SELECT media_type,
             CAST(ceil(CAST(greatest(dur, 1) AS DOUBLE) / 10000) AS BIGINT)
               AS n_frames,
             CAST(list_sum(list_transform(
               range(0, CAST(ceil(CAST(greatest(dur, 1) AS DOUBLE) / 10000)
                              AS BIGINT)),
               -- greatest(n,1) mirrors the kernel's max(len,1)
               -- divisor (an empty payload must not modulo by
               -- zero); the outer greatest(0, ...) yields the
               -- kernel's empty-slice 0 bytes for n = 0
               i -> greatest(0, least(16, n - ((i * 16) % greatest(n, 1))))
             )) AS BIGINT) AS frame_bytes
      FROM base
    )
    SELECT media_type, count(*) AS n_media,
           CAST(sum(n_frames) AS BIGINT) AS total_frames,
           CAST(sum(frame_bytes) AS BIGINT) AS total_frame_bytes
    FROM per_doc GROUP BY media_type
    """,
    doc="1->N frame sampling (video shape) through mapInPandas row "
        "explosion: one row per sampled frame timestamp (10s "
        "cadence), then per-type frame counts and byte volume — the "
        "oracle restates the deterministic fake sampler arithmetic. "
        "operators/multimodal.py:sample_frames.",
)
def multimodal_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.attach_fake_media(load_table(spark, sf_dir, "documents"))
    frames = M.sample_frames(media, every_ms=10_000)
    typed = frames.join(
        media.select("media_id", F.col("meta.media_type").alias("media_type")),
        "media_id",
    )
    return typed.groupBy("media_type").agg(
        F.countDistinct("media_id").alias("n_media"),
        F.count(F.lit(1)).alias("total_frames"),
        F.sum(F.length("frame")).cast("bigint").alias("total_frame_bytes"),
    )


@register(
    "multimodal_resize_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_KIND_CASE} AS media_type,
             octet_length(encode(text)) AS n,
             CAST((doc_id * 37) % 1024 + 16 AS INTEGER) AS w,
             CAST((doc_id * 53) % 768 + 16 AS INTEGER) AS h
      FROM documents
    )
    SELECT media_type, count(*) AS n_media,
           -- least(n, ...) mirrors the kernel's payload[:k] slice:
           -- an empty payload stays 0 bytes even though the target
           -- floor is clamped to >= 1
           CAST(sum(least(n, greatest(1, CAST(floor(
             n * least(4096.0 / (w * h), 1.0)) AS BIGINT))))
             AS BIGINT) AS total_payload_bytes
    FROM base GROUP BY media_type
    """,
    doc="Binary-in/binary-out resize (transcode shape): resize every "
        "asset to 64x64, decode the results, and aggregate the "
        "area-ratio-scaled payload sizes per type — oracle restates "
        "the deterministic resampling arithmetic. "
        "operators/multimodal.py:resize_images + decode_media.",
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.attach_fake_media(load_table(spark, sf_dir, "documents"))
    resized = M.resize_images(media, target_w=64, target_h=64)
    decoded = M.decode_media(resized)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("payload_bytes").cast("bigint").alias("total_payload_bytes"),
    )


@register(
    "multimodal_perceptual_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
             substr(text, 1, doc_id % greatest(len(text) - 1, 1))
             || 'q'
             || substr(text,
                       (doc_id % greatest(len(text) - 1, 1)) + 2)
      FROM documents WHERE doc_id % 10 = 0
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(0, 64), i -> ascii(substr(text,
               CAST(least(i * 7, len(text) - 1) AS INTEGER) + 1, 1)))
               AS gr
      FROM corpus
    ),
    sig AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 56), b ->
               CASE WHEN gr[CAST(b // 7 AS INTEGER) * 8
                            + CAST(b % 7 AS INTEGER) + 2]
                       > gr[CAST(b // 7 AS INTEGER) * 8
                            + CAST(b % 7 AS INTEGER) + 1]
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
               AS BIGINT) AS s
      FROM g
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
    doc="PERCEPTUAL media near-dup at Hamming <= 3 over a 56-bit "
        "dHash — the tier multimodal_content_dedup structurally "
        "misses: that operator collapses byte-identical payloads "
        "(md5), so a re-encoded copy whose bytes differ by one "
        "compression artifact lands in a different bucket and "
        "escapes. Here every 10th doc is re-published with one "
        "payload byte substituted (deterministic position, ids "
        "offset by max(doc_id)+1) — md5 differs, but the dHash "
        "(sign of horizontal "
        "gradients over an 8x8 downsampled grid of decoded pixels; "
        "operators/multimodal.perceptual_hash, Arrow mapInPandas "
        "kernel, deterministic fake decode) moves by at most 2 "
        "bits, and the copy surfaces as a near-dup pair. Pair "
        "mining is the generic pigeonhole band join "
        "(operators/dedup.hamming_pairs, 4 x 14-bit chunks): "
        "bucketed equi-join candidates + exact bit_count verify, "
        "never all-pairs — the dedup_simhash machinery reused "
        "across modalities. The oracle recomputes every signature "
        "from the raw text the payload derives from and scans "
        "quadratically.",
)
def multimodal_perceptual_dedup(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # id offset derived from the corpus (one bounded scalar), so a
    # replicated scale corpus can't collide copy ids with real docs.
    # The same pass ASSERTS the oracle's ASCII-only contract: the
    # oracle samples CHARACTERS (ascii(substr(...))) while the kernel
    # samples UTF-8 payload BYTES — identical only while every char is
    # one byte, so a non-ASCII corpus must fail loudly, not mismatch.
    off, n_wide = docs.agg(
        F.max("doc_id"),
        F.sum((F.octet_length("text") != F.length("text"))
              .cast("int")),
    ).collect()[0]
    if n_wide:
        raise ValueError(
            f"multimodal_perceptual_dedup: {n_wide} documents contain "
            "non-ASCII text; the character-sampling oracle would "
            "diverge from the byte-sampling kernel"
        )
    off = off + 1
    p = F.col("doc_id") % F.greatest(F.length("text") - 1, F.lit(1))
    perturbed = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(off)).alias("doc_id"),
        F.concat(
            F.substring(F.col("text"), F.lit(1), p.cast("int")),
            F.lit("q"),
            F.substring(
                F.col("text"), (p + 2).cast("int"), F.length("text")
            ),
        ).alias("text"),
    )
    media = M.attach_fake_media(docs.unionAll(perturbed))
    return D.hamming_pairs(
        M.perceptual_hash(media),
        max_hamming=3, bits=56, id_col="media_id", sig_col="phash",
    )


@register(
    "multimodal_content_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
      WHERE doc_id % 10 = 0
    ),
    m AS (
      SELECT doc_id, md5(text) AS content_sig,
             CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type
      FROM corpus
    )
    SELECT content_sig, min(doc_id) AS keep_id,
           count(*) AS n_copies,
           count(DISTINCT media_type) AS n_containers
    FROM m GROUP BY content_sig
    """,
    doc="CONTENT-level media dedup (the first tier of image/audio "
        "dedup: same bytes re-published in a different container): "
        "the signature is md5 over the PAYLOAD bytes only — the "
        "parseable fake header (dimensions, duration) is excluded, "
        "so a re-published copy whose container metadata differs "
        "still collapses onto its original, which a whole-file "
        "checksum would miss. Re-published variants are derived "
        "in-query (every 10th doc re-attached under a shifted id -> "
        "different header, identical payload). All JVM expressions "
        "(binary substring + md5 in the scan projection); one "
        "signature-keyed shuffle, the dedup_exact shape over binary "
        "columns. Oracle recomputes every signature from the raw "
        "text the payload derives from.",
)
def multimodal_content_dedup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from hands_on_trino_iceberg_superset_spark.operators.multimodal import (
        _HEADER_LEN,
        attach_fake_media,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    republished = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    media = attach_fake_media(docs.unionAll(republished))
    sig = F.md5(
        F.expr(f"substring(content, {_HEADER_LEN} + 1, 2147483647)")
    )
    return (
        media.select(
            "media_id",
            sig.alias("content_sig"),
            F.col("meta.media_type").alias("media_type"),
        )
        .groupBy("content_sig")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("media_type").alias("n_containers"),
        )
    )
