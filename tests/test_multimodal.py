"""Multimodal plumbing: JVM-built fake container round-trips through
the Python decode kernel; resize/frame-sample/feature shapes."""

from __future__ import annotations

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.operators import multimodal as M
from hands_on_trino_iceberg_superset_spark.operators import similarity as S
from hands_on_trino_iceberg_superset_spark.sources import load_table


def _media(spark, sf_dir, n=100):
    docs = load_table(spark, sf_dir, "documents").limit(n)
    return M.attach_fake_media(docs)


def test_decode_roundtrips_jvm_built_header(spark, sf_dir) -> None:
    media = _media(spark, sf_dir)
    decoded = {r.media_id: r for r in M.decode_media(media).collect()}
    for row in media.select("media_id", "meta", F.length("content").alias("len")).collect():
        d = decoded[row.media_id]
        assert d.media_type == row.meta.media_type
        assert d.width == row.meta.width
        assert d.height == row.meta.height
        assert d.duration_ms == row.meta.duration_ms
        assert d.payload_bytes == row.len - 13  # header is 13 bytes


def test_metadata_never_touches_binary(spark, sf_dir) -> None:
    media = _media(spark, sf_dir)
    stats = media.groupBy("meta.media_type").count()
    # column pruning: the scan under the aggregate must not read the
    # binary column
    plan = stats.queryExecution if False else stats._jdf.queryExecution()
    optimized = plan.optimizedPlan().toString()
    assert "content" not in optimized


def test_resize_rewrites_header_and_shrinks_payload(spark, sf_dir) -> None:
    media = _media(spark, sf_dir)
    resized = M.decode_media(M.resize_images(media, 64, 48))
    for r in resized.collect():
        assert (r.width, r.height) == (64, 48)
    orig = {r.media_id: r.payload_bytes
            for r in M.decode_media(media).collect()}
    for r in resized.collect():
        assert 1 <= r.payload_bytes <= orig[r.media_id]


def test_sample_frames_one_to_many(spark, sf_dir) -> None:
    media = _media(spark, sf_dir, n=30)
    frames = M.sample_frames(media, every_ms=1000)
    counts = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    durs = {r.media_id: r.meta.duration_ms for r in media.collect()}
    for mid, n in counts.items():
        expect = max((max(durs[mid], 1) + 999) // 1000, 1)
        assert n == expect
    assert frames.where(F.length("frame") > 16).count() == 0


def test_extract_features_deterministic_and_ann_composable(
    spark, sf_dir
) -> None:
    media = _media(spark, sf_dir, n=50)
    f1 = M.extract_features(media, dim=16)
    f2 = M.extract_features(media, dim=16)
    rows1 = {r.media_id: r.embedding for r in f1.collect()}
    rows2 = {r.media_id: r.embedding for r in f2.collect()}
    assert rows1 == rows2
    assert all(len(v) == 16 for v in rows1.values())
    # features feed the similarity operators unchanged
    topk = S.cosine_topk(
        f1, f1.limit(3), k=5, vec_col="embedding", id_col="media_id"
    )
    got = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in got)


def test_content_dedup_collapses_across_containers(spark):
    """Same payload in two different containers (different header
    fields from different ids) must share a content signature while
    their whole-file bytes differ."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators.multimodal import (
        _HEADER_LEN,
        attach_fake_media,
    )

    docs = spark.createDataFrame(
        [(0, "same payload text"), (1000000, "same payload text"),
         (1, "different text")],
        ["doc_id", "text"],
    )
    media = attach_fake_media(docs)
    rows = media.select(
        "media_id",
        F.md5(F.expr(
            f"substring(content, {_HEADER_LEN} + 1, 2147483647)"
        )).alias("sig"),
        F.md5("content").alias("whole_file"),
        F.col("meta.width").alias("w"),
    ).collect()
    by_id = {r.media_id: r for r in rows}
    assert by_id[0].sig == by_id[1000000].sig
    assert by_id[0].whole_file != by_id[1000000].whole_file
    assert by_id[0].w != by_id[1000000].w
    assert by_id[1].sig != by_id[0].sig


def test_perceptual_dedup_catches_reencoded_copy(spark):
    """A re-encoded copy (one payload byte perturbed) escapes
    byte-exact content dedup but lands within Hamming <= 3 of its
    original's dHash; an unrelated asset does not pair. A resized
    re-publication of the same pixels (header rewritten, payload
    kept) hashes identically — header bytes never enter the hash."""
    from hands_on_trino_iceberg_superset_spark.operators import dedup as D
    from hands_on_trino_iceberg_superset_spark.operators.multimodal import (
        _HEADER_LEN,
        attach_fake_media,
        perceptual_hash,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    perturbed = base[:100] + "Q" + base[101:]  # one byte off
    other = "completely unrelated content made of different words " * 7
    docs = spark.createDataFrame(
        [(1, base), (2, perturbed), (3, other)], ["doc_id", "text"]
    )
    media = attach_fake_media(docs)

    # byte-exact tier misses the copy...
    sigs = {
        r.media_id: r.sig
        for r in media.select(
            "media_id",
            F.md5(F.expr(
                f"substring(content, {_HEADER_LEN} + 1, 2147483647)"
            )).alias("sig"),
        ).collect()
    }
    assert sigs[1] != sigs[2]

    # ...the perceptual tier catches it, and nothing else
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.hamming_pairs(
            perceptual_hash(media), max_hamming=3, bits=56,
            id_col="media_id", sig_col="phash",
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert not any(3 in p for p in pairs)

    # an up-"resized" re-publication (header rewritten to new
    # dimensions, pixels preserved) changes the whole-file checksum
    # but not the perceptual hash
    from hands_on_trino_iceberg_superset_spark.operators.multimodal import (
        resize_images,
    )

    orig = media.where(F.col("media_id") == 1)
    resized = resize_images(orig, target_w=2048, target_h=2048)
    assert (
        orig.select(F.md5("content")).first()[0]
        != resized.select(F.md5("content")).first()[0]
    )
    assert (
        perceptual_hash(orig).first().phash
        == perceptual_hash(resized).first().phash
    )
