"""Multimodal (image/audio/video) column handling for pretraining
pipelines.

Model: media is an opaque ``binary`` column plus a *typed metadata
struct* populated at ingest. All filtering/routing/statistics run on
the metadata columns (JVM-side, prunable, no byte movement); the
bytes themselves are touched only inside Arrow-batched
``mapInPandas`` stages, which is where real decoders plug in.

This container has no image/audio libraries, so the decode kernels
are DETERMINISTIC FAKES over a self-describing fake byte format
(see :func:`pack_fake_media`) — clearly marked below. Everything
*around* the kernel is production-shaped and tested: schemas, batch
iteration, 1->N frame explosion, binary-in/binary-out resize,
feature extraction feeding the similarity operators.

Scale notes: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` to the media mix and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that a
batch of decoded frames fits executor memory. Metadata-first
filtering means a query touching 1% of media reads ~1% of bytes
(columnar Parquet never materializes the binary column for
metadata-only queries).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MAGIC = b"FAKE"
_HEADER = ">4sBHHI"  # magic, media_kind, width, height, duration_ms
_HEADER_LEN = struct.calcsize(_HEADER)

MEDIA_KINDS = {0: "image", 1: "audio", 2: "video"}

#: the typed-metadata struct attached to every media row
MEDIA_META_FIELDS = (
    "media_type string, width int, height int, duration_ms int, "
    "n_bytes bigint"
)


def pack_fake_media(kind: int, width: int, height: int,
                    duration_ms: int, payload: bytes) -> bytes:
    """DETERMINISTIC FAKE byte format: a parseable header + payload.
    Stands in for JPEG/WAV/MP4 so the decode plumbing is exercised
    end-to-end without codec libraries."""
    return struct.pack(_HEADER, _MAGIC, kind, width, height,
                       duration_ms) + payload


def attach_fake_media(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Ingest-shaped media table derived deterministically from a text
    corpus: (media_id, content binary, meta struct). Pure JVM
    expressions — the fake header is assembled with concat/encode so
    ingest itself needs no Python."""
    # pmod, not %: Spark's % keeps the dividend's sign, and a
    # negative field value would feed F.chr a negative code point,
    # which yields an EMPTY string — a short header every downstream
    # struct.unpack would mis-parse
    kind = F.pmod(F.col(id_col), F.lit(3)).cast("int")
    width = (F.pmod(F.col(id_col) * 37, F.lit(1024)) + 16).cast("int")
    height = (F.pmod(F.col(id_col) * 53, F.lit(768)) + 16).cast("int")
    duration = F.pmod(F.col(id_col) * 97, F.lit(60_000)).cast("int")
    payload = F.encode(F.col(text_col), "UTF-8")
    header = F.concat(
        F.lit(_MAGIC),
        _int_bytes(kind, 1),
        _int_bytes(width, 2),
        _int_bytes(height, 2),
        _int_bytes(duration, 4),
    )
    content = F.concat(header, payload)
    meta = F.struct(
        F.element_at(F.map_from_arrays(
            F.array(*[F.lit(k) for k in MEDIA_KINDS]),
            F.array(*[F.lit(v) for v in MEDIA_KINDS.values()]),
        ), kind).alias("media_type"),
        width.alias("width"),
        height.alias("height"),
        duration.alias("duration_ms"),
        F.length(content).cast("bigint").alias("n_bytes"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        content.alias("content"),
        meta.alias("meta"),
    )


def _int_bytes(col, n: int):
    """Big-endian fixed-width byte encoding of an int column (builds
    the fake header JVM-side)."""
    parts = [
        F.chr(F.shiftrightunsigned(col.cast("bigint"), 8 * i)
              .bitwiseAND(F.lit(255)))
        for i in range(n - 1, -1, -1)
    ]
    return F.encode(F.concat(*parts), "ISO-8859-1")


# ------------------------------------------------------ decode kernels

DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "duration_ms int, payload_bytes bigint, checksum bigint"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage: bytes -> structured fields via ``mapInPandas``.

    The kernel below parses the FAKE header (a real deployment swaps
    in PIL/ffmpeg here — the iterator/batch/schema contract is
    identical). Arrow streams binary batches; nothing is collected
    to the driver.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                magic, kind, width, height, dur = struct.unpack(
                    _HEADER, buf[:_HEADER_LEN]
                )
                if magic != _MAGIC:
                    raise NotImplementedError(
                        "real codec decode not available in this "
                        "environment; only the FAKE container format "
                        "is supported"
                    )
                payload = buf[_HEADER_LEN:]
                rows.append(
                    (media_id, MEDIA_KINDS[kind], width, height, dur,
                     len(payload), _cheap_checksum(payload))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "width", "height",
                         "duration_ms", "payload_bytes", "checksum"],
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, DECODED_SCHEMA
    )


def _cheap_checksum(payload: bytes) -> int:
    """Deterministic stand-in for decoded-pixel statistics."""
    acc = 0
    for b in payload[:256]:
        acc = (acc * 131 + b) & 0x7FFFFFFFFFFFFFFF
    return acc


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Binary-in / binary-out transform stage (the resize/transcode
    shape): rewrites the header to the target dimensions and keeps a
    payload proportional to the area ratio — a deterministic fake of
    pixel resampling with realistic output sizing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_bytes = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                magic, kind, w, h, dur = struct.unpack(
                    _HEADER, buf[:_HEADER_LEN]
                )
                payload = buf[_HEADER_LEN:]
                ratio = (target_w * target_h) / max(w * h, 1)
                n_out = max(1, int(len(payload) * min(ratio, 1.0)))
                out_ids.append(media_id)
                out_bytes.append(
                    pack_fake_media(kind, target_w, target_h, dur,
                                    payload[:n_out])
                )
            yield pd.DataFrame({"media_id": out_ids, "content": out_bytes})

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, content binary"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """1 -> N frame sampling (video shape): one output row per sampled
    frame timestamp; frame bytes are a sliced window of the payload.
    Demonstrates row-explosion through mapInPandas (output batches
    need not align 1:1 with input rows)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts_ms, frames = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                _, kind, w, h, dur = struct.unpack(_HEADER, buf[:_HEADER_LEN])
                payload = buf[_HEADER_LEN:]
                n = max(len(payload), 1)
                for i, t in enumerate(range(0, max(dur, 1), every_ms)):
                    lo = (i * 16) % n
                    ids.append(media_id)
                    idxs.append(i)
                    ts_ms.append(t)
                    frames.append(payload[lo : lo + 16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": ts_ms,
                 "frame": frames}
            )

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, frame_idx int, ts_ms int, frame binary"
    )


#: dHash geometry: an 8x8 downsampled grayscale grid, 7 horizontal
#: gradient comparisons per row -> 56 signature bits (bit 55 is the
#: top bit, so the BIGINT stays positive — no sign-bit gymnastics in
#: either engine).
_DHASH_ROWS, _DHASH_COLS = 8, 8
_DHASH_STRIDE = 7  # payload bytes sampled at absolute positions i*7


def perceptual_hash(df: DataFrame) -> DataFrame:
    """(media_id, phash) — a 56-bit dHash ("difference hash") per
    media asset, the perceptual near-dup tier byte-exact content
    hashing misses: a re-encoded copy whose bytes differ slightly
    (compression noise, metadata rewrite, one-pixel edit) lands
    within a small Hamming distance of the original instead of in a
    different md5 bucket.

    Pipeline shape is the real one: decode payload -> downsample to
    a fixed 8x8 grayscale grid -> sign of each horizontal gradient is
    one bit. The DECODE/DOWNSAMPLE step here is the deterministic
    fake (this container has no codecs): "pixels" are payload bytes
    sampled at absolute positions ``min(i*7, n-1)`` — clamped, so
    short payloads repeat their last byte, and a perturbation at an
    unsampled byte changes nothing (exactly the robustness dHash
    exists for). A real deployment swaps PIL's resize+grayscale into
    this same Arrow kernel; everything downstream (Hamming banding,
    verification) is production-shaped.

    Pair mining over the result is :func:`operators.dedup
    .hamming_pairs` — bucketed pigeonhole candidates, never
    all-pairs.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(
            _DHASH_ROWS * _DHASH_COLS, dtype=np.int64
        ) * _DHASH_STRIDE
        weights = (
            np.int64(1)
            << np.arange(
                _DHASH_ROWS * (_DHASH_COLS - 1), dtype=np.int64
            )
        )
        for pdf in batches:
            ids, sigs = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = np.frombuffer(
                    bytes(content)[_HEADER_LEN:], dtype=np.uint8
                )
                if len(buf) == 0:
                    gray = np.zeros(len(base), dtype=np.int64)
                else:
                    gray = buf[np.minimum(base, len(buf) - 1)].astype(
                        np.int64
                    )
                grid = gray.reshape(_DHASH_ROWS, _DHASH_COLS)
                bits_ = (grid[:, 1:] > grid[:, :-1]).ravel()
                ids.append(media_id)
                sigs.append(int((weights * bits_).sum()))
            yield pd.DataFrame({"media_id": ids, "phash": sigs})

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, phash long"
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """bytes -> embedding array<float> (the feature-extraction shape
    that feeds operators/similarity.py). Deterministic hash-seeded
    pseudo-features stand in for a vision/audio model forward pass."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content)
                vec = []
                acc = 2166136261
                for d in range(dim):
                    for b in buf[d::max(len(buf) // 8, 1)][:8]:
                        acc = (acc ^ b) * 16777619 & 0xFFFFFFFF
                    vec.append(((acc % 2000003) / 1000001.5) - 1.0)
                ids.append(media_id)
                vecs.append(vec)
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, embedding array<float>"
    )
