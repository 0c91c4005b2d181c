"""Unigram-LM tokenizer (SentencePiece's training algorithm, Kudo
2018, arXiv:1804.10959) — the third production tokenizer family next
to :mod:`operators.bpe` and :mod:`operators.wordpiece`: start from a
LARGE seed vocabulary of substrings, segment the corpus with Viterbi
under the current model, prune the least-useful pieces to a budget,
and re-segment under the survivors.

Honest simplification, stated up front (same contract as WordPiece's
frequency-for-likelihood substitution): real Unigram-LM scores
segmentations by float log-likelihood products whose accumulation
order differs across engines. Here the piece model is UNIFORM at
every round — Viterbi under equal piece probabilities maximizes
``Π p(x_i) = p^k`` by MINIMIZING the piece count — with a
longest-first-piece tie-break (total order: at a fixed word position,
matching pieces have pairwise distinct lengths, because only one
substring of each length exists there). Every decision is an exact
integer comparison, so the DuckDB oracle replays the full train loop
— seed segmentation, usage counting, the pruning rank, and the
re-segmentation DP — decision for decision.

The EM structure survives intact:

- **E-step surrogate**: canonical (min-piece, longest-first) Viterbi
  segmentation of every distinct word; ``usage[piece] = Σ freq`` over
  its occurrences in those segmentations — the integer stand-in for
  expected counts.
- **M-step / prune**: keep every observed single character (the
  encodability floor — Viterbi can then never fail) plus the top-K
  multi-char pieces by (usage DESC, piece ASC).
- Re-segment under the pruned vocabulary; final usage counts are the
  shipped model's scores.

A closed-form identity removes the seed round's DP entirely: the
seed vocabulary contains EVERY substring of every corpus word up to
``MAX_PIECE_LEN``, and under a substring-closed vocabulary the
min-piece longest-first segmentation of a word is exactly its
left-to-right ``MAX_PIECE_LEN``-chunking (first piece is forced to
the maximum length, recursively). Seed-round usage is therefore one
chunk-explode aggregation — no seed vocabulary is ever materialized.

Scale shape (identical to the siblings): the ONLY corpus-sized
operation is the word-frequency groupBy. Seed chunk usage, pruning,
and Viterbi re-segmentation all run on the VOCAB-sized distinct-word
table; corpus encoding is a map-side broadcast-dictionary pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hands_on_trino_iceberg_superset_spark.operators.wordpiece import (
    word_frequencies,  # noqa: F401  (re-exported: shared stage 1)
)

MAX_PIECE_LEN = 4


def seed_chunk_usage(words: DataFrame) -> DataFrame:
    """(piece, usage) under the SEED model — by the substring-closure
    identity (module docstring), the canonical segmentation of every
    word is its left-to-right ``MAX_PIECE_LEN``-chunking, so seed
    usage is one explode + groupBy on the vocab-sized word table.
    Occurrences count with multiplicity, weighted by word frequency.
    """
    chunks = F.transform(
        F.sequence(
            F.lit(1),
            F.ceil(F.length("word") / F.lit(MAX_PIECE_LEN)).cast("int"),
        ),
        lambda i: F.substring(
            F.col("word"),
            ((i - 1) * MAX_PIECE_LEN + 1).cast("int"),
            F.lit(MAX_PIECE_LEN),
        ),
    )
    return (
        words.select("freq", F.explode(chunks).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("usage"))
    )


def prune_vocab(words: DataFrame, top_k: int) -> DataFrame:
    """The pruned vocabulary: every observed single character (rank
    NULL — the floor) plus the ``top_k`` multi-char pieces by seed
    usage (usage DESC, piece ASC — exact integers, total order).
    Returns (piece, usage, rank); vocab-sized throughout."""
    from pyspark.sql import Window

    usage = seed_chunk_usage(words)
    singles_floor = (
        words.select(
            F.explode(F.split(F.col("word"), "")).alias("piece")
        )
        .where(F.col("piece") != "")
        .distinct()
        .join(usage, "piece", "left")
        .select(
            "piece",
            F.coalesce("usage", F.lit(0)).cast("bigint").alias("usage"),
            F.lit(None).cast("int").alias("rank"),
        )
    )
    w = Window.orderBy(F.desc("usage"), F.asc("piece"))
    multis = (
        usage.where(F.length("piece") > 1)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("piece", "usage", "rank")
    )
    return singles_floor.unionByName(multis)


def _segment(word: str, vs: set, max_len: int) -> list[str]:
    """Canonical Viterbi segmentation: minimal piece count under the
    uniform model, longest first piece among optimal suffixes,
    recursively. Exact integer DP — the rule the oracle unrolls."""
    L = len(word)
    inf = 1 << 30
    cost = [inf] * (L + 2)
    cost[L + 1] = 0
    for p in range(L, 0, -1):
        for length in range(1, min(max_len, L - p + 1) + 1):
            if word[p - 1 : p - 1 + length] in vs:
                c = 1 + cost[p + length]
                if c < cost[p]:
                    cost[p] = c
    pieces: list[str] = []
    p = 1
    while p <= L:
        for length in range(min(max_len, L - p + 1), 0, -1):
            cand = word[p - 1 : p - 1 + length]
            if cand in vs and cost[p] == 1 + cost[p + length]:
                pieces.append(cand)
                p += length
                break
        else:  # pragma: no cover — singles floor guarantees progress
            raise ValueError(f"unencodable character at {word!r}:{p}")
    return pieces


def viterbi_encode(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Canonical segmentation of each distinct word under ``vocab``
    — one Arrow batch pass with the (bounded) vocabulary broadcast
    as a set, the same shape as WordPiece's greedy encode. Returns
    (word, freq, n_pieces, encoded) with ``encoded`` space-joined.
    At 100 TB this runs over the distinct-word table, never the
    corpus; corpus token streams come from joining the result back
    on the word column (broadcast, vocab-sized build side)."""
    import pandas as pd

    vs = {r.piece for r in vocab.select("piece").collect()}
    bset = words.sparkSession.sparkContext.broadcast(vs)

    def seg(batch_iter):
        for pdf in batch_iter:
            v = bset.value
            out_n, out_e = [], []
            for word in pdf["word"]:
                pieces = _segment(word, v, MAX_PIECE_LEN)
                out_n.append(len(pieces))
                out_e.append(" ".join(pieces))
            yield pd.DataFrame({
                "word": pdf["word"], "freq": pdf["freq"],
                "n_pieces": out_n, "encoded": out_e,
            })

    return words.mapInPandas(
        seg, "word string, freq long, n_pieces int, encoded string"
    )


def unigram_train(words: DataFrame, top_k: int) -> DataFrame:
    """The full train loop: seed-usage prune to ``top_k`` multis,
    re-segment the word table under the survivors, and return the
    shipped model — (rank, piece, usage) for the ranked multi-char
    pieces, ``usage`` re-counted under the FINAL vocabulary (the
    refit after pruning; 0 for a survivor the re-segmentation never
    picks). All stages vocab-sized."""
    vocab = prune_vocab(words, top_k)
    enc = viterbi_encode(words, vocab)
    final_usage = (
        enc.select(
            "freq", F.explode(F.split("encoded", " ")).alias("piece")
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("usage"))
    )
    return (
        vocab.where(F.col("rank").isNotNull())
        .select("rank", "piece")
        .join(final_usage, "piece", "left")
        .select(
            "rank", "piece",
            F.coalesce("usage", F.lit(0)).cast("bigint").alias("usage"),
        )
    )
