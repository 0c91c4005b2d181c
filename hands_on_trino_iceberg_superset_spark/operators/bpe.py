"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the merge-table learning step of the tokenizer a
training-data pipeline ships alongside the corpus.

Spark-first shape:

1. The corpus collapses to a **word-frequency table** once (one
   shuffle). This is the classic BPE trick: merges depend only on
   (distinct word, count), so 100 TB of text becomes ~10^7-10^8
   weighted rows — still distributed, never driver-side.
2. Each merge round is **one JVM-side pair count** (adjacent symbol
   pairs exploded with the word's weight, summed) + a 1-row collect
   of the argmax (bounded driver traffic) + a map applying the merge
   to the symbol arrays. No Python in the hot path: pair extraction
   is ``transform(sequence(...))`` and merge application is an
   ``aggregate`` fold, both whole-stage-codegen expressions.
3. The symbols table is cached and re-materialized per round, so the
   lineage stays one-map deep instead of n_merges-deep.

Production tokenizers batch multiple disjoint merges per scan to cut
round count; this implementation learns one merge per round (the
textbook algorithm) because correctness against the reference
algorithm is the contract here — the per-round plan is already the
batched shape (swap the limit-1 for a limit-k of pairwise-disjoint
pairs to batch).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: marks end-of-word so a word-final symbol can't merge across words
END = "</w>"


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-sized
    shuffle of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word -> its character sequence plus the end-of-word marker."""
    return words.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("symbols"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts — overlapping occurrences count,
    exactly like the reference algorithm's get_stats."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("symbols") - 2),
        lambda i: F.struct(
            F.element_at("symbols", i + 1).alias("a"),
            F.element_at("symbols", i + 2).alias("b"),
        ),
    )
    return (
        symbols.where(F.size("symbols") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(symbols_col, a: str, b: str):
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a||b, as a fold: a just-merged element (a||b) can never
    itself equal ``a`` (b is non-empty), so the fold's look-back-one
    rule is exactly the reference's scan-and-skip."""
    merged = a + b
    return F.aggregate(
        symbols_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over ``docs``. Returns the merge
    table as a list of dicts (rank, left_sym, right_sym, merged,
    pair_count) — driver-sized by construction (one row per merge).

    Deterministic: the argmax tie-breaks on (count desc, left asc,
    right asc), so the learned tokenizer is identical on every run
    and engine. Stops early when no pair reaches ``min_pair_count``.
    """
    symbols = _initial_symbols(word_frequency(docs, text_col)).cache()
    symbols.count()  # materialize round 0
    merges: list[dict] = []
    try:
        for rank in range(1, n_merges + 1):
            best = (
                _pair_counts(symbols)
                .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best or best[0].pair_count < min_pair_count:
                break
            a, b, cnt = best[0].a, best[0].b, int(best[0].pair_count)
            merges.append({
                "rank": rank,
                "left_sym": a,
                "right_sym": b,
                "merged": a + b,
                "pair_count": cnt,
            })
            nxt = symbols.select(
                "freq", _apply_merge(F.col("symbols"), a, b).alias("symbols")
            ).cache()
            nxt.count()  # materialize: keeps lineage one map deep
            symbols.unpersist()
            symbols = nxt
    finally:
        symbols.unpersist()
    return merges


def bpe_train_df(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """:func:`bpe_train` as a DataFrame (rank, left_sym, right_sym,
    merged, pair_count) for the query inventory."""
    spark = docs.sparkSession
    merges = bpe_train(docs, n_merges, text_col)
    schema = ("rank int, left_sym string, right_sym string, "
              "merged string, pair_count bigint")
    if not merges:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [(m["rank"], m["left_sym"], m["right_sym"], m["merged"],
          m["pair_count"]) for m in merges],
        schema,
    )
