"""Per-document text statistics: quality scoring and language ID.

The standard pretraining-corpus quality-filter shape (length,
type/token ratio, stopword ratio, composite gate — the
fastText/CCNet-style heuristic tier) and the stopword-density
language-ID heuristic, as reusable operators so the SQL seam
(``TABLE(quality_scores(...))`` / ``TABLE(lang_id(...))``,
engine.py) and the inventory queries (queries/text.py) share ONE
definition.

Scale: both are ZERO-SHUFFLE pure maps — every score derives from
one document's own text, so at 100 TB the whole family is a
map-side projection pass with no exchange (plan-gated through the
SQL seam in tests/test_plans.py). All arithmetic is exact-integer
counts divided once in f64 — bit-identical across engines, no float
accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: high-frequency function words used by the language-ID heuristic
#: and the quality score's stopword ratio (queries/text.py derives
#: its oracle literal from THIS tuple — one definition).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _toks(text_col: str) -> Column:
    # NULL text maps to the EMPTY token array, not NULL: size(NULL)
    # is -1 under non-ANSI Spark, which would give every consumer
    # (token counts, ratios, pooled denominators) negative garbage
    return F.when(
        F.col(text_col).isNull(), F.array().cast("array<string>")
    ).otherwise(F.split(F.col(text_col), " "))


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chars_col: str | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document quality scores: ``n_tokens``, type/token ratio,
    stopword ratio, average token length, and the composite
    ``passes_quality`` gate (>= 20 tokens, >= half the tokens
    distinct, at least one stopword). ``chars_col`` names a
    precomputed character-count column (the documents table carries
    ``n_chars``); ``None`` counts ``length(text_col)``.
    ``carry_cols`` pass metadata columns (source, lang) through the
    map so downstream aggregates need no join back to the corpus."""
    toks = _toks(text_col)
    carry = list(carry_cols or [])
    n_chars = (F.col(chars_col) if chars_col is not None
               else F.length(F.col(text_col)))
    base = docs.select(
        F.col(id_col),
        *carry,
        n_chars.alias("__n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.size(
            F.filter(toks, lambda t: t.isin(*STOPWORDS))
        ).alias("n_stop"),
    )
    gate = (
        (F.col("n_tokens") >= 20)
        & (F.col("n_types") * 2 >= F.col("n_tokens"))
        & (F.col("n_stop") > 0)
    )
    # nullif: the empty (null-text) document has 0 tokens, and its
    # ratios are NULL, not a divide-by-zero error under ANSI mode
    denom = F.nullif(F.col("n_tokens"), F.lit(0))
    return base.select(
        id_col,
        *carry,
        "n_tokens",
        (F.col("n_types").cast("double") / denom).alias(
            "type_token_ratio"
        ),
        (F.col("n_stop").cast("double") / denom).alias(
            "stopword_ratio"
        ),
        (F.col("__n_chars").cast("double") / denom).alias(
            "avg_token_len"
        ),
        gate.alias("passes_quality"),
    )


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document language guess (stopword-density heuristic:
    >= 10% of tokens in the English function-word set -> ``'en'``,
    else ``'unknown'``). ``carry_cols`` pass extra input columns
    through (e.g. the labeled ``lang`` for a confusion matrix) so a
    downstream aggregate needs NO join back to the corpus — the
    whole family stays a zero-exchange map."""
    toks = _toks(text_col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    # the size(toks) > 0 guard keeps the empty (null-text) document
    # out of 'en': 0 stopwords >= 10% of 0 tokens is vacuously true
    guessed = (
        F.when((F.size(toks) > 0) & (n_stop * 10 >= F.size(toks)),
               "en")
        .otherwise("unknown")
    ).alias("guessed_lang")
    return docs.select(id_col, *(carry_cols or []), guessed)


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document repetition signals in the style of the Gopher
    quality rules (Rae et al. 2021, table A1: "fraction of
    characters in most common n-gram", "fraction of duplicate
    n-grams"), word-level:

    - ``n_words`` — whitespace tokens;
    - ``top_word_count`` — multiplicity of the most repeated word,
      computed as the longest equal-run in the SORTED token array
      via a single ``aggregate`` fold — LINEAR per document and
      ZERO-SHUFFLE (no explode/groupBy: a per-doc mode through an
      exchange would shuffle the whole corpus on (doc, word));
    - ``n_2grams`` / ``n_dup_2grams`` — adjacent word-pair count
      and how many of them are repeats of an earlier pair
      (``size - size(array_distinct)``).

    All outputs are exact integers so downstream aggregates can
    flag docs with integer arithmetic (``top_word_count * 5 >
    n_words`` is "top-word fraction > 0.20" with no float) and
    divide once at the end — bit-identical across engines. At
    100 TB the whole thing is a map-side projection pass with no
    exchange, same as the rest of this module."""
    toks = _toks(text_col)
    base = docs.select(
        F.col(id_col),
        *(carry_cols or []),
        toks.alias("__w"),
    )
    top_run = F.expr(
        """
        aggregate(
          array_sort(__w),
          named_struct('prev', CAST(NULL AS STRING),
                       'run', 0, 'best', 0),
          (acc, w) -> named_struct(
            'prev', w,
            'run', IF(acc.prev IS NOT NULL AND w = acc.prev,
                      acc.run + 1, 1),
            'best', greatest(
              acc.best,
              IF(acc.prev IS NOT NULL AND w = acc.prev,
                 acc.run + 1, 1))),
          acc -> acc.best)
        """
    )
    # greatest(.., 0): slice refuses a negative length, which the
    # empty (null-text) document would otherwise produce
    grams = F.expr(
        "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " slice(__w, 2, greatest(size(__w) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b))"
    )
    return base.select(
        id_col,
        *(carry_cols or []),
        F.size("__w").cast("long").alias("n_words"),
        top_run.cast("long").alias("top_word_count"),
        F.size(grams).cast("long").alias("n_2grams"),
        (F.size(grams) - F.size(F.array_distinct(grams)))
        .cast("long").alias("n_dup_2grams"),
    )
