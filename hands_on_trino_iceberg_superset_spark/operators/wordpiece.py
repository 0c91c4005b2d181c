"""WordPiece-family tokenizer: frequency-selected subword vocabulary
plus greedy longest-match-first encoding (the BERT tokenizer's
inference rule, Devlin et al. arXiv:1810.04805; continuation pieces
carry the ``##`` prefix).

Honest simplification, stated up front: real WordPiece training
maximizes corpus likelihood; likelihood scores are float products
whose accumulation order differs across engines, so this trainer
selects the vocabulary by EXACT OCCURRENCE FREQUENCY (integer
counts, deterministic ties) instead — the same greedy-inference
contract with a reproducible, oracle-checkable selection rule.
Single-character pieces of every observed (char, position-class)
pair are always kept, so encoding can never fail mid-word.

Scale shape (mirrors :mod:`operators.bpe`): the ONLY corpus-sized
operation is the word-frequency groupBy; everything after —
occurrence explosion, piece counting, top-K selection, greedy
encoding — runs on the VOCAB-sized distinct-word table. At 100 TB
the word table still fits comfortably (natural-language vocabularies
plateau in the tens of millions), and the greedy encode of the
actual corpus is a map-side broadcast-dictionary pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MAX_PIECE_LEN = 4


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-sized
    shuffle."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def piece_counts(words: DataFrame, min_len: int = 1,
                 max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """Total weighted occurrence count per (piece, class): every
    substring of length ``min_len..max_len`` at every position of
    every word, weighted by word frequency; class is ``start`` at
    position 1, ``cont`` elsewhere (WordPiece's two token spaces).
    """
    occ = words.selectExpr(
        "freq",
        f"""
        explode(flatten(transform(
          sequence(1, length(word)),
          i -> transform(
            sequence({min_len}, {max_len}),
            L -> named_struct(
              'piece', substr(word, i, L),
              'cls', CASE WHEN i = 1 THEN 'start' ELSE 'cont' END,
              'want', L)))))
        AS occ
        """,
    ).where("length(occ.piece) = occ.want")
    return (
        occ.groupBy(
            F.col("occ.piece").alias("piece"),
            F.col("occ.cls").alias("cls"),
        )
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def ranked_multi_pieces(counts: DataFrame, top_k: int) -> DataFrame:
    """The ONE multi-char selection rule — (count DESC, class ASC,
    piece ASC), top ``top_k`` — shared by :func:`select_vocab` and
    the train query's oracle-gated output, so the vocabulary the
    encoder uses can never silently diverge from the ranking the
    driver hashes."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("cls"), F.asc("piece"))
    return (
        counts.where(F.length("piece") > 1)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def select_vocab(words: DataFrame, top_k: int = 40) -> DataFrame:
    """Vocabulary = every observed single-(char, class) pair (the
    encodability floor) plus the ``top_k`` multi-char pieces from
    :func:`ranked_multi_pieces` — exact-integer, fully deterministic
    selection. Returns (piece, cls, cnt, rank) with rank NULL on the
    single-char floor."""
    counts = piece_counts(words)
    singles = counts.where(F.length("piece") == 1).withColumn(
        "rank", F.lit(None).cast("int")
    )
    return singles.unionByName(ranked_multi_pieces(counts, top_k))


def display_form(piece: F.Column, cls: F.Column) -> F.Column:
    return F.when(cls == "cont", F.concat(F.lit("##"), piece)) \
        .otherwise(piece)


def encode_words(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Greedy longest-match-first segmentation of each distinct word
    under ``vocab`` — BERT's WordPiece inference rule. The vocab
    (bounded by construction) broadcasts as a plain set; each word
    encodes in one Arrow batch pass. Returns
    (word, freq, n_pieces, encoded) with ``encoded`` the
    space-joined display pieces (``##`` continuation prefix)."""
    import pandas as pd

    vset = {
        (r.piece, r.cls)
        for r in vocab.select("piece", "cls").collect()
    }
    bset = words.sparkSession.sparkContext.broadcast(vset)

    def seg(batch_iter):
        for pdf in batch_iter:
            vs = bset.value
            out_n, out_e = [], []
            for word in pdf["word"]:
                pos, pieces = 0, []
                while pos < len(word):
                    cls = "start" if pos == 0 else "cont"
                    for length in range(MAX_PIECE_LEN, 0, -1):
                        cand = word[pos:pos + length]
                        if len(cand) == length and (cand, cls) in vs:
                            pieces.append(
                                cand if cls == "start" else "##" + cand
                            )
                            pos += length
                            break
                    else:  # pragma: no cover — singles floor
                        raise ValueError(
                            f"unencodable character at {word!r}:{pos}"
                        )
                out_n.append(len(pieces))
                out_e.append(" ".join(pieces))
            yield pd.DataFrame({
                "word": pdf["word"], "freq": pdf["freq"],
                "n_pieces": out_n, "encoded": out_e,
            })

    return words.mapInPandas(
        seg, "word string, freq long, n_pieces int, encoded string"
    )
