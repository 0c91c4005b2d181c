"""Lexical retrieval: BM25 scoring and top-k search over a document
corpus (Robertson et al., Okapi BM25; the Lucene-default scoring
function), plus reciprocal-rank fusion with a vector ranker — the
lexical half of every hybrid retrieval stack and the standard tool
for mining supervision pairs out of a pretraining corpus.

Determinism contract (what makes the DuckDB oracle exact): the only
transcendental is the per-(query-term, doc) partial score
``idf * saturation`` — it is rounded to 9 decimals and summed as
DECIMAL, so the per-document score is an exact decimal sum of
identically-rounded doubles on both engines regardless of partial-
aggregation order; ranking sorts that exact decimal with a doc-id
tie-break. Same discipline as the repo's float-aggregation rule
(queries/base.py module docstring).

Scale shape:

- ``tf``/``df``/``dl`` are one tokenize-explode shuffle each over
  the corpus (the same key class as dedup_exact: state bounded by
  (doc, term) postings / vocabulary / documents).
- corpus statistics (N, avgdl) are ONE 1-row aggregate, cross-joined
  (broadcast) — never a window over the corpus.
- the query set is tiny by construction and BROADCASTS into the
  postings join, so scoring touches only documents that share a
  term with some query (the inverted-index access path — at 100 TB
  this is posting-list-sized, not corpus-sized; engines add WAND
  pruning on top, which changes cost, not results).
- per-query top-k is a window over the scored candidates. A hot
  stopword query term inflates one query's candidate set; cap k1/b
  tuning aside, the mitigation is the same max_df discipline as
  ngram dedup (drop terms with df above a bound from QUERIES — they
  carry ~zero idf anyway).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

K1 = 1.2
B = 0.75


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, doc_id, score) for every (query, document) pair sharing
    at least one term. ``queries`` carries (qid, qtext); terms are
    whitespace tokens on both sides. Score is the exact-decimal BM25
    sum described in the module docstring, emitted as DOUBLE."""
    toks = _tokens(docs, text_col, id_col)
    # (doc, term) postings materialized ONCE (r14 optimization
    # round): tf feeds the scoring join AND derives dl / dft / the
    # corpus stats below, and without this each reference re-runs
    # the tokenize-explode + postings shuffle over the corpus — the
    # final plan paid the corpus pass FOUR times. dl is recovered as
    # sum(tf) per doc (identical bigint: every non-empty token is
    # counted exactly once either way).
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dft = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    qt = (
        queries.select(
            "qid", F.explode(F.split("qtext", " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(K1 + 1)) / (
        F.col("tf")
        + F.lit(K1)
        * (F.lit(1 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
    )
    term_score = F.round(idf * sat, 9).cast("decimal(20,9)")
    return (
        tf.join(F.broadcast(qt), "term")
        .join(dft, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(term_score).alias("score_dec"))
        .select(
            "qid", "doc_id",
            F.col("score_dec").cast("double").alias("score"),
            "score_dec",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, rank, doc_id, score) — the top ``k`` documents per query
    by exact-decimal BM25, doc-id tie-break."""
    from pyspark.sql import Window

    scored = bm25_scores(docs, queries, text_col, id_col)
    w = Window.partitionBy("qid").orderBy(
        F.desc("score_dec"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two
    per-query rankings, each carrying (qid, rank, doc_id):
    ``score = Σ 1/(c + rank)`` over the rankers that returned the
    document. Ranks are exact integers, each document's fusion score
    is a sum of at most two doubles with a fixed operand set —
    deterministic on every engine — and ties break on doc_id. The
    standard hybrid-retrieval combiner: no score normalization
    across heterogeneous rankers, just ranks."""
    from pyspark.sql import Window

    lex = lexical.select("qid", "doc_id",
                         F.col("rank").alias("r_lex"))
    vec = vector.select("qid", "doc_id",
                        F.col("rank").alias("r_vec"))
    fused = (
        lex.join(vec, ["qid", "doc_id"], "full_outer")
        .select(
            "qid", "doc_id", "r_lex", "r_vec",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(c) + F.col("r_lex")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(c) + F.col("r_vec")), F.lit(0.0)
                )
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "r_lex", "r_vec", "rrf")
    )
