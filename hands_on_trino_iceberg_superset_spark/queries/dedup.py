"""Dedup query-inventory entries (north-star extension tier).

Oracle strategy per operator:

- exact + n-gram Jaccard + embedding near-dup: fully SQL-expressible
  -> DuckDB oracles.
- MinHash-LSH and SimHash: depend on Spark's xxhash64 (not available
  in DuckDB) -> registered without oracle (driver records rows-only);
  their correctness gate is ``tests/test_dedup.py``, which checks
  LSH recall against the exact-Jaccard baseline and SimHash against a
  pure-Python reference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.operators import dedup as D
from hands_on_trino_iceberg_superset_spark.operators import similarity as S
from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.sources import load_table


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
             AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS n_dups
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized fingerprint; "
        "survivor = min doc_id per content group.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(docs)


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH shingled AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text,' ')) - 1),
               i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
             )) AS sh
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             AS jaccard_sim
    FROM shingled a JOIN shingled b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.4
    """,
    doc="Exact word-bigram Jaccard near-dup pairs (threshold 0.4), "
        "blocked by lang, via the inverted-index plan (postings "
        "equi-join + pair groupBy = intersection counting; near-"
        "linear in corpus size for rare shingles).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs_inverted(
        docs, threshold=0.4, n=2, block_col="lang"
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-based; verified in tests/test_dedup.py
    doc="MinHash(32 hashes) + LSH(16 bands x 2 rows) candidate "
        "generation, exact-Jaccard verification at 0.4. Linear "
        "shuffle; the 100 TB dedup path.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, threshold=0.4, n=2)


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64-based; verified in tests/test_dedup.py
    doc="SimHash64 near-dup pairs at Hamming distance <= 3 with "
        "pigeonhole chunk blocking.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, max_hamming=3)


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs (threshold 0.4), exact "
        "all-pairs baseline; scale path is LSH bucketing.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_neardup_pairs(emb, threshold=0.4)
