"""Similarity-search query-inventory entries (north-star extension).

Query set: every 100th vector is a query (deterministic, scales with
the corpus). Brute-force top-k carries a DuckDB oracle; the LSH
variant is approximate by construction -> rows-only for the driver,
with recall measured against brute force in tests/test_similarity.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.operators import similarity as S
from hands_on_trino_iceberg_superset_spark.queries.base import register
from hands_on_trino_iceberg_superset_spark.sources import load_table

EMBED_DIM = 64


def _queries(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") % 100 == 0)


@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) AS cos_sim
      FROM q JOIN embeddings c ON q.vec_id != c.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="Exact brute-force cosine top-10 per query vector (broadcast "
        "queries, single corpus scan, TakeOrdered per partition key).",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, _queries(emb), k=10)


@register(
    "ann_cosine_topk_lsh",
    oracle=None,  # approximate; recall gate in tests/test_similarity.py
    doc="Hyperplane-LSH bucketed approximate top-10 (8 planes, 4 "
        "2-bit chunks multi-probe) with exact cosine re-rank. Wide "
        "probing: the test corpus is unclustered (max pairwise "
        "cosine ~0.5), so narrow buckets would gut recall.",
)
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.hyperplane_lsh_topk(emb, _queries(emb), dim=EMBED_DIM, k=10)


@register(
    "ann_cosine_topk_ivf",
    oracle=None,  # k-means cell assignment is Spark-side; recall gate
    # vs the exact baseline lives in tests/test_similarity.py
    doc="IVF approximate top-k: k-means coarse quantizer (pyspark.ml) "
        "+ n_probe nearest cells per query + exact cosine re-rank — "
        "scan cost ~ n_probe/n_centroids of the corpus per query; "
        "the partition-pruned ANN path at 100 TB.",
)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=8)


@register(
    "embedding_label_centroids",
    oracle="""
    SELECT label AS label, count(*) AS n_vectors,
           round(avg(emb_norm), 6) AS avg_norm
    FROM (
      SELECT label,
             sqrt(list_aggregate(
               list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))
               AS emb_norm
      FROM embeddings
    )
    GROUP BY label
    """,
    doc="Per-label vector statistics (count + mean L2 norm).",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm = S.l2_norm(S.as_double(F.col("embedding")))
    return (
        emb.select("label", norm.alias("emb_norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("emb_norm"), 6).alias("avg_norm"),
        )
    )
