"""Property-based gates (SURVEY.md §5): the Spark expression kernels
against pure-Python references on generated inputs — catches
edge-case drift (empty docs, single tokens, repeated words) that
fixture corpora never hit."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from hands_on_trino_iceberg_superset_spark.dialect import trino_to_spark
from hands_on_trino_iceberg_superset_spark.operators import dedup as D

_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


def _py_shingles(text: str, n: int = 2) -> list[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


@given(st.lists(_doc, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_word_shingles_match_python_reference(spark, docs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["doc_id", "text"])
    got = {
        r.doc_id: list(r.sh)
        for r in df.select(
            "doc_id", D.word_shingles(F.col("text"), 2).alias("sh")
        ).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _py_shingles(d, 2), d


@given(st.lists(_doc, min_size=2, max_size=6))
@settings(max_examples=10, deadline=None)
def test_pairwise_jaccard_matches_python(spark, docs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in D.ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = set(_py_shingles(docs[i])), set(_py_shingles(docs[j]))
            if not a and not b:
                continue
            expect = len(a & b) / len(a | b) if (a | b) else None
            if (i, j) in got:
                assert abs(got[(i, j)] - expect) < 1e-12
            else:
                # pairs can only be absent when a side has no shingles
                # (empty arrays are filtered) or the ratio prefilter
                # can't apply at threshold 0 -> must mean empty side
                assert not a or not b


@given(st.text(alphabet=st.characters(blacklist_characters="'"),
               max_size=60))
@settings(max_examples=50, deadline=None)
def test_dialect_rewrite_idempotent(text):
    once = trino_to_spark(text)
    assert trino_to_spark(once) == once or "UNNEST" in text.upper()
