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


# ------------------------------------------------- lakehouse DML model

_OPS = st.lists(
    st.sampled_from(["delete_low", "update_flag", "merge_bump", "append"]),
    min_size=1,
    max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(ops=_OPS, seed=st.integers(min_value=0, max_value=10_000))
def test_versioned_table_matches_pandas_model(spark, tmp_path_factory, ops, seed):
    """Model-based check: a random DML sequence applied to the
    copy-on-write VersionedTable must equal the same sequence applied
    to an in-memory pandas model, and time travel must reproduce
    every intermediate state."""
    import pandas as pd

    from hands_on_trino_iceberg_superset_spark.lakehouse import VersionedTable

    rows = [
        (i, f"d{(i * (seed % 7 + 1)) % 4}", float((i * 13 + seed) % 97))
        for i in range(1, 41)
    ]
    model = pd.DataFrame(rows, columns=["k", "part", "v"])
    path = str(tmp_path_factory.mktemp("vt") / "t")
    table = VersionedTable.create(
        spark,
        path,
        spark.createDataFrame(rows, "k long, part string, v double"),
        partition_col="part",
    )
    states = [model.copy()]

    next_key = 1000
    for op in ops:
        if op == "delete_low":
            table.delete("v < 30")
            model = model[~(model["v"] < 30)]
        elif op == "update_flag":
            table.update({"v": "v + 1000"}, where="part = 'd1'")
            model = model.copy()
            model.loc[model["part"] == "d1", "v"] += 1000
        elif op == "merge_bump":
            src_rows = [(k, "d9", 5.0) for k in list(model["k"][:3])] + [
                (next_key, "d9", 5.0)
            ]
            next_key += 1
            src = spark.createDataFrame(
                src_rows, "k long, part string, v double"
            )
            table.merge(
                src, on="k",
                when_matched_update={"v": "s.v", "part": "s.part"},
            )
            model = model.copy()
            matched = model["k"].isin([r[0] for r in src_rows])
            model.loc[matched, ["part", "v"]] = ("d9", 5.0)
            new = [r for r in src_rows if r[0] not in set(model["k"])]
            if new:
                model = pd.concat(
                    [model, pd.DataFrame(new, columns=["k", "part", "v"])]
                )
        elif op == "append":
            extra = [(next_key, "d0", 7.0)]
            next_key += 1
            table.append(
                spark.createDataFrame(extra, "k long, part string, v double")
            )
            model = pd.concat(
                [model, pd.DataFrame(extra, columns=["k", "part", "v"])]
            )
        states.append(model.copy())

    def canon_spark(df):
        return sorted(
            (r.k, r.part, r.v) for r in df.collect()
        )

    def canon_model(m):
        return sorted(tuple(x) for x in m[["k", "part", "v"]].to_numpy())

    assert canon_spark(table.read()) == canon_model(states[-1])
    # time travel reproduces every intermediate state
    for version, m in enumerate(states, start=1):
        assert canon_spark(table.read(version=version)) == canon_model(m), (
            f"version {version} mismatch"
        )
