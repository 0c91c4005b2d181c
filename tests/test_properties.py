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


# -------------------------------------------- branch + merge DML model

_BRANCH_OPS = st.lists(
    st.sampled_from(
        ["m_delete_d0", "m_update_d3", "b_update_d1", "b_delete_d2",
         "b_append_d9"]
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=5, deadline=None)
@given(ops=_BRANCH_OPS, seed=st.integers(min_value=0, max_value=10_000))
def test_branch_merge_matches_pandas_model(
    spark, tmp_path_factory, ops, seed
):
    """Model-based branching check: random DML interleaved across
    main and a branch (touching disjoint partition sets by
    construction) must merge to exactly the model's three-way result
    — branch-touched partitions take the branch's state, everything
    else keeps main's — with the branch's own history intact."""
    import pandas as pd

    from hands_on_trino_iceberg_superset_spark.lakehouse import VersionedTable

    rows = [
        (i, f"d{i % 4}", float((i * 11 + seed) % 90))
        for i in range(1, 33)
    ]
    base = pd.DataFrame(rows, columns=["k", "part", "v"])
    path = str(tmp_path_factory.mktemp("vtb") / "t")
    t = VersionedTable.create(
        spark,
        path,
        spark.createDataFrame(rows, "k long, part string, v double"),
        partition_col="part",
    )
    dev = t.create_branch("dev")
    main_m, dev_m = base.copy(), base.copy()
    next_key = 500

    for op in ops:
        if op == "m_delete_d0":
            t.delete("part = 'd0' AND v >= 10")
            main_m = main_m[
                ~((main_m["part"] == "d0") & (main_m["v"] >= 10))
            ]
        elif op == "m_update_d3":
            t.update({"v": "v + 7"}, where="part = 'd3'")
            main_m = main_m.copy()
            main_m.loc[main_m["part"] == "d3", "v"] += 7
        elif op == "b_update_d1":
            dev.update({"v": "v + 500"}, where="part = 'd1'")
            dev_m = dev_m.copy()
            dev_m.loc[dev_m["part"] == "d1", "v"] += 500
        elif op == "b_delete_d2":
            dev.delete("part = 'd2' AND v < 50")
            dev_m = dev_m[~((dev_m["part"] == "d2") & (dev_m["v"] < 50))]
        elif op == "b_append_d9":
            extra = [(next_key, "d9", 3.0)]
            next_key += 1
            dev.append(
                spark.createDataFrame(extra, "k long, part string, v double")
            )
            dev_m = pd.concat(
                [dev_m, pd.DataFrame(extra, columns=["k", "part", "v"])]
            )

    def per_part(m):
        return {
            p: sorted(map(tuple, g[["k", "v"]].to_numpy()))
            for p, g in m.groupby("part")
        }

    # branch-touched partitions = where the branch's state departed
    # from the fork point
    b0, b1 = per_part(base), per_part(dev_m)
    br_touched = {
        p for p in set(b0) | set(b1) if b0.get(p, []) != b1.get(p, [])
    }
    expected = pd.concat(
        [
            main_m[~main_m["part"].isin(br_touched)],
            dev_m[dev_m["part"].isin(br_touched)],
        ]
    )
    dev_before = sorted((r.k, r.part, r.v) for r in dev.read().collect())

    t.merge_branch("dev")

    got = sorted((r.k, r.part, r.v) for r in t.read().collect())
    want = sorted(tuple(x) for x in expected[["k", "part", "v"]].to_numpy())
    assert got == want
    # the branch itself is untouched by the merge
    after = sorted((r.k, r.part, r.v) for r in dev.read().collect())
    assert after == dev_before


_URLISH = st.builds(
    lambda scheme, www, host, path, slash, params, frag: (
        scheme + www + host + path + slash + params + frag
    ),
    st.sampled_from(["https://", "HTTP://", "Https://", "//", ""]),
    st.sampled_from(["www.", "WWW.", ""]),
    st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,12}", fullmatch=True),
    st.sampled_from(["", "/a", "/A/b", "/x/y/z"]),
    st.sampled_from(["", "/"]),
    st.sampled_from(["", "?b=2&a=1", "?utm_s=1", "?utm_s=1&k=v&"]),
    st.sampled_from(["", "#f", "#a#b"]),
)


@given(st.lists(_URLISH, min_size=1, max_size=12, unique=True))
@settings(max_examples=15, deadline=None)
def test_canonical_url_total_and_idempotent(spark, urls):
    """canonical_url over arbitrary URL-ish inputs: never NULL
    (phantom dedup clusters), and a fixed point — canonicalizing a
    canonical form changes nothing."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import (
        dedup as D,
    )

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = [r.c for r in
            df.select(D.canonical_url(F.col("url")).alias("c")).collect()]
    assert all(c is not None for c in once)
    df2 = spark.createDataFrame([(c,) for c in once], ["url"])
    twice = [r.c for r in
             df2.select(D.canonical_url(F.col("url")).alias("c")).collect()]
    assert twice == once


@given(
    st.lists(st.floats(min_value=-20, max_value=20,
                       allow_nan=False).map(lambda x: round(x, 2)),
             min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(-10, 10), st.integers(0, 12)),
             min_size=1, max_size=6),
    st.sampled_from([1, 3, 5]),
)
@settings(max_examples=15, deadline=None)
def test_range_bucket_join_matches_naive_on_random_bands(
    spark, values, bands, width
):
    """The bucketized range join is value-identical to the naive
    theta join on arbitrary fact values, band widths (empty bands
    included), overlaps, and bucket widths."""
    from hands_on_trino_iceberg_superset_spark.operators import (
        scale as SC,
    )

    facts = spark.createDataFrame([(float(v),) for v in values],
                                  "v double")
    ranges = spark.createDataFrame(
        [(f"b{i}", float(lo), float(lo + span))
         for i, (lo, span) in enumerate(bands)],
        "name string, lo double, hi double",
    )
    got = {
        (r.v, r.name)
        for r in SC.range_bucket_join(
            facts, ranges, "v", bucket_width=width
        ).collect()
    }
    naive = {
        (v, f"b{i}")
        for v in values
        for i, (lo, span) in enumerate(bands)
        if lo <= v < lo + span
    }
    assert got == naive


@given(
    st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=1,
                      max_size=6).map(" ".join),
             min_size=2, max_size=8),
    st.sampled_from([1, 2, 1000]),
)
@settings(max_examples=15, deadline=None)
def test_containment_capped_matches_python_reference(
    spark, docs, max_df
):
    """containment_pairs_inverted under ANY max_df equals the pure-
    Python reference computed over the same df-capped shingle
    universe (threshold 0 = every sharing pair emitted)."""
    from hands_on_trino_iceberg_superset_spark.operators import (
        dedup as D2,
    )

    n = 2
    sets = {i: set(_py_shingles(d, n)) for i, d in enumerate(docs)}
    df_count: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    capped = {i: {g for g in s if df_count[g] <= max_df}
              for i, s in sets.items()}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(capped[a] & capped[b])
            if not inter:
                continue
            want[(a, b)] = (
                inter / min(len(capped[a]), len(capped[b])),
                inter / (len(capped[a]) + len(capped[b]) - inter),
            )
    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): (r.containment, r.jaccard_sim)
        for r in D2.containment_pairs_inverted(
            sdf, threshold=0.0, n=n, max_df=max_df
        ).collect()
    }
    assert got.keys() == want.keys()
    for k, (c, j) in want.items():
        assert abs(got[k][0] - c) < 1e-12 and abs(got[k][1] - j) < 1e-12


# ---------------------------------------------------------------- dialect
# the two-quote tokenizing pass (r12): random statements interleaving
# single-quoted literals (with '' escapes and embedded double quotes)
# and double-quoted identifiers (with "" escapes and embedded single
# quotes) must keep every string literal byte-identical and convert
# every identifier to backticks, regardless of interleaving order.

_lit_body = st.text(
    alphabet=st.characters(blacklist_characters="'", min_codepoint=32,
                           max_codepoint=126),
    max_size=12,
)
_ident_body = st.text(
    alphabet=st.characters(blacklist_characters='"`',
                           min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=12,
)
_code_word = st.sampled_from(
    ["SELECT", "FROM t", "WHERE x =", ",", "AND y <",
     "CAST(a AS varchar)", "iceberg.demo.t", "varchar"]
)


@st.composite
def _statement(draw):
    """(sql, literals, identifiers): a random interleaving of code,
    literals, and quoted identifiers."""
    parts, lits, idents = [], [], []
    for _ in range(draw(st.integers(min_value=1, max_value=8))):
        kind = draw(st.sampled_from(["code", "lit", "ident"]))
        if kind == "code":
            parts.append(draw(_code_word))
        elif kind == "lit":
            body = draw(_lit_body)
            # re-quote: '' escapes happen via doubled draw below
            lit = "'" + body.replace("'", "''") + "'"
            parts.append(lit)
            lits.append(lit)
        else:
            body = draw(_ident_body)
            ident = '"' + body.replace('"', '""') + '"'
            parts.append(ident)
            idents.append((ident, "`" + body + "`"))
    return " ".join(parts), lits, idents


@given(_statement())
@settings(max_examples=200, deadline=None)
def test_dialect_two_quote_tokenizer_property(case):
    """Every single-quoted literal survives byte-identical; every
    double-quoted identifier becomes its backtick form — under ANY
    interleaving, including quotes of one kind embedded in spans of
    the other (the r11-ADVICE desync scenario, generalized)."""
    from hands_on_trino_iceberg_superset_spark.dialect import (
        trino_to_spark,
    )

    sql, lits, idents = case
    out = trino_to_spark(sql, strip_catalogs=())
    for lit in lits:
        assert lit in out, (sql, out)
    for _, backtick in idents:
        # identifiers containing rewritten keywords (a column named
        # "varchar") are the documented limitation — skip those
        low = backtick.lower()
        if any(k in low for k in ("varchar", "strpos", "arbitrary",
                                  "approx_distinct", "date_diff",
                                  "format_datetime",
                                  "json_extract_scalar", "unnest")):
            continue
        assert backtick in out, (sql, out)
