"""Curation operators: planted-case semantics + plan-shape gates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hands_on_trino_iceberg_superset_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def inventory():
    return load_all()


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 20}", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_repetition_flags_degenerate_doc(spark, inventory, tmp_path):
    clean = "the quick brown fox jumps over a lazy dog near the old river bank today " * 2
    spammy = "buy now " * 40
    _docs_df(spark, [clean.strip(), spammy.strip()]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in inventory["text_repetition_filter"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out[0].passes_repetition
    assert not out[1].passes_repetition
    assert out[1].top_token_frac == pytest.approx(0.5)
    assert out[1].top_bigram_frac > 0.9


def test_contamination_detects_planted_overlap(spark, inventory, tmp_path):
    # doc 0 is "eval" (0 % 97 == 0); doc 97 is eval too. Plant one
    # training doc sharing an 8-gram with doc 0, one clean.
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    leak = "xx yy " + "alpha beta gamma delta epsilon zeta eta theta"
    clean = "one two three four five six seven eight nine ten eleven"
    rows = [(0, eval_text), (1, leak), (2, clean)]
    spark.createDataFrame(
        [(i, t, "en", "srcA", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = inventory["text_contamination_check"].spark(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    assert out[0].n_train_docs == 2
    assert out[0].n_contaminated == 1


def test_mix_multiplicities(spark, inventory):
    rows = inventory["training_mix_sample"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        grp = int(r.source[3:]) % 3
        if grp == 1:  # 1.0 epochs: exact passthrough
            assert r.n_emitted_docs == r.n_input_docs
        elif grp == 0:  # 0.5 epochs: strictly fewer
            assert r.n_emitted_docs <= r.n_input_docs
        else:  # 2.5 epochs: at least 2x
            assert 2 * r.n_input_docs <= r.n_emitted_docs <= 3 * r.n_input_docs


def test_mix_is_deterministic(spark, inventory):
    a = inventory["training_mix_sample"].spark(spark, SF).collect()
    b = inventory["training_mix_sample"].spark(spark, SF).collect()
    assert a == b


def test_repetition_plan_no_data_shuffle(spark, inventory):
    """The filter itself is map-side only: the single exchange in the
    plan is the final presentation sort, not a data shuffle."""
    df = inventory["text_repetition_filter"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "rangepartitioning" in plan.lower() or "Exchange" not in plan


def test_contamination_plan_broadcasts_eval(spark, inventory):
    df = inventory["text_contamination_check"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_bpe_train_matches_python_reference(spark, sf_dir: str) -> None:
    """The distributed BPE trainer must learn EXACTLY the merge
    sequence of the reference algorithm (pure-Python get_stats /
    merge_vocab over the same corpus, same tie-breaks)."""
    from collections import Counter

    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        END,
        bpe_train,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = bpe_train(docs, n_merges=12)

    # reference implementation (Sennrich et al. 2016, fig. 1 shape)
    words = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + [END]): f for w, f in words.items()}
    expect = []
    for rank in range(1, 13):
        stats = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        # deterministic tie-break: count desc, then (a, b) ASC
        top = max(stats.values())
        best = min(
            (p for p, c in stats.items() if c == top)
        )
        cnt = stats[best]
        if cnt < 2:
            break
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
        expect.append({"rank": rank, "left_sym": a, "right_sym": b,
                       "merged": a + b, "pair_count": cnt})

    assert got == expect
