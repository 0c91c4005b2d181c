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


def _reference_merges(docs_rows, n_merges):
    """Pure-Python reference BPE (Sennrich et al. 2016, fig. 1
    shape): full get_stats recount every round — deliberately the
    naive algorithm, so both production routes (incremental driver
    loop, distributed loop) diff against it."""
    from collections import Counter

    from hands_on_trino_iceberg_superset_spark.operators.bpe import END

    words = Counter()
    for text in docs_rows:
        for w in text.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + [END]): f for w, f in words.items()}
    expect = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        # deterministic tie-break: count desc, then (a, b) ASC
        top = max(stats.values())
        best = min(p for p, c in stats.items() if c == top)
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
    return expect


def test_bpe_train_matches_python_reference(spark, sf_dir: str) -> None:
    """BOTH volume routes of the BPE trainer must learn EXACTLY the
    merge sequence of the reference algorithm (pure-Python
    get_stats / merge_vocab over the same corpus, same
    tie-breaks)."""
    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        bpe_train,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    expect = _reference_merges(
        [r.text for r in docs.select("text").collect()], 12
    )
    # default = driver route (vocab-sized word table)
    assert bpe_train(docs, n_merges=12) == expect
    # forced distributed route must learn the identical table
    assert bpe_train(docs, n_merges=12, driver_max_words=0) == expect


def test_bpe_encode_matches_min_rank_reference(spark) -> None:
    """The rank-order-replay encoder must equal an INDEPENDENT
    implementation of BPE encoding (GPT-2 style: repeatedly merge
    the lowest-ranked pair present) on an adversarial vocabulary —
    runs of repeated symbols, nested merges, single-char words."""
    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        END,
        bpe_train,
        encode_word,
    )

    corpus = [
        "aaaa aaa aa a aaaaaa",
        "low lower lowest low low slow",
        "new newer newest news new",
        "ab abab ababab b ba",
    ]
    merges = bpe_train(_docs_df(spark, corpus), n_merges=10)
    ranks = {
        (m["left_sym"], m["right_sym"]): m["rank"] for m in merges
    }
    pairs = [(m["left_sym"], m["right_sym"]) for m in merges]

    def min_rank_encode(word):
        syms = list(word) + [END]
        while len(syms) > 1:
            cands = [
                (ranks[p], i)
                for i, p in enumerate(zip(syms, syms[1:]))
                if p in ranks
            ]
            if not cands:
                break
            rank = min(r for r, _ in cands)
            a, b = pairs[rank - 1]
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return tuple(syms)

    words = {w for t in corpus for w in t.split(" ") if w}
    for w in sorted(words):
        assert encode_word(w, pairs) == min_rank_encode(w), w


def test_bpe_encode_roundtrip_and_conservation(spark, sf_dir) -> None:
    """Decoding the token stream must reproduce each document's
    non-space text exactly, and the emitted n_words/n_chars/
    n_tokens columns must match the token stream they summarize."""
    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        END,
        bpe_encode,
        bpe_train,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=16)
    enc = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert enc.keys() == raw.keys()
    for did, text in raw.items():
        r = enc[did]
        decoded = "".join(r.tokens).replace(END, "")
        assert decoded == text.replace(" ", "")
        assert r.n_tokens == len(r.tokens)
        assert r.n_words == sum(
            1 for t in r.tokens if t.endswith(END)
        )
        assert r.n_chars == len(decoded)



def test_bpe_encode_carries_string_id_type(spark):
    """id_col is schema-driven, not hardcoded long: string doc ids
    must round-trip through the encoder."""
    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [("doc-a", "low lower low"), ("doc-b", "newer new")],
        "doc_id string, text string",
    )
    merges = bpe_train(docs, n_merges=4)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    assert set(out) == {"doc-a", "doc-b"}
    assert out["doc-a"].n_words == 3


def test_bpe_vocab_and_id_encoding_roundtrip(spark, sf_dir) -> None:
    """The shipped artifact chain: merges -> vocabulary -> id-encoded
    corpus. Ids are deterministic (sorted base chars, then merges in
    rank order), every emitted id resolves (no -1 when the vocab came
    from the same corpus), and inverting the vocab reconstructs each
    document's non-space text exactly."""
    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        END,
        bpe_base_alphabet,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=16)
    vocab = bpe_vocab(merges, bpe_base_alphabet(docs))
    # base tier is a contiguous sorted prefix; merge tier follows rank
    base = sorted(v for k, v in vocab.items()
                  if k == END or len(k) == 1)
    assert base == list(range(len(base)))
    ranked = [m["merged"] for m in merges if m["merged"] in vocab]
    ids = [vocab[t] for t in ranked]
    assert ids == sorted(ids)

    inv = {v: k for k, v in vocab.items()}
    enc = {r.doc_id: r.token_ids
           for r in bpe_encode_ids(docs, merges, vocab).collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert enc.keys() == raw.keys()
    for did, text in raw.items():
        tids = enc[did]
        assert -1 not in tids
        decoded = "".join(inv[t] for t in tids).replace(END, "")
        assert decoded == text.replace(" ", "")


# ------------------------------------------------------------------
# text_perplexity_buckets / training_split_leakproof /
# corpus_drift_report (round-5 additions)
# ------------------------------------------------------------------


def test_perplexity_buckets_rank_predictable_docs_lower(
    spark, inventory, tmp_path
):
    # even doc_ids train the LM; the weird doc sits at the ODD id 5
    # so it is genuinely held out — every one of its bigrams and
    # unigrams misses the model, exercising the coalesce(cb,0)/
    # coalesce(cu,0) left-join-null scoring path
    pattern = ("spark scan filter join " * 10).strip()
    weird = "zz qq vv kk ww rr tt uu yy xx"
    rows = [pattern] * 5 + [weird]
    _docs_df(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in inventory["text_perplexity_buckets"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == set(range(6))
    pat_scores = {out[i].score for i in range(5)}
    assert len(pat_scores) == 1  # identical docs -> identical score
    assert out[5].score > out[0].score
    assert all(out[i].bucket == "head" for i in range(5))
    assert out[5].bucket == "tail"
    assert out[0].n_bigrams == 39


def test_perplexity_sentinel_buckets(spark, inventory, tmp_path):
    # lang 'rare' exists only at an odd doc_id (no training slice)
    # -> 'unmodeled', never a degenerate nll=0 'head'; a one-token
    # doc has no bigram to score -> 'unscored', never dropped
    docs = [
        (0, "alpha beta alpha beta alpha", "en", "src0", 27),
        (1, "alpha beta alpha gamma", "en", "src1", 22),
        (2, "alpha beta gamma delta", "en", "src2", 22),
        (3, "some rare language words here", "rare", "src3", 29),
        (4, "solo", "en", "src4", 4),
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in inventory["text_perplexity_buckets"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == set(range(5))
    assert out[3].bucket == "unmodeled"
    assert out[3].score is not None  # scored, just not tertiled
    assert out[4].bucket == "unscored"
    assert out[4].n_bigrams == 0 and out[4].score is None
    assert {out[i].bucket for i in (0, 1, 2)} <= {"head", "middle", "tail"}


def test_perplexity_buckets_are_per_language_tertiles(spark, inventory):
    rows = (
        inventory["text_perplexity_buckets"]
        .spark(spark, SF)
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        buckets = {b: [r.score for r in rs if r.bucket == b]
                   for b in ("head", "middle", "tail")}
        # tertiles are ordered by score and roughly balanced
        if buckets["head"] and buckets["middle"]:
            assert max(buckets["head"]) <= min(buckets["middle"])
        if buckets["middle"] and buckets["tail"]:
            assert max(buckets["middle"]) <= min(buckets["tail"])
        n = len(rs)
        assert len(buckets["head"]) >= n // 4


def test_split_leakproof_duplicates_share_split(spark, inventory, tmp_path):
    # byte-identical content under different doc_ids must co-split
    dup = "the same exact document text repeated verbatim here"
    rows = [dup, "first unique doc text", dup, "second unique doc text",
            "  ".join(dup.split())]  # whitespace variant normalizes equal
    _docs_df(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = (
        inventory["training_split_leakproof"]
        .spark(spark, str(tmp_path))
        .collect()
    )
    by_fp: dict[str, set] = {}
    for r in out:
        by_fp.setdefault(r.fingerprint, set()).add(r.split)
    assert all(len(s) == 1 for s in by_fp.values())
    dup_groups = [r for r in out if r.n_group == 3]
    assert len(dup_groups) == 3  # dup + dup + whitespace variant


def test_split_leakproof_fractions_at_sf01(spark, inventory):
    out = (
        inventory["training_split_leakproof"]
        .spark(spark, "/root/testdata/sf0.1")
        .groupBy("split")
        .count()
        .collect()
    )
    counts = {r.split: r["count"] for r in out}
    total = sum(counts.values())
    assert total == 5000
    assert 0.85 <= counts["train"] / total <= 0.95
    assert 0.02 <= counts.get("val", 0) / total <= 0.08
    assert 0.02 <= counts.get("test", 0) / total <= 0.08


def test_drift_report_flags_skewed_source(spark, inventory, tmp_path):
    balanced = "alpha beta gamma delta " * 5
    skewed = "alpha alpha alpha alpha alpha alpha alpha alpha"
    rows = []
    for i in range(8):  # sources src0..src7 get balanced docs
        rows.append(balanced.strip())
    docs = [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(rows)]
    docs.append((8, skewed, "en", "srcSKEW", len(skewed)))
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in inventory["corpus_drift_report"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # PSI is non-negative by construction and maximal for the
    # single-token source, whose top drifting token is its spam token
    assert all(r.psi >= 0 for r in out.values())
    assert out["srcSKEW"].psi == max(r.psi for r in out.values())
    assert out["srcSKEW"].top_drift_token == "alpha"
    assert out["srcSKEW"].top_drift_delta > 0
    assert out["src0"].psi < out["srcSKEW"].psi


# ------------------------------------------------------------------
# dedup_lines / training_mixture_weights (round-5 additions)
# ------------------------------------------------------------------


def test_dedup_lines_cuts_later_copies_only(spark, inventory, tmp_path):
    import hashlib

    # 16-token line A shared by docs 0 and 2; doc 2 is ONLY line A
    # (all-duplicate doc); doc 1 is unique
    line_a = " ".join(f"a{i}" for i in range(16))
    line_b = " ".join(f"b{i}" for i in range(16))
    rows = [line_a + " " + line_b, "unique words only here", line_a]
    _docs_df(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in inventory["dedup_lines"].spark(spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 1, 2}
    # doc 0 owns the first occurrence: nothing removed
    assert out[0].n_lines == 2 and out[0].n_kept == 2
    assert out[0].kept_fingerprint == hashlib.md5(
        (line_a + " " + line_b).encode()
    ).hexdigest()
    # doc 1 untouched (3 tokens = 1 short line)
    assert out[1].n_lines == 1 and out[1].n_removed == 0
    # doc 2 loses its only line to doc 0 -> empty rewrite, still a row
    assert out[2].n_lines == 1 and out[2].n_kept == 0
    assert out[2].n_removed == 1
    assert out[2].kept_fingerprint == hashlib.md5(b"").hexdigest()


def test_dedup_lines_first_occurrence_is_positional(spark, inventory,
                                                    tmp_path):
    # inside ONE doc a repeated line keeps only its first position
    line = " ".join(f"w{i}" for i in range(16))
    rows = [line + " " + line]
    _docs_df(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = inventory["dedup_lines"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_lines == 2 and out[0].n_kept == 1


def test_mixture_weights_boost_small_domains(spark, inventory, tmp_path):
    # src big: 10 docs x 40 tokens; src small: 1 doc x 40 tokens
    big = " ".join(f"t{i}" for i in range(40))
    docs = [(i, big, "en", "big", len(big)) for i in range(10)]
    docs.append((10, big, "en", "small", len(big)))
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in inventory["training_mixture_weights"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out["big"].n_tokens == 400 and out["small"].n_tokens == 40
    # alpha < 1 lifts the small domain above its raw share and the
    # big domain below its raw share; weights still sum to 1
    assert out["small"].weight > out["small"].raw_share
    assert out["big"].weight < out["big"].raw_share
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-5
    # boosted small domain repeats (>1 epoch); big trains <1 epoch
    assert out["small"].epochs > 1.0
    assert out["big"].epochs < 1.0


def test_zipf_fit_planted_power_law(spark, inventory, tmp_path):
    # token counts 8/4/2/1 (monotone heavy tail): slope must come
    # out negative and the rank-1 token/count must be exact
    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    _docs_df(spark, [text]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = inventory["text_zipf_fit"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.lang == "en"
    assert r.n_tokens == 15 and r.vocab_size == 4
    assert r.top_token == "aa" and r.top_count == 8
    assert r.zipf_slope < -1.0


def test_zipf_fit_is_per_language(spark, inventory):
    rows = (
        inventory["text_zipf_fit"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    langs = {r.lang for r in rows}
    assert len(langs) == len(rows) >= 2
    # the synthetic corpus is heavy-tailed in every language
    assert all(r.zipf_slope < 0 for r in rows)
    assert all(r.vocab_size <= r.n_tokens for r in rows)


def test_stratified_sample_is_deterministic_and_per_stratum(
    spark, inventory
):
    a = (
        inventory["eval_stratified_sample"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    b = (
        inventory["eval_stratified_sample"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert sorted(a) == sorted(b)  # zero RNG state
    by_lang: dict[str, list] = {}
    for r in a:
        by_lang.setdefault(r.lang, []).append(r)
    assert all(len(v) == 5 for v in by_lang.values())
    # ranks are 1..5 ordered by the pick hash
    for rs in by_lang.values():
        rs = sorted(rs, key=lambda r: r.sample_rank)
        assert [r.sample_rank for r in rs] == [1, 2, 3, 4, 5]
        hashes = [r.pick_hash for r in rs]
        assert hashes == sorted(hashes)


def test_embedding_coverage_counts_missing(spark, inventory, tmp_path):
    docs = [(i, f"text {i}", "en", f"src{i % 2}", 7) for i in range(6)]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    # embeddings exist only for even doc_ids (unit-norm 2-vector
    # padded to float list)
    emb = [(i, [1.0, 0.0, 0.0, 0.0], "l0") for i in range(0, 6, 2)]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label string"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {
        r.source: r
        for r in inventory["corpus_embedding_coverage"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # src0 holds the even doc_ids -> fully embedded; src1 none
    assert out["src0"].n_docs == 3 and out["src0"].n_embedded == 3
    assert out["src0"].n_missing == 0
    assert out["src0"].avg_norm == 1.0
    assert out["src1"].n_docs == 3 and out["src1"].n_embedded == 0
    assert out["src1"].n_missing == 3
    assert out["src1"].avg_norm is None


def test_inference_batch_plan_sorted_beats_hashed(spark, inventory):
    rows = (
        inventory["inference_batch_plan"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r.strategy, []).append(r)
    assert set(by) == {"sorted", "hashed"}
    # both strategies cover every document exactly once
    assert sum(r.n_docs for r in by["sorted"]) == 500
    assert sum(r.n_docs for r in by["hashed"]) == 500
    # invariants per batch: waste = 1 - sum/padded, padded >= sum
    # (an all-empty batch legitimately has padded=0 -> NULL waste)
    for r in rows:
        assert r.padded_tokens >= r.sum_len
        assert r.waste_frac is None or 0.0 <= r.waste_frac < 1.0
    # the measured claim: length-sorted batching wastes far fewer
    # pad tokens than hash-assigned batching, corpus-wide
    def waste(rs):
        padded = sum(r.padded_tokens for r in rs)
        real = sum(r.sum_len for r in rs)
        return (padded - real) / padded

    assert waste(by["sorted"]) < 0.5 * waste(by["hashed"])


def test_dedup_lines_matches_python_reference_on_random_corpora(
    spark, inventory, tmp_path
):
    """Property test: on randomized small corpora (skewed token
    alphabet to force cross- and intra-doc line collisions), the
    distributed rewrite must equal an independent first-occurrence
    reference computed in plain Python."""
    import hashlib
    import random

    rng = random.Random(20260815)
    alphabet = ["a", "b", "c"]
    for case in range(5):
        rows = []
        for _ in range(rng.randint(3, 12)):
            n = rng.choice([0, 1, 15, 16, 17, 32, 40])
            rows.append(" ".join(rng.choice(alphabet) for _ in range(n)))
        out_dir = tmp_path / f"case{case}"
        _docs_df(spark, rows).write.parquet(
            str(out_dir / "documents.parquet")
        )

        # python reference: first occurrence in (doc_id, line_idx)
        seen: set[str] = set()
        expect = {}
        for doc_id, text in enumerate(rows):
            toks = [w for w in text.split(" ") if w]
            lines = [
                " ".join(toks[i : i + 16])
                for i in range(0, len(toks), 16)
            ]
            kept = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            expect[doc_id] = (
                len(lines),
                len(kept),
                len(lines) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )

        got = {
            r.doc_id: (r.n_lines, r.n_kept, r.n_removed,
                       r.kept_fingerprint)
            for r in inventory["dedup_lines"]
            .spark(spark, str(out_dir))
            .collect()
        }
        assert got == expect, f"case {case}"


def test_quality_classifier_decision_is_logit_sign(spark, inventory):
    """Frozen-weight logistic classifier: keep must equal logit > 0
    on every row, and the frozen weights must actually split this
    corpus (both classes populated) — a degenerate
    all-keep/all-drop model would be a useless filter and a silent
    weight regression."""
    rows = inventory["text_quality_classifier"].spark(spark, SF).collect()
    assert all(r.keep == (r.logit > 0.0) for r in rows)
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_gapfill_carry_forward_semantics(spark, inventory):
    """At sf0.01 the sparse slice has real gaps: the spine is
    contiguous daily, counts are 0 on gap days, and filled_max on
    every row equals the most recent non-null day_max at or before
    it (null before the first observation)."""
    import datetime

    rows = sorted(
        inventory["events_daily_gapfill"]
        .spark(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r.day,
    )
    days = [datetime.date.fromisoformat(r.day) for r in rows]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    assert any(r.is_gap for r in rows) and any(not r.is_gap for r in rows)
    carried = None
    for r in rows:
        if r.is_gap:
            assert r.n_events == 0 and r.day_max is None
        else:
            assert r.n_events > 0
            carried = r.day_max
        assert r.filled_max == carried


def test_wordpiece_greedy_longest_match_and_classes(spark):
    """Handcrafted corpus: greedy takes the LONGEST match at each
    position (never a shorter prefix that would globally tokenize
    better), start and continuation are separate token spaces, and
    every encoding concatenates back to its word (conservation)."""
    from hands_on_trino_iceberg_superset_spark.operators import (
        wordpiece as WP,
    )

    docs = spark.createDataFrame(
        [(0, "abcd abcd abcd ab cd bc", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    words = WP.word_frequencies(docs)
    vocab = WP.select_vocab(words, top_k=40)
    vset = {(r.piece, r.cls) for r in vocab.collect()}
    # 'ab' exists as a start piece; 'cd' occurs both standalone
    # (start) and inside abcd (cont) — distinct entries
    assert ("ab", "start") in vset
    assert ("cd", "start") in vset and ("cd", "cont") in vset
    enc = {r.word: (r.encoded, r.n_pieces)
           for r in WP.encode_words(words, vocab).collect()}
    # greedy: abcd segments by its longest start piece, not char-wise
    assert enc["abcd"][0] in ("abcd", "abc ##d", "ab ##cd")
    assert enc["abcd"][1] <= 2 or enc["abcd"][0] == "abc ##d"
    for w, (e, n) in enc.items():
        joined = "".join(p[2:] if p.startswith("##") else p
                         for p in e.split(" "))
        assert joined == w
        assert n == len(e.split(" "))


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark, inventory):
    """The Poisson-bootstrap CI must bracket the point estimate with
    positive width (a degenerate CI means the weights collapsed),
    and two runs are bit-identical (no RNG state anywhere)."""
    q = inventory["eval_bootstrap_ci"].spark
    rows = {r.source: r for r in q(spark, SF).collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert r.ci_lo < r.ci_hi
        # 95% CI of a mean over 25 docs comfortably brackets the
        # point estimate on this corpus
        assert r.ci_lo <= r.point_mean <= r.ci_hi
    again = {r.source: r for r in q(spark, SF).collect()}
    assert all(
        (rows[s].ci_lo, rows[s].ci_hi) == (again[s].ci_lo, again[s].ci_hi)
        for s in rows
    )


def test_unigram_prune_bites_and_viterbi_resegments(spark):
    """The unigram train loop end-to-end on a planted corpus: seed
    usage is the 4-chunk counts, pruning keeps only the top-K multi
    pieces, and a word whose tail chunk was pruned re-segments via
    the Viterbi DP (fewest pieces, longest-first canonical walk) —
    falling back to singles only where no surviving piece matches."""
    from hands_on_trino_iceberg_superset_spark.operators import (
        unigram as UG,
    )

    # 'abcdefgh' chunks -> abcd, efgh; 'abcdxy' -> abcd, xy;
    # 'zzzz' -> zzzz. freqs make abcd(3) > zzzz(2) > efgh(1) = xy(1)
    docs = spark.createDataFrame(
        [(1, "abcdefgh abcdxy zzzz"), (2, "abcdefgh zzzz"),
         (3, "abcdxy")],  # extra abcdxy -> xy ties efgh, piece ASC
        ["doc_id", "text"],
    )
    words = UG.word_frequencies(docs)

    seed = {r.piece: r.usage
            for r in UG.seed_chunk_usage(words).collect()}
    assert seed == {"abcd": 4, "efgh": 2, "xy": 2, "zzzz": 2}

    # top_k=2 by (usage desc, piece asc): abcd(4), efgh(2) — 'xy'
    # loses the tie to 'efgh' and 'zzzz' ties too: order is
    # efgh < xy < zzzz, so efgh survives
    vocab = UG.prune_vocab(words, top_k=2)
    multis = {r.piece: r.rank for r in
              vocab.where(F.col("rank").isNotNull()).collect()}
    assert multis == {"abcd": 1, "efgh": 2}

    enc = {r.word: (r.n_pieces, r.encoded)
           for r in UG.viterbi_encode(words, vocab).collect()}
    assert enc["abcdefgh"] == (2, "abcd efgh")
    # tail chunk 'xy' pruned -> singles
    assert enc["abcdxy"] == (3, "abcd x y")
    # 'zzzz' pruned entirely -> four singles
    assert enc["zzzz"] == (4, "z z z z")

    # refit usage under the final vocab: zzzz/xy never used -> the
    # train output reflects the POST-prune counts
    ranked = {r.piece: (r.rank, r.usage)
              for r in UG.unigram_train(words, top_k=2).collect()}
    assert ranked == {"abcd": (1, 4), "efgh": (2, 2)}


def test_unigram_viterbi_beats_greedy(spark):
    """Min-piece Viterbi differs from WordPiece's greedy longest
    match where greedy is suboptimal: with vocab {ab, bcd, singles}
    on 'abcd', greedy longest-first takes 'ab' and is left with two
    singles (3 pieces); Viterbi finds 'a'+'bcd' (2 pieces) — the
    family-distinguishing behavior."""
    from hands_on_trino_iceberg_superset_spark.operators.unigram import (
        _segment,
    )

    vs = {"ab", "bcd", "a", "b", "c", "d"}
    assert _segment("abcd", vs, 4) == ["a", "bcd"]


def test_repetition_signals_match_python_reference(spark, tmp_path):
    """Property test: the sorted-run aggregate() fold and the
    2-gram dedup counts must equal an independent Counter-based
    reference on randomized word salads (skewed alphabet to force
    repeats), including the 1-token / empty-gram edge."""
    import random
    from collections import Counter

    from hands_on_trino_iceberg_superset_spark.operators.textstats import (
        repetition_signals,
    )

    rng = random.Random(20260816)
    alphabet = ["a", "b", "c", "d"]
    rows = ["x"]  # single token: 0 2-grams
    for _ in range(40):
        n = rng.randint(1, 60)
        rows.append(" ".join(rng.choice(alphabet) for _ in range(n)))

    expect = {}
    for doc_id, text in enumerate(rows):
        ws = text.split(" ")
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        expect[doc_id] = (
            len(ws),
            max(Counter(ws).values()),
            len(grams),
            len(grams) - len(set(grams)),
        )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.top_word_count, r.n_2grams,
                   r.n_dup_2grams)
        for r in repetition_signals(df).collect()
    }
    assert got == expect


def test_repetition_signals_null_and_empty_text(spark):
    """NULL text is the EMPTY document (all counts 0), never
    size(NULL) = -1 garbage that would skew pooled denominators;
    empty string keeps Spark's split('') == [''] one-token shape."""
    from hands_on_trino_iceberg_superset_spark.operators.textstats import (
        repetition_signals,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.top_word_count, r.n_2grams,
                      r.n_dup_2grams)
           for r in repetition_signals(df).collect()}
    assert got[1] == (0, 0, 0, 0)
    assert got[2] == (1, 1, 0, 0)
    assert got[3] == (2, 2, 1, 0)


def test_quality_and_lang_id_null_text(spark):
    """NULL text must be the empty document across the WHOLE
    textstats family (the shared _toks guard): quality_scores gives
    0 tokens / NULL ratios / fails the gate, lang_id guesses
    'unknown' — never size(NULL) = -1 garbage."""
    from hands_on_trino_iceberg_superset_spark.operators.textstats import (
        lang_id,
        quality_scores,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "the a of and to in " * 5)],
        "doc_id long, text string",
    )
    q = {r.doc_id: r for r in quality_scores(df).collect()}
    assert q[1].n_tokens == 0
    assert q[1].type_token_ratio is None
    assert q[1].passes_quality is False
    assert q[2].n_tokens > 0 and q[2].stopword_ratio > 0.9
    lg = {r.doc_id: r.guessed_lang for r in lang_id(df).collect()}
    assert lg[1] == "unknown"
    assert lg[2] == "en"
