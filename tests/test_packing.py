"""Sequence packing (operators/packing.py): the distributed prefix
sum must equal a naive driver cumsum on any partitioning, packed
sequences must equal a naive concatenate-and-slice, and the plan
must never collapse to a single-partition global window."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hands_on_trino_iceberg_superset_spark.operators.packing import (
    pack_sequences,
    pack_summary,
    prefix_sum,
)


def test_prefix_sum_matches_naive(spark):
    # unique order keys, scrambled insertion order: offsets among
    # TIED keys would be ambiguous by construction (doc ids are
    # unique in the real pipeline)
    rows = [((i * 7) % 500, (i * 13) % 9 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    got = {r.k: r.offset for r in prefix_sum(df, "k", "v").collect()}
    run, want = 0, {}
    for k, v in sorted(rows):
        want[k] = run
        run += v
    assert got == want


def test_prefix_sum_carries_extra_columns(spark):
    df = spark.createDataFrame(
        [(1, 2, "a"), (3, 4, "b"), (2, 1, "c")],
        "k long, v long, tag string",
    )
    out = {r.k: (r.offset, r.tag)
           for r in prefix_sum(df, "k", "v").collect()}
    assert out == {1: (0, "a"), 2: (2, "c"), 3: (3, "b")}


def test_pack_sequences_equals_naive_concat_slice(spark):
    docs = [
        (0, ["a", "b", "c"]),
        (1, []),                       # empty doc contributes nothing
        (2, ["d"]),
        (3, [f"t{i}" for i in range(9)]),
        (4, ["x", "y"]),
    ]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    L = 4
    out = {r.seq_id: r for r in pack_sequences(df, L).collect()}

    stream, owners = [], []
    for did, toks in sorted(docs):
        stream.extend(toks)
        owners.extend([did] * len(toks))
    want_chunks = {
        cid: stream[cid * L:(cid + 1) * L]
        for cid in range((len(stream) + L - 1) // L)
    }
    assert out.keys() == want_chunks.keys()
    for cid, toks in want_chunks.items():
        r = out[cid]
        assert r.tokens == toks
        assert r.n_tokens == len(toks)
        assert r.n_docs == len(set(owners[cid * L:(cid + 1) * L]))
    # all full except the last
    sizes = [out[c].n_tokens for c in sorted(out)]
    assert all(s == L for s in sizes[:-1])
    assert 1 <= sizes[-1] <= L

    summ = {r.seq_id: r for r in pack_summary(df, L).collect()}
    for cid, toks in want_chunks.items():
        assert summ[cid].first_token == toks[0]
        assert summ[cid].last_token == toks[-1]


def test_prefix_sum_avoids_single_partition_exchange(spark):
    """The scale claim: offsets never funnel the corpus through one
    task. The plan must not contain a SinglePartition exchange."""
    df = spark.createDataFrame(
        [(i, i % 5 + 1) for i in range(100)], "k long, v long"
    ).repartition(8)
    plan = prefix_sum(df, "k", "v")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_prefix_sum_string_order_keys(spark):
    """uuid-style string doc ids order lexicographically through the
    seeded-sample boundary fallback."""
    rows = [(f"doc-{i:04d}", i % 7 + 1) for i in range(200)]
    import random

    rnd = random.Random(3)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    df = spark.createDataFrame(
        shuffled, "k string, v long"
    ).repartition(9)
    got = {r.k: r.offset for r in prefix_sum(df, "k", "v").collect()}
    run, want = 0, {}
    for k, v in sorted(rows):
        want[k] = run
        run += v
    assert got == want


def test_pack_bpe_ids_end_to_end(spark):
    """The documented pipeline: BPE-train -> encode to ids -> pack
    into fixed sequences, with STRING doc ids end to end; decoding
    the packed stream reproduces the corpus's non-space text in doc
    order."""
    from hands_on_trino_iceberg_superset_spark.operators.bpe import (
        END,
        bpe_base_alphabet,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(
            ["low lower lowest", "new newer news", "low new lowest"]
        )],
        "doc_id string, text string",
    )
    merges = bpe_train(docs, n_merges=6)
    vocab = bpe_vocab(merges, bpe_base_alphabet(docs))
    ids = bpe_encode_ids(docs, merges, vocab)
    packed = sorted(
        pack_sequences(ids, 8, tokens_col="token_ids").collect(),
        key=lambda r: r.seq_id,
    )
    inv = {v: k for k, v in vocab.items()}
    stream = [t for r in packed for t in r.tokens]
    decoded = "".join(inv[t] for t in stream).replace(END, "")
    want = "".join(
        r.text.replace(" ", "")
        for r in docs.orderBy("doc_id").collect()
    )
    assert decoded == want
    assert all(r.n_tokens == 8 for r in packed[:-1])
