#!/usr/bin/env python
"""10x-scale benchmark beyond scan-aggregate shapes (PERF.md §scale).

``scale_demo.py`` shows fixed-overhead amortization for Q1/Q6 only;
this tool scales the HEADLINE families — star join, window, exact
dedup, MinHash-LSH dedup, IVF ANN — to a faithful 10x corpus of sf0.1
(~6M lineitem, 1.5M orders, 50k documents, 20k embeddings) and prints
a markdown table of wall time at 1x vs 10x with the work-growth
ratio. The point is to measure how each operator's cost actually
scales, not to extrapolate from scan shapes.

"Faithful" matters — naive row replication corrupts join and dedup
structure:

- lineitem/orders/customer replicate with DISJOINT KEY SPACES per
  replica (key + replica * offset), so every join stays 1:1 and the
  join graph is exactly 10 copies of the original.
- documents replicate with per-replica token salting (every token
  suffixed ``_r<i>``): shingle vocabularies are disjoint across
  replicas, so the near-dup pair structure replicates linearly
  instead of exploding quadratically the way identical copies would.
- embeddings replicate with an id offset plus a one-coordinate
  deterministic perturbation (breaks exact duplication, preserves
  norm scale).
- region/nation/supplier/part/events stay unscaled (dims stay dims).

Usage::

    python tools/scale_bench.py [--reps 10]
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/scale_bench"

#: key offsets larger than any sf0.1 key
ORDER_OFF = 10_000_000
CUST_OFF = 1_000_000
DOC_OFF = 1_000_000
VEC_OFF = 1_000_000

QUERIES = [
    "q3_shipping_priority",
    "window_top_orders_per_customer",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    # cross-batch Bloom dedup: corpus/batch split is doc_id-mod based,
    # so it replicates per-replica and dup structure grows linearly
    "dedup_incremental",
    "training_global_shuffle",
    "ann_cosine_topk_ivf",
    # PQ: rep 1 includes the one-off index build, rep 2 hits the
    # per-sf_dir cache, so best-of-2 reports the steady-state probe
    "ann_cosine_topk_pq",
    # BPE: token salting grows the distinct-word table 10x, so this
    # measures the one corpus-sized shuffle + the driver-routed loop
    "tokenizer_bpe_train",
    "tokenizer_bpe_encode",
    # quantized SemDeDup: cells sized via auto_centroids since r6
    # (the r5 row measured the fixed-8-cell failure mode at ~100x
    # pair work per 10x rows; cell count now grows with the corpus
    # and the max cell stays bounded — see the histogram gate test)
    "dedup_semantic_quantized",
    # packing: the distributed prefix sum (3 cached passes) + one
    # token-stream shuffle — should scale ~linearly in tokens
    "training_packed_sequences",
    # filtered IVF: label pushed into the cell-pruned scan; rep 1
    # builds the per-corpus index, rep 2 reports the probe path
    "ann_cosine_topk_filtered_ivf",
    # content-keyed split: map-only hash + one fingerprint window
    "training_split_leakproof",
    # bigram LM scoring: model shuffles are vocab-bounded (salted
    # tokens grow vocab 10x), scoring is join + per-doc aggregate
    "text_perplexity_buckets",
    # PSI drift: two vocab-bounded histograms + the sources-x-K grid
    "corpus_drift_report",
    # SCD-2: ONE shuffle on the dimension key for history build;
    # as-of attribution is an equi join + residual range predicate
    "scd2_customer_segment_history",
    "scd2_asof_revenue_by_segment",
    # prefix-sum batch planning over narrow (doc_id, n_tokens) rows
    "inference_batch_plan",
    # line dedup: explode -> md5(line) window -> doc regroup (noop
    # basis; count() under-timed this 30x before the basis fix)
    "dedup_lines",
    # streaming intake gate: map-only scoring + bounded aggregate
    "stream_document_quality",
    # MMR re-rank: pool search is anchors x corpus (both scale ->
    # 100x pair work at 10x); greedy stage is pool^2 per anchor
    "ann_mmr_diverse_topk",
    # Matryoshka audit: three brute-force top-k scans (full + two
    # prefixes), 100x pair work at 10x rows
    "embedding_matryoshka_recall",
    # address dedup: canonicalization in the scan projection + two
    # small aggregations — should scale sublinearly
    "dedup_url_canonical",
    # frozen-weight classifier: zero-shuffle pure map
    "text_quality_classifier",
    # containment: postings join, Sigma df^2 (salted tokens keep df
    # flat, so postings volume — and time — grow ~linearly)
    "dedup_containment",
    # IVF-routed hard negatives, PROBE PATH ONLY (pseudo-query,
    # special-cased in measure_one): anchors scale with the corpus,
    # so the exact all-pairs form measured 521x at 100x — this row
    # is the sublinear replacement (n_probe/n_centroids of the
    # corpus per anchor). The inventory query additionally pays the
    # exact side as its recall gate; production mining runs this.
    "hard_negatives_ivf_probe_only",
    # r8: capped containment on the boilerplate-heavy fixture; the
    # shared syndication header is a LITERAL (unsalted), so its df
    # grows with the corpus and the uncapped form goes quadratic —
    # the capped-vs-uncapped special case below measures both
    "dedup_containment_capped",
    # r8: k-NN label vote — queries scale with the corpus (%25), so
    # exact pair work grows 100x at 10x; the documented scale swap
    # is the IVF probe for the neighbor step
    "embedding_knn_label_vote",
    # r8: RFM — one event-sized groupBy, then user-grain windows
    # (events unscaled in this corpus; see engagement special case)
    "events_rfm_segments",
    # r8: tombstone-aware IVF probe, PROBE PATH ONLY (the inventory
    # query pays the exact recall gate; production reads run this)
    "ivf_delete_probe_only",
    # r8: per-doc novelty — one shingle-hash shuffle + doc aggregate;
    # salted replicas keep shingle vocab disjoint so the first-owner
    # structure replicates linearly
    "text_shingle_novelty",
    # r10: substring dedup rewrite — gram-hash first-occurrence
    # window + per-doc coverage window; salted replicas keep the
    # 20-gram vocab disjoint, so postings and duplicate structure
    # replicate linearly (never pairwise, plan-gated)
    "dedup_substring",
    # r10: perceptual dHash dedup — Arrow hash kernel (one pass) +
    # pigeonhole band equi-join; copies derive per-replica, so
    # candidate structure replicates linearly unless hash buckets
    # saturate (56-bit space; watch the ratio)
    "multimodal_perceptual_dedup",
    # r10: unigram tokenizer — salted tokens grow the word table
    # 10x; train = one word-frequency shuffle + vocab-sized
    # chunk-usage/prune/refit, encode = vocab-sized Viterbi pass
    "tokenizer_unigram_train",
    "tokenizer_unigram_encode",
    # r10: benchmark decontamination — training postings semi-joined
    # against the broadcast benchmark gram set + per-doc coverage;
    # both sides replicate under salting, leak structure linear
    "text_decontaminate_rewrite",
    # manual-only special cases (nonstandard output shapes, run via
    # --one like skew_salted_wallclock / warehouse_s3_multipart):
    #   containment_capped_vs_uncapped — Sigma min(df,K)^2 vs
    #     Sigma df^2 on the same boilerplate-heavy corpus
    #   engagement_events_scaling — DAU/WAU/MAU with events
    #     replicated 10x (the standing corpus keeps events dim-sized)
    #   asof_events_scaling — purchase->latest-prior-click as-of join
    #     with events replicated 10x (r13: the operator is now
    #     SQL-reachable via TABLE(asof_join(...)); one union + one
    #     window shuffle, no join — should scale ~linearly)
    #   containment_seam_overhead — TABLE(containment_pairs(...))
    #     vs the direct operator at 1x/10x: the SQL seam's cost
    #     (parse + named args + temp view + plan rewrite) must stay
    #     FLAT while the postings join scales (r13 VERDICT item 5:
    #     sql_dedup_containment's +2.5s over the Python path was
    #     claimed constant, not scale-bearing — this measures it)
]

LINKED = ["region", "nation", "supplier", "part", "events"]


def _rep_col(reps: int):
    return F.explode(F.array(*[F.lit(i) for i in range(reps)])).alias("rep")


def build(spark, reps: int) -> str:
    dst = os.path.join(ROOT, f"x{reps}")
    marker = os.path.join(dst, "_BUILT")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    for t in LINKED:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            os.link(os.path.join(SRC, f"{t}.parquet"), out)

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    li.select("*", _rep_col(reps)).select(
        (F.col("l_orderkey") + F.col("rep") * ORDER_OFF).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))

    od = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    od.select("*", _rep_col(reps)).select(
        (F.col("o_orderkey") + F.col("rep") * ORDER_OFF).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("rep") * CUST_OFF).alias("o_custkey"),
        *[c for c in od.columns if c not in ("o_orderkey", "o_custkey")],
    ).write.mode("overwrite").parquet(os.path.join(dst, "orders.parquet"))

    cu = spark.read.parquet(os.path.join(SRC, "customer.parquet"))
    cu.select("*", _rep_col(reps)).select(
        (F.col("c_custkey") + F.col("rep") * CUST_OFF).alias("c_custkey"),
        *[c for c in cu.columns if c != "c_custkey"],
    ).write.mode("overwrite").parquet(os.path.join(dst, "customer.parquet"))

    dc = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    dc.select("*", _rep_col(reps)).select(
        (F.col("doc_id") + F.col("rep") * DOC_OFF).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_r"), F.col("rep").cast("string")),
            ),
            " ",
        ).alias("text"),
        *[c for c in dc.columns if c not in ("doc_id", "text")],
    ).write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))

    em = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    dim = 64
    em.select("*", _rep_col(reps)).select(
        (F.col("vec_id") + F.col("rep") * VEC_OFF).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                + F.when(
                    i == F.pmod(F.col("vec_id") + F.col("rep"), F.lit(dim)),
                    F.col("rep") * F.lit(0.01),
                ).otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
        *[c for c in em.columns if c not in ("vec_id", "embedding")],
    ).write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))

    with open(marker, "w") as fh:
        fh.write("ok")
    return dst


def measure_one(name: str, dirs: list[str]) -> None:
    """Subprocess entry: measure ONE query against each dir in a
    fresh session and print 'rows,best' lines. Isolation matters:
    measured in-sequence within one session, earlier queries'
    lingering state (checkpoint blocks, broadcasts, JVM heap shape)
    taxed later shuffle-heavy queries up to 3x — per-process
    measurement is the steady-state number a dedicated job would
    see."""
    spark = get_spark("scale-bench-one")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10).mapInPandas(lambda it: it, "id long").count()
    if name == "hard_negatives_ivf_probe_only":
        _measure_hard_negative_probe(spark, dirs)
        return
    if name == "skew_salted_wallclock":
        _measure_skew_salted_wallclock(spark, dirs)
        return
    if name == "warehouse_s3_multipart":
        _measure_warehouse_s3_multipart(spark, dirs)
        return
    if name == "fuzzy_names_blocked_scaling":
        _measure_fuzzy_names_blocked_scaling(spark, dirs)
        return
    if name == "ivf_delete_probe_only":
        _measure_ivf_delete_probe(spark, dirs)
        return
    if name == "containment_capped_vs_uncapped":
        _measure_containment_cap(spark, dirs)
        return
    if name == "perceptual_dedup_decorrelated":
        _measure_perceptual_decorrelated(spark)
        return
    if name == "engagement_events_scaling":
        _measure_engagement_scaling(spark, dirs)
        return
    if name == "asof_events_scaling":
        _measure_asof_events_scaling(spark, dirs)
        return
    if name == "containment_seam_overhead":
        _measure_containment_seam_overhead(spark, dirs)
        return
    if name == "stream_seam_scaling":
        _measure_stream_seam_scaling(spark, dirs)
        return
    spec = load_all()[name]
    for d in dirs:
        best, rows = None, None
        for _ in range(2):
            t0 = time.time()
            df = spec.spark(spark, d)
            # noop sink, NOT count(): count() lets Catalyst eliminate
            # left joins against unique-keyed aggregates and prune
            # expensive final columns (measured: dedup_lines "ran"
            # 500k docs in 0.4 s because only the scan survived), so
            # it under-times any query whose costly columns aren't
            # needed for the row count. The noop write evaluates
            # every column of every row.
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = spec.spark(spark, d).count()
        print(f"RESULT {rows},{best:.4f}", flush=True)


def _measure_hard_negative_probe(spark, dirs: list[str]) -> None:
    """The ann_hard_negatives_ivf PROBE path in isolation (the
    inventory query also recomputes the exact all-pairs form as its
    recall gate, which is the measured 521x-at-100x quadratic).
    Index build is the amortized ingest product — untimed, like the
    bench prewarm; the timed part is anchors (every 100th vector,
    scaling WITH the corpus) probing the celled store with the
    same-label drop in the probe join."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import (
        similarity as S,
    )
    from hands_on_trino_iceberg_superset_spark.queries.similarity import (
        _ivf_index,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        idx = _ivf_index(spark, d)  # per-sf_dir artifact, cached
        anchors = emb.where(F.col("vec_id") % 100 == 0)
        best = None
        for _ in range(2):
            t0 = time.time()
            probe = S.ivf_probe(anchors, idx, k=5, n_probe=8,
                                exclude_cols=["label"])
            probe.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = S.ivf_probe(anchors, idx, k=5, n_probe=8,
                           exclude_cols=["label"]).count()
        print(f"RESULT {rows},{best:.4f}", flush=True)


def _measure_ivf_delete_probe(spark, dirs: list[str]) -> None:
    """The ann_ivf_delete PROBE path in isolation: tombstone-aware
    partition-pruned read (anti-join inside the cell scan). Index
    build + tombstoning are the amortized ingest products — untimed,
    like every other index artifact; queries scale with the corpus
    (every 100th live vector) so the row measures probe cost under
    merge-on-read deletes."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import (
        similarity as S,
    )
    from hands_on_trino_iceberg_superset_spark.queries.similarity import (
        _ivf_mor_index,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        idx = _ivf_mor_index(spark, d)
        queries = emb.where(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") % 7 != 0)
        )
        best = None
        for _ in range(2):
            t0 = time.time()
            S.ivf_probe(queries, idx, k=10, n_probe=8).write.format(
                "noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = S.ivf_probe(queries, idx, k=10, n_probe=8).count()
        print(f"RESULT {rows},{best:.4f}", flush=True)


def _measure_containment_cap(spark, dirs: list[str]) -> None:
    """Capped vs uncapped containment on the SAME boilerplate-heavy
    fixture (dedup_containment_capped's derived corpus). The shared
    16-word syndication header is an UNSALTED literal, so its
    shingles' df grows with the corpus: uncapped postings volume is
    Sigma df^2 (quadratic in wrappers), capped is Sigma min(df,10)^2
    (linear). Prints two RESULT lines per dir: capped then
    uncapped."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import (
        dedup as D,
    )
    from hands_on_trino_iceberg_superset_spark.queries.dedup import (
        _BOILER_POST,
        _BOILER_PRE,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    from hands_on_trino_iceberg_superset_spark.queries.dedup import (
        _wrap_docs,
    )

    for d in dirs:
        docs = load_table(spark, d, "documents").select("doc_id", "text")
        corpus = docs.unionAll(
            _wrap_docs(docs, _BOILER_PRE, _BOILER_POST))
        for max_df in (10, None):
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                out = D.containment_pairs_inverted(
                    corpus, threshold=0.9, n=8, max_df=max_df)
                out.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rows = D.containment_pairs_inverted(
                corpus, threshold=0.9, n=8, max_df=max_df).count()
            print(f"RESULT {rows},{best:.4f}", flush=True)


def _measure_engagement_scaling(spark, dirs: list[str]) -> None:
    """DAU/WAU/MAU trailing-window linearization with events
    replicated 10x (disjoint user ids per replica — engagement
    structure replicates, the day spine stays fixed). The standing
    scale corpus keeps events dim-sized, so this family needs its
    own fixture. Prints 1x then 10x RESULT lines for dirs[0]."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.queries.events import (
        _trailing_active_users,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    ev1 = load_table(spark, dirs[0], "events").select("user_id", "ts")
    ev10 = ev1.select("*", _rep_col(10)).select(
        (F.col("user_id") + F.col("rep") * 10_000_000)
        .alias("user_id"), "ts",
    )
    for ev in (ev1, ev10):
        user_days = ev.select(
            "user_id", F.col("ts").cast("date").alias("d")
        ).distinct()
        spine = user_days.select("d").distinct()

        def run():
            dau = user_days.groupBy("d").agg(
                F.count(F.lit(1)).alias("dau"))
            wau = _trailing_active_users(user_days, spine, 7, "wau")
            mau = _trailing_active_users(user_days, spine, 28, "mau")
            return dau.join(wau, "d").join(mau, "d")

        best = None
        for _ in range(2):
            t0 = time.time()
            run().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = run().count()
        print(f"RESULT {rows},{best:.4f}", flush=True)


def _measure_asof_events_scaling(spark, dirs: list[str]) -> None:
    """The as-of join (purchase -> latest at-or-before click per
    user) with events replicated 10x — disjoint user AND event ids
    per replica, so per-user event streams replicate and the pairing
    structure grows linearly. The standing scale corpus keeps events
    dim-sized, so this lane builds its own 10x frame, like
    engagement_events_scaling. The operator is one union + one
    last-value window shuffle with NO join node (plan-gated through
    the r13 SQL seam); expected ~linear wall-clock. Prints 1x then
    10x RESULT lines for dirs[0]."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators.asof import (
        asof_join,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    ev1 = load_table(spark, dirs[0], "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    def reps(n: int):
        rep = F.col("rep").cast("long")
        return ev1.select("*", _rep_col(n)).select(
            (F.col("user_id") + rep * 10_000_000).alias("user_id"),
            "ts",
            (F.col("event_id") + rep * 100_000_000).alias("event_id"),
            "event_type",
        )

    for label, ev in (("1x", ev1), ("10x", reps(10)),
                      ("100x", reps(100))):
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("ats"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_id").alias("_evt_tb"),
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("ats"),
            F.col("event_id").alias("last_click_id"),
            F.col("event_id").alias("_evt_tb"),
        )

        def run():
            return asof_join(
                purchases, clicks, on="user_id", order_col="ats",
                carry_cols=["last_click_id"], tiebreak_col="_evt_tb",
            )

        best = None
        for _ in range(2):
            t0 = time.time()
            run().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = run().count()
        print(f"RESULT {label} {rows},{best:.4f}", flush=True)


def _measure_containment_seam_overhead(spark, dirs: list[str]) -> None:
    """The dedup SQL seam's overhead, isolated (r13 VERDICT item 5):
    run the capped containment workhorse BOTH ways on the same
    corpus at 1x and 10x — the direct operator call
    (operators/dedup.containment_pairs_inverted) and the identical
    call through Engine.sql's TABLE(containment_pairs(...)) seam.
    The physical plan is plan-gated identical, so the seam's cost is
    pure control plane: regex resolution, named-arg parsing, temp
    view registration, statement rewrite. That cost must stay FLAT
    (constant seconds) while the postings join grows with the
    corpus; a seam overhead that scaled with the data would mean
    the seam re-materializes something corpus-sized. Prints one
    RESULT line per (scale, variant)."""
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.operators import (
        dedup as D,
    )
    from hands_on_trino_iceberg_superset_spark.sources import (
        load_table,
    )

    eng = Engine(spark)
    for label, d in zip(("1x", "10x"), dirs):
        docs = load_table(spark, d, "documents")
        docs.createOrReplaceTempView("seam_docs_v")

        def direct():
            return D.containment_pairs_inverted(
                docs, threshold=0.9, n=8, max_df=10
            )

        def seam():
            return eng.sql(
                "SELECT * FROM TABLE(containment_pairs("
                "docs => 'seam_docs_v', threshold => 0.9, "
                "n => 8, max_df => 10))"
            )

        for variant, fn in (("direct", direct), ("seam", seam)):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rows = fn().count()
            print(f"RESULT {label} {variant} {rows},{best:.4f}",
                  flush=True)


def _measure_stream_seam_scaling(spark, dirs: list[str]) -> None:
    """The streaming seam's wall-clock decade, both paths: events
    replicated 1x/10x (disjoint user/event ids, same shape as the
    as-of lane) and written as BARE parquet tables, then
    TABLE(stream_window(...)) driven through Engine.sql — the
    'zero_copy' variant streams the table's own files
    (streamable_parquet_root), the 'snapshot' variant forces the
    fallback with a column-reordering projection view over the SAME
    data, so the difference between the variants is exactly the
    corpus rewrite the zero-copy path deletes. Expected: both scale
    ~linearly in events (one drain pass through the windowed
    aggregation's watermark-bounded state), with 'snapshot' paying
    an extra write+read of the corpus on top. Prints one RESULT
    line per (scale, variant); timing is the full eng.sql call —
    the availableNow drain happens inside it."""
    from hands_on_trino_iceberg_superset_spark.engine import Engine
    from hands_on_trino_iceberg_superset_spark.sources import (
        load_table,
    )

    ev1 = load_table(spark, dirs[0], "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    eng = Engine(spark)
    for label, n in (("1x", 1), ("10x", 10)):
        rep = F.col("rep").cast("long")
        ev = ev1.select("*", _rep_col(n)).select(
            (F.col("user_id") + rep * 10_000_000).alias("user_id"),
            "ts",
            (F.col("event_id") + rep * 100_000_000).alias("event_id"),
            "event_type",
            "value",
        )
        path = f"{ROOT}/stream_ev_{label}"
        ev.write.mode("overwrite").parquet(path)
        bare = f"sb_stream_ev_{label}"
        spark.read.parquet(path).createOrReplaceTempView(bare)
        # column reorder = derived plan -> snapshot fallback
        spark.sql(
            f"SELECT ts, event_type, value, user_id, event_id "
            f"FROM {bare}"
        ).createOrReplaceTempView(f"{bare}_snap")
        variants = [
            ("window zero_copy",
             f"SELECT * FROM TABLE(stream_window("
             f"events => '{bare}', window => '6 hours'))"),
            ("window snapshot",
             f"SELECT * FROM TABLE(stream_window("
             f"events => '{bare}_snap', window => '6 hours'))"),
            # sessionize: the decade where STATE grows with the
            # data (replicas carry disjoint user ids, so sessions
            # replicate linearly) — the watermark-bounded
            # session_window claim, measured
            ("sessionize zero_copy",
             f"SELECT * FROM TABLE(stream_sessionize("
             f"events => '{bare}', gap => '30 minutes'))"),
        ]
        for variant, stmt in variants:
            def run():
                return eng.sql(stmt)

            best = None
            for _ in range(2):
                t0 = time.time()
                out = run()
                out.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rows = out.count()
            print(f"RESULT {label} {variant} {rows},{best:.4f}",
                  flush=True)


def _measure_skew_salted_wallclock(spark, dirs: list[str]) -> None:
    """Does salting actually BEAT the plain shuffled join under the
    planted 70%-hot-key skew (join_skew_salted's fixture), not just
    hash-equal it? Three variants per dir, broadcast disabled for
    all (salting targets the broadcast-ineligible case — a tiny dim
    would otherwise broadcast and hide the skew entirely):

    - plain SMJ with AQE skew-join OFF — the unmitigated wedge;
    - plain SMJ with AQE skew-join ON — Spark's runtime mitigation;
    - salted_join (8 content-hash salts) — the explicit strategy.

    Prints one labeled line per (dir, variant)."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.operators import (
        scale as SC,
    )
    from hands_on_trino_iceberg_superset_spark.sources import load_table

    def fixture(d: str):
        li = load_table(spark, d, "lineitem").select(
            F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
            .otherwise(F.col("l_suppkey"))
            .cast("long")
            .alias("k"),
            "l_quantity",
        )
        sup = load_table(spark, d, "supplier").select(
            F.col("s_suppkey").cast("long").alias("k"),
            F.col("s_nationkey").cast("long").alias("nation_key"),
        )
        extra = spark.range(1).select(
            F.lit(0).cast("long").alias("k"),
            F.lit(-1).cast("long").alias("nation_key"),
        )
        return li, sup.unionByName(extra)

    def agg(joined):
        return joined.groupBy("nation_key").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("total_qty"),
        )

    conf = spark.conf
    prior_bcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prior_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for d in dirs:
            li, dim = fixture(d)
            variants = [
                ("plain_smj_noaqe", "false",
                 lambda: li.join(dim, "k")),
                ("plain_smj_aqe_skew", "true",
                 lambda: li.join(dim, "k")),
                ("salted_8", "true",
                 lambda: SC.salted_join(li, dim, "k", "k", n_salts=8)),
            ]
            for label, skew_flag, make in variants:
                conf.set("spark.sql.adaptive.skewJoin.enabled",
                         skew_flag)
                best = None
                for _ in range(2):
                    t0 = time.time()
                    agg(make()).write.format("noop") \
                        .mode("overwrite").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                print(f"VARIANT {d} {label} {best:.4f}", flush=True)
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prior_bcast)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prior_skew)


def _measure_warehouse_s3_multipart(spark, dirs: list[str]) -> None:
    """warehouse_over_s3's wire stack at scale: write the dir's
    orders through the signing s3a filesystem with a 4 MiB part size
    (sf0.1 orders ≈ 9 MiB parquet -> multipart; 10x crosses many
    more part boundaries), then read it back and aggregate through
    ranged GETs. Times one write+read round trip per dir."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.sources import load_table
    from hands_on_trino_iceberg_superset_spark.sources.object_store import (
        LITE_IMPL,
        apply_object_store_profile,
        ensure_lite_fs,
        s3a_profile,
    )
    from hands_on_trino_iceberg_superset_spark.sources.s3_server import (
        MiniS3Server,
    )

    ensure_lite_fs(spark)
    for d in dirs:
        srv = MiniS3Server(access_key="admin", secret_key="admin12345")
        srv.start()
        srv.create_bucket("wh")
        profile = s3a_profile(srv.url, "admin", "admin12345",
                              impl=LITE_IMPL)
        profile["spark.hadoop.fs.s3a.lite.part.size"] = str(4 << 20)
        apply_object_store_profile(spark, profile)
        try:
            orders = load_table(spark, d, "orders")
            best = None
            for _ in range(2):
                t0 = time.time()
                orders.write.mode("overwrite").parquet("s3a://wh/o")
                n = (
                    spark.read.parquet("s3a://wh/o")
                    .groupBy("o_orderpriority")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .count()
                )
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"RESULT {n},{best:.4f}", flush=True)
        finally:
            srv.stop()


def _measure_fuzzy_names_blocked_scaling(spark, dirs: list[str]) -> None:
    """dedup_fuzzy_names reads `part`, which the scaled corpus keeps
    as an unscaled dim — so this pseudo-query scales part itself 10x
    in BOTH regimes the blocked-Levenshtein risk analysis needs:

    - ``salted``: the block token (first name word) is suffixed per
      replica — block spaces disjoint, Σ|block|² grows LINEARLY (the
      faithful more-entities corpus);
    - ``shared``: names get a per-replica tail suffix but keep the
      block token — every block grows 10x, Σ|block|² grows ~100x
      (the adversarial regime where a single block key stops being
      enough and composed keys — token+length band+soundex — are
      required).

    Prints wall time AND Σ|block|² per (dir, regime); dirs[0] is the
    1x base (its part is used at every scale)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from hands_on_trino_iceberg_superset_spark.sources import load_table

    def scaled_part(base, reps: int, regime: str):
        if reps == 1:
            return base.select(
                "p_partkey",
                F.col("p_name").alias("name"),
                F.split(F.col("p_name"), " ").getItem(0).alias("block"),
            )
        rep = F.explode(
            F.array(*[F.lit(i) for i in range(reps)])).alias("rep")
        out = base.select("*", rep).select(
            (F.col("p_partkey") + F.col("rep") * 10_000_000)
            .alias("p_partkey"),
            F.col("rep"),
            F.concat(F.col("p_name"), F.lit(" r"),
                     F.col("rep").cast("string")).alias("name"),
        )
        first = F.split(F.col("name"), " ").getItem(0)
        if regime == "salted":
            block = F.concat(first, F.lit("_r"),
                             F.col("rep").cast("string"))
        else:
            block = first
        return out.select("p_partkey", "name", block.alias("block"))

    def pipeline(part):
        variants = part.where((F.col("p_partkey") % 50) == 0).select(
            (F.col("p_partkey") + 100_000_000).alias("cand_key"),
            F.expr("concat(substring(name, 1, length(name) - 2), "
                   "substring(name, length(name)))").alias("cand_name"),
            "block",
        )
        scored = (
            part.join(F.broadcast(variants), "block")
            .select("cand_key", "cand_name", "p_partkey", "name",
                    F.levenshtein("name", "cand_name").alias("dist"))
            .where(F.col("dist") <= 2)
        )
        w = Window.partitionBy("cand_key").orderBy("dist", "p_partkey")
        return scored.withColumn(
            "rn", F.row_number().over(w)).where(F.col("rn") == 1)

    base = load_table(spark, dirs[0], "part")
    for reps, regime in ((1, "base"), (10, "salted"), (10, "shared")):
        part = scaled_part(base, reps, regime).cache()
        part.count()
        blocks = part.groupBy("block").count()
        pair_work = blocks.agg(
            F.sum(F.col("count") * F.col("count")).alias("p")
        ).collect()[0].p
        best = None
        for _ in range(2):
            t0 = time.time()
            pipeline(part).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = pipeline(part).count()
        part.unpersist()
        print(f"VARIANT {reps}x_{regime} rows={rows} "
              f"sum_block_sq={pair_work} {best:.4f}", flush=True)


def _measure_perceptual_decorrelated(spark) -> None:
    """Perceptual-dedup second scale decade with DECORRELATED
    synthetic pixels (VERDICT r10 item 7): the in-inventory
    multimodal_perceptual_dedup corpus derives pixels from small-
    vocab document text, so 56-bit dHash neighborhoods are corpus-
    correlated and the planted 10x row's PAIR count grows
    superlinearly (a stated fixture artifact). Here every document's
    payload is 512 bytes of sha2 output — hash-decorrelated across
    documents — with every 10th document re-published one byte
    perturbed, so the true near-dup structure is exactly linear and
    the banded join's cost claim (candidates, not n^2) is measurable
    across two decades. Prints, per scale: RESULT rows,best plus an
    INFO line with the candidate-pair count (the pigeonhole
    equi-join's output BEFORE the exact bit_count verify — the same
    join predicate as operators/dedup.hamming_pairs with the final
    hamming filter removed)."""
    from hands_on_trino_iceberg_superset_spark.operators import (
        dedup as D,
        multimodal as M,
    )

    def corpus(n: int):
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws("", *[
                F.sha2(F.concat(F.col("id").cast("string"),
                                F.lit(f":{k}")), 256)
                for k in range(8)
            ]).alias("text"),
        )
        copies = base.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(
                F.substring("text", 1, 105), F.lit("q"),
                F.substring(F.col("text"), 107, 512),
            ).alias("text"),
        )
        return base.unionAll(copies)

    def candidates(sigs) -> int:
        # hamming_pairs' candidate stage verbatim (4 x 14-bit chunks,
        # first-agreeing-chunk uniqueness) WITHOUT the final
        # bit_count filter — kept here, in the measurement harness,
        # so the operator's signature stays untouched
        n_chunks, width = 4, 14
        sh = sigs.select(
            F.col("media_id").alias("id"),
            F.col("phash").alias("sig"),
        ).localCheckpoint(eager=True)
        structs = [
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftrightunsigned(F.col("sig"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
        chunks = sh.select(
            "id", "sig", F.explode(F.array(*structs)).alias("ch")
        ).select("id", "sig", "ch.chunk_idx", "ch.chunk_val")
        a, b = chunks.alias("a"), chunks.alias("b")
        xor = F.col("a.sig").bitwiseXOR(F.col("b.sig"))
        mask = F.lit((1 << width) - 1)
        first = F.lit(True)
        for j in range(n_chunks - 1):
            first = first & (
                (F.col("a.chunk_idx") <= j)
                | (F.shiftrightunsigned(xor, j * width)
                   .bitwiseAND(mask) != 0)
            )
        return a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id"))
            & first,
        ).count()

    for n in (5_000, 50_000, 500_000):
        docs = corpus(n)
        media = M.attach_fake_media(docs)

        def run():
            return D.hamming_pairs(
                M.perceptual_hash(media), max_hamming=3, bits=56,
                id_col="media_id", sig_col="phash",
            ).count()

        rows = run()
        best = min(_timed(run) for _ in range(2))
        cand = candidates(M.perceptual_hash(media))
        print(f"RESULT {rows},{best:.2f}")
        print(f"INFO n={n} pairs={rows} candidates={cand}")


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> int:
    import subprocess

    reps = 10
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        measure_one(sys.argv[2], sys.argv[3:])
        return 0

    spark = get_spark("scale-bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10).mapInPandas(lambda it: it, "id long").count()
    t0 = time.time()
    dst = build(spark, reps)
    print(f"corpus at {dst} (build {time.time() - t0:.0f}s)", file=sys.stderr)

    print("| query | rows_1x | s_1x | rows_10x | s_10x | time ratio |")
    print("|---|---|---|---|---|---|")
    for name in QUERIES:
        proc = subprocess.run(
            [sys.executable, __file__, "--one", name, SRC, dst],
            capture_output=True, text=True, timeout=1200,
        )
        results = [
            ln.split(" ", 1)[1]
            for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT ")
        ]
        if len(results) != 2:
            print(f"| {name} | ERROR | | | | |", flush=True)
            print(proc.stderr[-500:], file=sys.stderr)
            continue
        out = {}
        for label, res in zip(("1x", "10x"), results):
            rows_s, best_s = res.split(",")
            out[label] = (int(rows_s), float(best_s))
        r1, s1 = out["1x"]
        r10, s10 = out["10x"]
        print(
            f"| {name} | {r1:,} | {s1:.2f} | {r10:,} | {s10:.2f} "
            f"| {s10 / s1:.1f}x |",
            flush=True,
        )

    # Iceberg metadata-pruned point lookup: bucket[16] hidden
    # partitioning makes an equality lookup read ~1/16 of the files
    # REGARDLESS of table size — the flat-at-scale shape (like the
    # IVF probe) that motivates spec-metadata planning at 100 TB.
    from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
        IcebergTable,
    )

    out = {}
    for label, d in (("1x", SRC), ("10x", dst)):
        ipath = os.path.join(ROOT, f"ice_{label}", "orders")
        if not os.path.exists(os.path.join(ipath, "metadata")):
            orders = spark.read.parquet(os.path.join(d, "orders.parquet"))
            IcebergTable.create(
                spark, ipath,
                orders.repartition(16, "o_orderkey"),
                partition_by="bucket(16, o_orderkey)",
            )
        t = IcebergTable.load(spark, ipath)
        best, rows = None, None
        for _ in range(2):
            t0 = time.time()
            rows = t.read(filter={"o_orderkey": [4242, 7777]}).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        plan = t.plan_scan(filter={"o_orderkey": [4242, 7777]})
        out[label] = (rows, best, len(plan.files), plan.total_files)
    r1, s1, f1, tot1 = out["1x"]
    r10, s10, f10, tot10 = out["10x"]
    print(
        f"| iceberg_bucket_lookup ({f1}/{tot1} vs {f10}/{tot10} files) "
        f"| {r1:,} | {s1:.2f} | {r10:,} | {s10:.2f} "
        f"| {s10 / s1:.1f}x |",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
