"""Gates for the similarity-search operators: exactness of the
brute-force path, recall of the LSH path."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.operators import similarity as S
from hands_on_trino_iceberg_superset_spark.sources import load_table


def test_cosine_expression_exact(spark) -> None:
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 1.0]), (3, [0.0, 2.0])],
        ["vec_id", "embedding"],
    )
    out = S.cosine_topk(df, df.where(F.col("vec_id") == 1), k=2).collect()
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].neighbor_id == 2
    assert abs(by_rank[1].cos_sim - round(1 / math.sqrt(2), 6)) < 1e-9
    assert by_rank[2].neighbor_id == 3
    assert by_rank[2].cos_sim == 0.0


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir: str) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    exact = {(r.query_id, r.neighbor_id) for r in S.cosine_topk(emb, q, k=10).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.hyperplane_lsh_topk(emb, q, dim=64, k=10).collect()
    }
    # unclustered synthetic corpus: wide probing, recall gate at 0.5
    assert len(exact & approx) / len(exact) >= 0.5


def test_ivf_topk_recall_and_exact_rerank(spark, sf_dir: str) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.orderBy("vec_id").limit(20)
    exact_rows = S.cosine_topk(emb, q, k=10).collect()
    exact_sets: dict[int, set[int]] = {}
    exact_sims = {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        exact_sims[(r.query_id, r.neighbor_id)] = r.cos_sim
    ivf_rows = S.ivf_topk(emb, q, k=10, n_centroids=16, n_probe=8).collect()
    ivf_sets: dict[int, set[int]] = {}
    for r in ivf_rows:
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        # candidate re-rank is exact cosine: any overlap with the
        # brute-force result must agree on the score bit-for-bit
        if (r.query_id, r.neighbor_id) in exact_sims:
            assert r.cos_sim == exact_sims[(r.query_id, r.neighbor_id)]
    # every query returns a full page
    assert all(len(s) == 10 for s in ivf_sets.values())
    # unclustered synthetic corpus, probing half the cells: mean
    # recall stays well above the 50%-scan floor
    recalls = [
        len(ivf_sets.get(qid, set()) & n) / len(n)
        for qid, n in exact_sets.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.6


def test_neardup_pairs_symmetric_threshold(spark) -> None:
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [-1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    pairs = {(r.id_a, r.id_b): r.cos_sim for r in S.cosine_neardup_pairs(df, 0.9).collect()}
    assert set(pairs) == {(1, 2)}
    assert all(v >= 0.9 for v in pairs.values())


def test_cosine_neardup_lsh_subset_and_recall(spark, sf_dir: str) -> None:
    """LSH-prefiltered near-dup pairs: exact-verify step means no
    false positives; recall vs the exact quadratic set stays high
    (wide 2-bit probing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in S.cosine_neardup_pairs(emb, 0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in S.cosine_neardup_pairs_lsh(
            emb, 0.4, dim=64, n_planes=24, n_chunks=12
        ).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.9


def test_arrow_signature_matches_expression_form(spark, sf_dir: str) -> None:
    """The one-GEMM Arrow signature (high-dim path) must produce the
    same sign pattern as the expression-tree form on the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    expr_sigs = {
        r.vec_id: r.sig
        for r in emb.select(
            "vec_id",
            S.hyperplane_signature(F.col("embedding"), 64, 16).alias("sig"),
        ).collect()
    }
    arrow_sigs = {
        r.vec_id: r.sig
        for r in S.with_hyperplane_signature_arrow(
            emb, dim=64, n_planes=16
        ).select("vec_id", "sig").collect()
    }
    assert arrow_sigs == expr_sigs


def _clustered_fixture(spark, n_clusters=25, dups_per=3, n_background=400,
                       dim=64, seed=7):
    """Planted gap-regime corpus: ``n_clusters`` groups of near-
    identical vectors (pairwise cosine >= ~0.98) over a background of
    independent random vectors (pairwise cosine ~ N(0, 1/sqrt(dim)),
    i.e. |cos| < ~0.5) — the regime hyperplane LSH is built for."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(dups_per):
            v = base + 0.02 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(n_background):
        v = rng.standard_normal(dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_prunes_in_gap_regime(spark) -> None:
    """On a clustered corpus the bucket join must generate FAR fewer
    candidates than n^2/2 while still recalling >= 0.95 of the true
    pairs — the pruning claim, demonstrated rather than asserted."""
    df = _clustered_fixture(spark)
    n = df.count()
    all_pairs = n * (n - 1) / 2
    candidates = S.lsh_candidate_pairs(df, dim=64, n_planes=30, n_chunks=5)
    n_cand = candidates.count()
    assert n_cand < 0.15 * all_pairs, (n_cand, all_pairs)
    exact = {(r.id_a, r.id_b)
             for r in S.cosine_neardup_pairs(df, threshold=0.9).collect()}
    got = {(r.id_a, r.id_b)
           for r in S.cosine_neardup_pairs_lsh(
               df, threshold=0.9, dim=64, n_planes=30, n_chunks=5
           ).collect()}
    assert got <= exact  # verify step: no false positives
    assert len(exact) >= 25  # the planted pairs are actually there
    assert len(got & exact) / len(exact) >= 0.95


def test_lsh_selectivity_fallback_routes_by_regime(spark, sf_dir: str) -> None:
    """The candidate estimate must (a) predict no pruning on the
    benchmark corpus (near-dups inside the bulk similarity mass) and
    route to the GEMM, (b) predict pruning on the clustered fixture
    and keep the LSH plan — with identical output either way."""
    emb = load_table(spark, sf_dir, "embeddings")
    est, n = S.lsh_candidate_estimate(emb, dim=64, n_planes=24, n_chunks=12)
    assert n == emb.count()
    assert est >= 0.5 * n * (n - 1) / 2  # benchmark corpus: no gap

    clustered = _clustered_fixture(spark)
    est_c, n_c = S.lsh_candidate_estimate(
        clustered, dim=64, n_planes=30, n_chunks=5
    )
    assert n_c == clustered.count()
    assert est_c < 0.25 * n_c * (n_c - 1) / 2

    with_fb = {(r.id_a, r.id_b)
               for r in S.cosine_neardup_pairs_lsh(
                   clustered, threshold=0.9, dim=64, n_planes=30,
                   n_chunks=5, fallback_ratio=0.5
               ).collect()}
    without = {(r.id_a, r.id_b)
               for r in S.cosine_neardup_pairs_lsh(
                   clustered, threshold=0.9, dim=64, n_planes=30,
                   n_chunks=5
               ).collect()}
    assert with_fb == without


def test_pq_topk_recall_and_codes_only_scan(spark, sf_dir, tmp_path):
    """IVF-PQ: recall >= 0.5 vs full-corpus exact top-10 (losses are
    dominated by the coarse-cell restriction, same as plain IVF),
    and the ADC candidate scan reads ONLY the codes column — the raw
    vector column appears in no scan before the refine join."""
    import re

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "pq")
    S.build_pq_index(emb, path, n_centroids=8, m=8)
    q = emb.where("vec_id % 100 = 0")
    pq = S.pq_topk(q, path, k=10, n_probe=3)
    exact = S.cosine_topk(emb, q, k=10)
    a = pq.select("query_id", "neighbor_id")
    n_q = q.count()
    overlap = a.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
    ).count()
    assert overlap / (10 * n_q) >= 0.5
    # deterministic across rebuilds (seeded training, lowest-id
    # sample): same ids out
    ids1 = sorted(map(tuple, a.collect()))
    ids2 = sorted(map(tuple,
                      S.pq_topk(q, path, k=10, n_probe=3)
                      .select("query_id", "neighbor_id").collect()))
    assert ids1 == ids2
    # plan gate: at least one vectors scan reads codes WITHOUT v
    formatted = spark._jvm.PythonSQLUtils.explainString(
        pq._jdf.queryExecution(), "formatted"
    )
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", formatted)
    codes_only = [s for s in schemas if "codes" in s and "v:" not in s]
    assert codes_only, f"no codes-only scan in {schemas}"


def test_semantic_dedup_greedy_prefix_rule(spark):
    """SemDeDup per-cluster greedy dedup: lowest id survives; any
    vector >= threshold to a LOWER id drops (even if that lower id
    itself dropped); clusters are independent; zero vectors are
    similar to nothing."""
    from hands_on_trino_iceberg_superset_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [
        # cluster 0: a chain 1~2, 2~3, but 1 !~ 3 -> 2 and 3 both
        # drop under the prefix rule (3 is similar to dropped 2)
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.9, 0.45, 0.0], 0),
        (3, [0.45, 0.9, 0.0], 0),
        # orthogonal -> survives
        (4, [0.0, 0.0, 1.0], 0),
        # cluster 1: identical direction to vec 1 but OTHER cluster
        # -> untouched (clusters are independent)
        (5, [1.0, 0.0, 0.0], 1),
        (6, [2.0, 0.0, 0.0], 1),  # same direction as 5 -> drops
        # zero vector: cosine 0 to everything -> survives
        (7, [0.0, 0.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r.vec_id: r.is_survivor
        for r in semantic_dedup(emb, threshold=0.8).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: True,
                   5: True, 6: False, 7: True}


def test_cosine_topk_filtered_matches_per_label_bruteforce(spark) -> None:
    """match_cols restricts neighbors to rows sharing the query's
    metadata — exact within the filtered set, never short-listed by
    post-filtering."""
    rows = [
        (1, [1.0, 0.0], "en"), (2, [0.9, 0.1], "en"),
        (3, [0.99, 0.01], "de"),  # closest overall but wrong lang
        (4, [0.0, 1.0], "en"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "lang"])
    out = S.cosine_topk(
        df, df.where(F.col("vec_id") == 1), k=2, match_cols=["lang"]
    ).collect()
    assert [(r.rank, r.neighbor_id) for r in sorted(out, key=lambda r: r.rank)] \
        == [(1, 2), (2, 4)]  # 3 excluded despite highest cosine


def test_ivf_incremental_append(spark, tmp_path) -> None:
    """append_to_ivf_index folds new vectors into an existing index:
    counts add up, every appended vector lands in its nearest cell,
    and probes see appended vectors immediately."""
    import numpy as np

    rng = np.random.default_rng(7)
    # two clearly separated blobs so cell assignment is unambiguous
    base = [(i, (rng.normal(0, 0.05, 4) + (5.0 if i % 2 else -5.0))
             .tolist()) for i in range(40)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in base],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df.where(F.col("vec_id") < 20), idx, n_centroids=2)
    S.append_to_ivf_index(df.where(F.col("vec_id") >= 20), idx)

    stored = spark.read.parquet(f"{idx}/vectors")
    assert stored.count() == 40
    # appended vectors share cells with the base vectors of their blob
    cells = {r.vec_id: r.cell for r in stored.select("id", "cell")
             .withColumnRenamed("id", "vec_id").collect()}
    for i in range(20, 40):
        assert cells[i] == cells[i % 2], f"vec {i} in wrong cell"
    # probe finds appended near-duplicates of an appended query
    q = df.where(F.col("vec_id") == 21)
    out = S.ivf_probe(q, idx, k=5, n_probe=1).collect()
    assert len(out) == 5
    assert all(r.neighbor_id % 2 == 1 for r in out)  # same blob only


def test_round_half_up_matches_oracle_semantics():
    """r4 ADVICE: Arrow-kernel rounding must be half-away-from-zero
    (F.round / DuckDB round), not numpy banker's rounding — an exact
    decimal half must round AWAY from zero on both engines."""
    import numpy as np

    from hands_on_trino_iceberg_superset_spark.operators.similarity import (
        _round_half_up,
    )

    x = np.array([0.1234565, -0.1234565, 0.0000005, -0.0000005,
                  1.25e-6, 0.5e-6, 0.9999995])
    got = _round_half_up(x, 6)
    # np.round would give .123456 / 1e-6 / 0 here (half-to-even)
    assert got[2] == 1e-6 and got[3] == -1e-6
    assert got[4] == 1e-6  # 1.25e-6 -> nearest, not involved in half
    assert got[5] == 1e-6
    assert got[6] == 1.0
    assert (np.sign(got) == np.sign(x)).all()


def test_semantic_dedup_over_ivf_kmeans_cells(spark, tmp_path):
    """SemDeDup end-to-end with its INTENDED cluster source: the
    persisted IVF index's Lloyd-refined k-means centroids feed
    quantizer_assign, whose cells feed semantic_dedup. Verified
    exactly in numpy: (a) every cell is the true rounded-distance
    argmin, (b) survivorship equals the greedy-prefix rule computed
    from scratch within those cells."""
    import numpy as np

    from hands_on_trino_iceberg_superset_spark.operators.similarity import (
        _round_half_up,
        build_ivf_index,
        quantizer_assign,
        semantic_dedup,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16) * 3.0
    rows = []
    for i in range(120):
        base = centers[i % 4] + rng.randn(16) * 0.05
        if i % 10 == 9:  # planted near-duplicate of the previous row
            base = centers[(i - 1) % 4] + rng.randn(16) * 0.001
        rows.append((i, [float(x) for x in base], i % 4))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=4)
    cents = spark.read.parquet(f"{path}/centroids")

    assigned = quantizer_assign(emb, cents)
    got = {
        r.vec_id: (r.cluster, r.is_survivor)
        for r in semantic_dedup(
            assigned, threshold=0.95, cluster_col="cell"
        ).collect()
    }
    assert len(got) == 120

    # exact recompute from scratch
    cent_rows = sorted(cents.collect(), key=lambda r: r.cell)
    C = np.stack([np.asarray(r.centroid, float) for r in cent_rows])
    cell_ids = [r.cell for r in cent_rows]
    V = np.stack([np.asarray(v, np.float32).astype(np.float64)
                  for _, v, _ in rows])
    d = _round_half_up(
        (V * V).sum(1)[:, None] - 2.0 * (V @ C.T) + (C * C).sum(1), 6
    )
    want_cell = [cell_ids[j] for j in d.argmin(axis=1)]
    norms = np.linalg.norm(V, axis=1)
    sims = _round_half_up((V @ V.T) / np.outer(norms, norms), 6)
    for i in range(120):
        assert got[i][0] == want_cell[i], i
        dropped = any(
            want_cell[j] == want_cell[i] and sims[i, j] >= 0.95
            for j in range(i)
        )
        assert got[i][1] == (not dropped), i
    # the planted near-dups actually exercised the drop path
    assert sum(1 for _, s in got.values() if not s) >= 10


def test_quantizer_assign_rejects_int32_overflow_cells(spark):
    from hands_on_trino_iceberg_superset_spark.operators.similarity import (
        quantizer_assign,
    )

    import pytest

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(2**31, [1.0, 0.0])], "cell long, centroid array<float>"
    )
    with pytest.raises(ValueError, match="int32"):
        quantizer_assign(df, cents)


def test_auto_centroids_sizing():
    from hands_on_trino_iceberg_superset_spark.operators.similarity import (
        auto_centroids,
    )

    assert auto_centroids(0) == 2
    assert auto_centroids(49_999) == 2
    assert auto_centroids(500_000) == 10
    assert auto_centroids(10**9) == 20_000
    assert auto_centroids(10**12) == 65_536     # clamped
    assert auto_centroids(1_000, target_cell_size=100) == 10


def test_embedding_outliers_finds_planted_outlier(spark, tmp_path):
    """A vector far from its label's cluster must rank first in that
    label's outlier list."""
    import numpy as np

    from hands_on_trino_iceberg_superset_spark.queries import load_all

    rng = np.random.RandomState(11)
    rows = []
    for i in range(40):
        v = rng.randn(64) * 0.01 + (1.0 if i % 2 else -1.0)
        rows.append((i, [float(x) for x in v], i % 2))
    rows.append((99, [float(25.0)] * 64, 0))  # planted outlier, label 0
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = load_all()["embedding_outliers"].spark(
        spark, str(tmp_path)
    ).collect()
    top_label0 = [r for r in out if r.label == 0 and r.rank == 1]
    assert top_label0[0].vec_id == 99
    assert all(r.rank <= 5 for r in out)


def test_filtered_ivf_probe_matches_filtered_bruteforce(spark, sf_dir, tmp_path):
    """ivf_probe(match_cols=['label']) returns only same-label
    neighbors and, at wide probes, the exact filtered top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_meta")
    S.build_ivf_index(emb, idx, n_centroids=8, meta_cols=["label"])
    q = emb.where(F.col("vec_id") % 100 == 0)
    lab = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}

    probe = S.ivf_probe(q, idx, k=10, n_probe=4, match_cols=["label"]).collect()
    assert all(lab[r.neighbor_id] == lab[r.query_id] for r in probe)

    # probing ALL cells makes the filtered probe exact
    full = S.ivf_probe(q, idx, k=10, n_probe=8, match_cols=["label"])
    exact = S.cosine_topk(emb, q, k=10, match_cols=["label"])
    got = {(r.query_id, r.neighbor_id) for r in full.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert got == want


def test_ivf_append_carries_meta_cols(spark, tmp_path) -> None:
    """append_to_ivf_index(meta_cols=...) keeps the denormalized
    metadata schema so filtered probes see appended vectors."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (i, (rng.normal(0, 0.05, 4) + (5.0 if i % 2 else -5.0)).tolist(),
         f"t{i % 2}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], t) for i, v, t in rows],
        "vec_id long, embedding array<float>, label string",
    )
    idx = str(tmp_path / "ivf_meta_append")
    S.build_ivf_index(df.where(F.col("vec_id") < 20), idx,
                      n_centroids=2, meta_cols=["label"])
    S.append_to_ivf_index(df.where(F.col("vec_id") >= 20), idx,
                          meta_cols=["label"])
    stored = spark.read.parquet(f"{idx}/vectors")
    assert stored.count() == 40
    assert "label" in stored.columns
    # a filtered probe against an appended query returns only its
    # tenant, including appended same-tenant vectors
    q = df.where(F.col("vec_id") == 21)
    out = S.ivf_probe(q, idx, k=5, n_probe=2, match_cols=["label"]).collect()
    assert len(out) == 5
    assert all(r.neighbor_id % 2 == 1 for r in out)
    assert any(r.neighbor_id >= 20 for r in out)


def test_rebuild_if_skewed_triggers_and_recall_recovers(spark, tmp_path):
    """Drift maintenance: appends that pile into one cell trip the
    relative hot-cell threshold; rebuild_if_skewed re-fits the
    quantizer over the current store and narrow probes find the
    drifted vectors' true neighbors again."""
    import numpy as np

    rng = np.random.default_rng(3)

    def blob(center, id0):
        return [(id0 + i, (rng.normal(0, 0.05, 4) + center).tolist())
                for i in range(24)]

    # fit-time corpus: a single tight blob; three drifted blobs the
    # quantizer never saw arrive later as appends
    base = blob(-10.0, 0)
    drift = blob(0.0, 100) + blob(10.0, 200) + blob(20.0, 300)

    def df(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df(base), idx, n_centroids=4)
    S.append_to_ivf_index(df(drift), idx)

    # all 72 drifted vectors cram into the nearest fitted cell(s):
    # hottest cell far above the 2x-mean (= 2 * 96/4 = 48) trigger
    counts = {r.cell: r.n_vectors for r in
              S.ivf_cell_counts(spark, idx).collect()}
    assert max(counts.values()) > 2.0 * 96 / 4

    # a healthy index over the same data must NOT rebuild
    idx2 = str(tmp_path / "ivf_healthy")
    S.build_ivf_index(df(base + drift), idx2, n_centroids=4)
    assert S.rebuild_if_skewed(spark, idx2) is False

    assert S.rebuild_if_skewed(spark, idx) is True
    # post-rebuild: same contents, balanced histogram (4 separated
    # blobs of 24 -> no cell above the trigger), passes its own check
    after = {r.cell: r.n_vectors for r in
             S.ivf_cell_counts(spark, idx).collect()}
    assert sum(after.values()) == 96
    assert max(after.values()) <= 2.0 * 96 / 4
    assert S.rebuild_if_skewed(spark, idx) is False

    # narrow probe from a drifted query now sees its own blob only
    q = df(drift).where(F.col("vec_id") == 300)
    out = S.ivf_probe(q, idx, k=5, n_probe=1).collect()
    assert len(out) == 5
    assert all(300 <= r.neighbor_id < 324 for r in out)


def test_rebuild_recovers_parked_stale_index(spark, tmp_path):
    """A rebuild that died between its two renames leaves the index
    at .stale; the next maintenance call adopts it back."""
    import os

    import numpy as np

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(0, 1, 4)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df, idx, n_centroids=2)
    os.rename(idx, idx + ".stale")  # simulate the crash window
    assert S.rebuild_if_skewed(spark, idx) in (True, False)
    assert os.path.exists(idx) and not os.path.exists(idx + ".stale")
    assert S.ivf_cell_counts(spark, idx).agg(
        F.sum("n_vectors")
    ).collect()[0][0] == 30


def test_hard_negatives_exclude_anchor_label(spark):
    from hands_on_trino_iceberg_superset_spark.queries import load_all

    inv = load_all()
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    labels = {r.vec_id: r.label for r in
              emb.select("vec_id", "label").collect()}
    rows = inv["ann_hard_negatives"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert labels[r.neighbor_id] != labels[r.query_id]
        assert r.neg_label == labels[r.neighbor_id]
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_quantizer_max_cell_stays_bounded_at_10x(spark):
    """The histogram gate behind dedup_semantic_quantized's
    auto-sizing: grow the corpus 10x (id offset + one-coordinate
    perturbation, the scale_bench recipe) and the LARGEST cell must
    stay ~flat, because auto_centroids grows the cell COUNT with the
    corpus. A fixed cell count fails this immediately (10x rows ->
    10x max cell -> 100x per-cell GEMM pair work)."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")

    def max_cell(df):
        n_cells = S.auto_centroids(df.count(), target_cell_size=64)
        cents = (
            df.orderBy("vec_id").limit(n_cells)
            .select(F.col("vec_id").alias("cell"),
                    F.col("embedding").alias("centroid"))
        )
        assigned = S.quantizer_assign(df, cents)
        hist = assigned.groupBy("cell").count().collect()
        return n_cells, max(r["count"] for r in hist)

    reps = [
        emb.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            F.when(F.lit(i == 0), F.col("embedding")).otherwise(
                F.concat(
                    F.slice(F.col("embedding"), 1, 63),
                    F.array(F.element_at(F.col("embedding"), 64)
                            + F.lit(0.001) * i),
                )
            ).alias("embedding"),
            "label",
        )
        for i in range(10)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    k1, m1 = max_cell(emb)
    k10, m10 = max_cell(big)
    assert k10 >= 8 * k1                 # cell count actually scales
    assert m10 <= 3 * m1, (m1, m10)     # max cell ~flat, not 10x


def test_mmr_rerank_prefers_diverse_over_redundant(spark) -> None:
    """Planted fixture: three identical 'copies' of the query
    direction (rel 1.0, mutual sim 1.0) and three diverse vectors
    (rel 0.8, mutual sim 0.64). A diversity-heavy weighting must
    take ONE copy then the diverse set; pure top-k would take all
    copies first."""
    cands = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (10, [0.8, 0.6, 0.0, 0.0]),
            (11, [0.8, 0.0, 0.6, 0.0]),
            (12, [0.8, 0.0, 0.0, 0.6]),
        ],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(99, [1.0, 0.0, 0.0, 0.0])],
                              ["vec_id", "embedding"])
    out = S.mmr_rerank(cands, q, k=5, pool=10,
                       rel_weight=0.3, div_weight=0.7)
    picked = [r.neighbor_id
              for r in sorted(out.collect(), key=lambda r: r.mmr_rank)]
    # rank1 = pure relevance (copy 0), then the three diverse
    # vectors (redundant copies score 0.3-0.7=-0.4 vs -0.32), then
    # the next copy once diversity is exhausted
    assert picked == [0, 10, 11, 12, 1]


def test_mmr_rerank_contract_on_corpus(spark, sf_dir: str) -> None:
    """Default weights on the real corpus: rank-1 equals the exact
    top-1 (first pick is pure relevance), every pick comes from the
    top-30 pool, 5 distinct picks per query, and the MMR set is
    never MORE redundant than the plain top-5 (max intra-set
    similarity, averaged over queries)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 100 == 0)
    mmr = S.mmr_rerank(emb, q, k=5, pool=30).collect()
    pool = {(r.query_id, r.neighbor_id)
            for r in S.cosine_topk(emb, q, k=30).collect()}
    top5 = S.cosine_topk(emb, q, k=5).collect()
    top1 = {r.query_id: r.neighbor_id for r in top5 if r.rank == 1}
    by_q: dict[int, list] = {}
    for r in mmr:
        assert (r.query_id, r.neighbor_id) in pool
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len({r.neighbor_id for r in rows}) == 5
        first = min(rows, key=lambda r: r.mmr_rank)
        assert first.neighbor_id == top1[qid]

    import numpy as np

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}

    def max_pairwise(ids: list[int]) -> float:
        worst = -1.0
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va, vb = vecs[a], vecs[b]
                worst = max(worst, float(
                    va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                ))
        return worst

    t5: dict[int, list[int]] = {}
    for r in top5:
        t5.setdefault(r.query_id, []).append(r.neighbor_id)
    mmr_red = np.mean([max_pairwise([r.neighbor_id for r in rows])
                       for rows in by_q.values()])
    top_red = np.mean([max_pairwise(ids) for ids in t5.values()])
    assert mmr_red <= top_red + 1e-12


def test_matryoshka_recall_improves_with_width(spark, sf_dir: str) -> None:
    """Wider prefixes must not retrieve worse on average: mean
    recall@10 of the 32-dim prefix >= mean recall of the 16-dim
    prefix, and every per-query recall is a valid fraction."""
    from hands_on_trino_iceberg_superset_spark.queries import load_all

    rows = load_all()["embedding_matryoshka_recall"].spark(
        spark, sf_dir
    ).collect()
    by_dim: dict[int, list[float]] = {}
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_overlap == round(r.recall * 10)
        by_dim.setdefault(r.dim, []).append(r.recall)
    assert set(by_dim) == {16, 32}
    mean16 = sum(by_dim[16]) / len(by_dim[16])
    mean32 = sum(by_dim[32]) / len(by_dim[32])
    assert mean32 >= mean16


def test_ivf_delete_tombstones_never_surface(spark, tmp_path) -> None:
    """delete_from_ivf_index appends tombstones only (no celled data
    file rewritten); probes anti-join them inside the pruned scan so
    a deleted vector can never surface; drift audit also excludes
    them."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, (rng.normal(0, 0.05, 4) + (5.0 if i % 2 else -5.0))
             .tolist()) for i in range(40)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df, idx, n_centroids=2)
    before = {
        f for f in (tmp_path / "ivf" / "vectors").rglob("*.parquet")
    }
    deleted = {i for i in range(40) if i % 5 == 0}
    S.delete_from_ivf_index(df.where(F.col("vec_id") % 5 == 0), idx)
    # merge-on-read: the celled store is byte-identical
    assert before == {
        f for f in (tmp_path / "ivf" / "vectors").rglob("*.parquet")
    }
    q = df.where(F.col("vec_id") == 1)
    out = S.ivf_probe(q, idx, k=10, n_probe=1).collect()
    assert len(out) == 10
    assert not ({r.neighbor_id for r in out} & deleted)
    # live accounting in the drift audit excludes tombstones
    drift = S.ivf_drift(spark, idx).collect()
    assert sum(r.n_live for r in drift) == 40 - len(deleted)
    assert sum(r.n_build for r in drift) == 40


def test_ivf_drift_flags_refit(spark, tmp_path) -> None:
    """Unchanged store: drift_ratio ~ 1, no refit. After appending a
    shifted blob (distribution moved off the fitted centroids), the
    weighted live distance exceeds the baseline and refit_due flips.
    Indexes without a baseline refuse instead of inventing a ratio."""
    import numpy as np

    import pytest

    rng = np.random.default_rng(3)
    rows = [(i, (rng.normal(0, 0.1, 4) + (4.0 if i % 2 else -4.0))
             .tolist()) for i in range(40)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df, idx, n_centroids=2)
    for r in S.ivf_drift(spark, idx).collect():
        assert abs(r.drift_ratio - 1.0) < 1e-9  # live == build
    assert S.refit_due(spark, idx, threshold=1.5) is False

    # distribution shift: a third blob far from both centroids
    shifted = spark.createDataFrame(
        [(100 + i, [float(x) for x in rng.normal(0, 0.1, 4) + 12.0])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    S.append_to_ivf_index(shifted, idx)
    assert S.refit_due(spark, idx, threshold=1.5) is True

    # no baseline -> honest refusal
    import shutil

    shutil.rmtree(tmp_path / "ivf" / "build_stats")
    with pytest.raises(ValueError, match="build_stats"):
        S.ivf_drift(spark, idx)


def test_ivf_delete_then_reappend_resurfaces(spark, tmp_path) -> None:
    """A tombstoned id re-ingested via append_to_ivf_index becomes
    visible to probes again: the append compacts the re-ingested ids
    out of the tombstone set, while ids deleted and NOT re-appended
    stay invisible."""
    import numpy as np

    rng = np.random.default_rng(13)
    rows = [(i, (rng.normal(0, 0.05, 4) + (5.0 if i % 2 else -5.0))
             .tolist()) for i in range(40)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df, idx, n_centroids=2)
    S.delete_from_ivf_index(
        df.where(F.col("vec_id").isin(3, 5)), idx
    )
    q = df.where(F.col("vec_id") == 1)
    gone = {r.neighbor_id
            for r in S.ivf_probe(q, idx, k=20, n_probe=1).collect()}
    assert 3 not in gone and 5 not in gone

    # re-ingest id 3 (same odd-side blob -> same cell family)
    S.append_to_ivf_index(df.where(F.col("vec_id") == 3), idx)
    back = {r.neighbor_id
            for r in S.ivf_probe(q, idx, k=20, n_probe=1).collect()}
    assert 3 in back      # resurfaced
    assert 5 not in back  # never re-appended: still deleted
