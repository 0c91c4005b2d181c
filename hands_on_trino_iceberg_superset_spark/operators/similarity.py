"""Vector similarity search over embedding columns.

Two paths:

- **brute force**: broadcast the (small) query set against every
  candidate row, compute cosine JVM-side with higher-order array
  functions, take top-k per query via a ranking window. Exact; scan
  cost is linear in corpus size, no shuffle of the corpus itself.
- **LSH (random hyperplane / SimHash-for-vectors)**: deterministic
  pseudo-random hyperplanes derived from xxhash64; vectors bucket by
  sign-pattern chunks, candidates come from bucket equi-joins, then
  exact cosine re-ranks. Sub-linear candidate generation at scale.

All arithmetic is done after casting float32 -> double, sequential
left-to-right (``aggregate``), so scores are bit-deterministic and
match a double-precision oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# -------------------------------------------------------- expressions


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# -------------------------------------------------------- brute force


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast); ``corpus`` streams
    through a single narrow stage. Ranking ties break on neighbor id
    (after optional rounding) so results are total-order stable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ------------------------------------------------------ near-dup pairs


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact, via
    distributed block matrix multiply.

    Rows hash into ``n_blocks`` blocks on id; each unordered block
    pair (i <= j) becomes one Arrow-batched ``applyInPandas`` group
    whose similarity block is a single BLAS GEMM
    (``A @ B.T / outer(|a|, |b|)``) — ~100x the throughput of
    per-pair expression evaluation. Each vector is replicated
    ``n_blocks`` times through one shuffle, so network volume is
    ``n_blocks * corpus`` while compute stays the full quadratic —
    the right trade until an LSH/IVF prefilter bounds the candidate
    set. Size ``n_blocks`` ~ sqrt(parallelism) at the target scale.
    """
    import numpy as np
    import pandas as pd

    v = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    combos = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    combos_df = df.sparkSession.createDataFrame(combos, "bi int, bj int")
    side_a = v.join(
        F.broadcast(combos_df), v.blk == combos_df.bi
    ).select("bi", "bj", "id", "v", F.lit("a").alias("role"))
    side_b = v.join(
        F.broadcast(combos_df), v.blk == combos_df.bj
    ).select("bi", "bj", "id", "v", F.lit("b").alias("role"))
    tagged = side_a.unionAll(side_b)

    digits = round_digits

    def gemm_block(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        a_rows = pdf[pdf["role"] == "a"]
        b_rows = pdf[pdf["role"] == "b"]
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cos_sim": pd.Series(dtype="float64")}
            )
        ma = np.stack(a_rows["v"].to_numpy())
        mb = np.stack(b_rows["v"].to_numpy())
        sims = (ma @ mb.T) / np.outer(
            np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1)
        )
        if digits is not None:
            sims = np.round(sims, digits)
        ids_a = a_rows["id"].to_numpy()
        ids_b = b_rows["id"].to_numpy()
        if key[0] == key[1]:
            # diagonal block: both orderings present, keep one
            order = ids_a[:, None] < ids_b[None, :]
        else:
            # off-diagonal: each unordered pair appears exactly once
            order = ids_a[:, None] != ids_b[None, :]
        ii, jj = np.nonzero((sims >= threshold) & order)
        lo = np.minimum(ids_a[ii], ids_b[jj])
        hi = np.maximum(ids_a[ii], ids_b[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sims[ii, jj]})

    return tagged.groupBy("bi", "bj").applyInPandas(
        gemm_block, "id_a long, id_b long, cos_sim double"
    )


# ----------------------------------------------------------- IVF path


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning: a
    k-means coarse quantizer assigns every corpus vector to one of
    ``n_centroids`` cells; each query probes only its ``n_probe``
    nearest cells and re-ranks candidates with exact cosine.

    Scan cost drops to ~``n_probe / n_centroids`` of the corpus per
    query. The cell assignment is a one-off index build (in a real
    deployment: persisted and partitioned by cell, so a probe is a
    partition-pruned read). Centroids are tiny (k x dim) and travel
    by closure; queries are small by contract (same as
    :func:`cosine_topk`'s broadcast).
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("fv", array_to_vector(F.col("cv")))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter,
        featuresCol="fv", predictionCol="cell",
    ).fit(feat)
    assigned = model.transform(feat).select("neighbor_id", "cv", "cell")

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).collect()
    # probe list per query: nearest cells by euclidean distance to
    # centroids (k-means' own metric), computed on the driver — the
    # centroid matrix is n_centroids x dim
    probe_rows = []
    for r in q_rows:
        d = ((centers - np.asarray(r.qv)) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:n_probe]:
            probe_rows.append((r.query_id, r.qv, int(cell)))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cell int"
    )

    sim = F.round(cosine(F.col("qv"), F.col("cv")), 6)
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


# ----------------------------------------------------------- LSH path


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane components in
    [-0.5, 0.5): golden-ratio hash of (plane, dim) — no RNG state."""
    comps = []
    for d in range(dim):
        x = ((plane_idx * 1_000_003 + d + 1) * 0x9E3779B97F4A7C15) & (
            (1 << 64) - 1
        )
        comps.append(((x >> 11) / float(1 << 53)) - 0.5)
    return comps


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """n-bit sign pattern of the vector against fixed hyperplanes."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bits.append(
            F.when(dot(as_double(vec), plane) >= 0, F.lit(1).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
            * F.lit(1 << p).cast("bigint")
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_chunks: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature
    chunk with the query (multi-probe by pigeonhole), then exact
    cosine re-ranks the candidate set.

    At 100 TB the bucket join replaces the full scan: each query
    touches only the partitions holding its chunk values.
    """
    width = n_planes // n_chunks

    def with_chunks(df: DataFrame, idc: str) -> DataFrame:
        sig = hyperplane_signature(F.col(vec_col), dim, n_planes)
        chunk_structs = [
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftrightunsigned(sig, c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
        return df.select(
            F.col(id_col).alias(idc),
            as_double(F.col(vec_col)).alias(f"{idc}_v"),
            F.explode(F.array(*chunk_structs)).alias("ch"),
        ).select(idc, f"{idc}_v", "ch.chunk_idx", "ch.chunk_val")

    cq = with_chunks(queries, "query_id")
    cc = with_chunks(corpus, "neighbor_id")
    candidates = (
        cc.join(
            F.broadcast(cq),
            (cc.chunk_idx == cq.chunk_idx)
            & (cc.chunk_val == cq.chunk_val)
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("query_id_v"), F.col("neighbor_id_v")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
