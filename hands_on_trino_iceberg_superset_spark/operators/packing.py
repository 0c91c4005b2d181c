"""Sequence packing — turn a tokenized corpus into the fixed-length
training sequences an LLM consumes (concatenate documents in a
deterministic order, slice into ``seq_len``-token chunks; documents
cross chunk boundaries, nothing is padded or dropped except the
final partial chunk's tail).

Scale shape, the part that matters at 100 TB:

1. **Global token offsets come from a TWO-PHASE PREFIX SUM**, not a
   global window. ``Window.orderBy(...)`` without partition keys
   collapses every row into ONE task — the classic driver-shaped
   bottleneck. :func:`prefix_sum` instead buckets on the order
   column with driver-computed boundary literals (ascending buckets
   = ascending data), computes per-bucket totals (one tiny
   aggregate, bounded by bucket count), broadcasts the running
   bases, and finishes with a partition-local cumulative pass — the
   textbook distributed scan primitive. The order column must be a
   unique key (doc ids are): rows TIED on it would receive
   arbitrary relative offsets.
2. **Chunk assembly is ONE shuffle of the token stream** keyed on
   chunk id — unavoidable and optimal: packing by definition
   co-locates tokens that were produced by different documents.
3. Everything is deterministic given (corpus, order column): offsets
   are arithmetic, chunk membership is arithmetic, so reruns and
   engines agree bit-for-bit — which is what lets DuckDB recompute
   the whole thing as the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _boundaries(df: DataFrame, order_col: str, n_part: int) -> list:
    """Driver-side bucket boundaries for ``order_col``. Numeric
    columns use the deterministic Greenwald-Khanna approxQuantile
    sketch (skew-balanced); string keys (uuid-style doc ids) fall
    back to a seeded-sample quantile — boundary QUALITY only affects
    bucket balance, never correctness, because the boundaries are
    computed once and embedded as literals that every job evaluates
    identically."""
    dt = df.schema[order_col].dataType
    if isinstance(dt, _NUMERIC):
        return df.stat.approxQuantile(
            order_col, [i / n_part for i in range(1, n_part)], 0.001
        )
    if isinstance(dt, T.StringType):
        sample = [
            r[0]
            for r in df.select(order_col)
            .sample(fraction=0.1, seed=7)
            .limit(100_000)
            .collect()
        ]
        if not sample:
            return []
        sample.sort()
        return sorted({
            sample[(len(sample) * i) // n_part]
            for i in range(1, n_part)
        })
    raise TypeError(
        f"prefix_sum order column '{order_col}' has unsupported "
        f"type {dt.simpleString()} (numeric or string required)"
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "offset",
) -> DataFrame:
    """EXCLUSIVE running sum of ``val_col`` in ``order_col`` order,
    distributed: boundary-literal bucketing -> per-bucket totals
    (collected: one row per bucket, bounded metadata) -> broadcast
    bases -> partition-local cumulative. Returns the input columns
    plus ``out_col``. Order keys must be unique (see module
    docstring); numeric and string keys supported.

    The input is persisted for the duration (MEMORY_AND_DISK): the
    boundary job, the totals job, and the final scan all read it —
    without the cache a corpus-sized upstream (tokenization) would
    execute three times. Spark's ContextCleaner reclaims the blocks
    when the returned plan is garbage collected.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    n_part = max(2, min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        200,
    ))
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    # DETERMINISTIC bucketing: repartitionByRange samples its
    # boundaries PER EXECUTION, so the totals job and the scan job
    # could disagree on which rows land where. Driver-computed
    # boundary LITERALS are identical in every job that evaluates
    # them; bucket id = count of boundaries strictly below the key.
    bounds = _boundaries(df, order_col, n_part)
    dt = df.schema[order_col].dataType
    key = (
        F.col(order_col).cast("double")
        if isinstance(dt, _NUMERIC) else F.col(order_col)
    )
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < key))
    else:
        pid = F.lit(0)
    bucketed = df.withColumn("_pid", pid)
    totals = {
        r._pid: r.tot
        for r in bucketed.groupBy("_pid")
        .agg(F.sum(val_col).alias("tot"))
        .collect()
    }
    bases, run = {}, 0
    for b in sorted(totals):
        bases[b] = run
        run += int(totals[b] or 0)

    ranged = bucketed.repartition(n_part, "_pid").sortWithinPartitions(
        "_pid", order_col
    )
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
    ) + f", {out_col} bigint"
    cols = [f.name for f in df.schema.fields]

    def scan(batches):
        # hash repartition may co-locate several buckets in one
        # physical partition; rows arrive sorted by (_pid, order),
        # so a running total per current bucket suffices
        cur, run = None, 0
        for pdf in batches:
            if pdf.empty:
                continue
            outs = []
            for b, grp in pdf.groupby("_pid", sort=False):
                if b != cur:
                    cur, run = b, bases[int(b)]
                vals = grp[val_col].to_numpy()
                out = grp[cols].copy()
                out[out_col] = run + vals.cumsum() - vals
                run += int(vals.sum())
                outs.append(out)
            import pandas as pd

            yield pd.concat(outs)

    return ranged.mapInPandas(scan, schema)


def _token_stream(
    docs: DataFrame, seq_len: int, tokens_col: str, id_col: str
) -> DataFrame:
    """(doc, tok, gpos, seq_id): every token with its global position
    — the prefix sum + explode shared by both packing views."""
    counted = docs.select(
        F.col(id_col).alias("doc"),
        F.col(tokens_col).alias("toks"),
        F.size(tokens_col).cast("bigint").alias("n"),
    ).where(F.col("n") > 0)
    offs = prefix_sum(counted, "doc", "n")
    return offs.select(
        "doc",
        F.posexplode("toks").alias("i", "tok"),
        F.col("offset"),
    ).select(
        "doc",
        "tok",
        (F.col("offset") + F.col("i")).alias("gpos"),
    ).withColumn("seq_id", (F.col("gpos") / seq_len).cast("bigint"))


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pack ``tokens_col`` arrays into fixed ``seq_len`` sequences in
    ``id_col`` order. Returns one row per chunk: (seq_id, tokens,
    n_tokens, n_docs) — ``tokens`` in exact corpus order, full
    chunks everywhere except the final partial one.

    One prefix sum (see :func:`prefix_sum`) + one explode + one
    shuffle on seq_id. The explode emits each document's tokens with
    their GLOBAL positions, so chunk assembly is a plain groupBy —
    no cross-document alignment logic survives to the reduce side.
    """
    tok = _token_stream(docs, seq_len, tokens_col, id_col)
    return (
        tok.groupBy("seq_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(gpos, tok))), "
                   "x -> x.tok)").alias("tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("doc").cast("bigint").alias("n_docs"),
        )
    )


def pack_summary(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-chunk packing summary WITHOUT materializing the packed
    arrays: (seq_id, n_tokens, n_docs, first_token, last_token).
    Aggregates the exploded token stream directly — min_by/max_by on
    global position pick the boundary tokens, so no collect_list /
    array_sort of whole chunks ever runs; this is the cheap
    bookkeeping pass over the same stream :func:`pack_sequences`
    materializes."""
    tok = _token_stream(docs, seq_len, tokens_col, id_col)
    return tok.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.countDistinct("doc").cast("bigint").alias("n_docs"),
        F.expr("min_by(tok, gpos)").alias("first_token"),
        F.expr("max_by(tok, gpos)").alias("last_token"),
    )
