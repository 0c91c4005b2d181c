"""Sequence packing — turn a tokenized corpus into the fixed-length
training sequences an LLM consumes (concatenate documents in a
deterministic order, slice into ``seq_len``-token chunks; documents
cross chunk boundaries, nothing is padded or dropped except the
final partial chunk's tail).

Scale shape, the part that matters at 100 TB:

1. **Global token offsets come from a TWO-PHASE PREFIX SUM**, not a
   global window. ``Window.orderBy(...)`` without partition keys
   collapses every row into ONE task — the classic driver-shaped
   bottleneck. :func:`prefix_sum` instead range-partitions on the
   order column (ascending ranges land in ascending partition ids),
   computes per-partition totals (one tiny aggregate, bounded by
   partition count), broadcasts the running bases, and finishes with
   a partition-local cumulative pass — the textbook distributed scan
   primitive. The order column must be a unique key (doc ids are):
   rows TIED on it would receive arbitrary relative offsets.
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


def prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "offset",
) -> DataFrame:
    """EXCLUSIVE running sum of ``val_col`` in ``order_col`` order,
    distributed: range partition -> per-partition totals (collected:
    one row per partition, bounded metadata) -> broadcast bases ->
    partition-local cumulative. Returns the input columns plus
    ``out_col``."""
    spark = df.sparkSession
    n_part = max(2, min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        200,
    ))
    # DETERMINISTIC bucketing: repartitionByRange samples its
    # boundaries PER EXECUTION, so the totals job and the scan job
    # could disagree on which rows land where. approxQuantile is a
    # deterministic (Greenwald-Khanna) one-pass sketch, computed
    # once driver-side; bucket id = count of boundaries strictly
    # below the order value — pure arithmetic, identical in every
    # job that evaluates it.
    bounds = df.stat.approxQuantile(
        order_col,
        [i / n_part for i in range(1, n_part)],
        0.001,
    )
    barr = F.array(*[F.lit(b) for b in bounds])
    bucketed = df.withColumn(
        "_pid",
        F.size(F.filter(barr, lambda b: b < F.col(order_col).cast("double"))),
    )
    totals = {
        r._pid: r.tot
        for r in bucketed.groupBy("_pid")
        .agg(F.sum(val_col).alias("tot"))
        .collect()
    }
    bases, run = {}, 0
    for pid in sorted(totals):
        bases[pid] = run
        run += int(totals[pid] or 0)

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
            for pid, grp in pdf.groupby("_pid", sort=False):
                if pid != cur:
                    cur, run = pid, bases[int(pid)]
                vals = grp[val_col].to_numpy()
                out = grp[cols].copy()
                out[out_col] = run + vals.cumsum() - vals
                run += int(vals.sum())
                outs.append(out)
            import pandas as pd

            yield pd.concat(outs)

    return ranged.mapInPandas(scan, schema)


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
    counted = docs.select(
        F.col(id_col).alias("doc"),
        F.col(tokens_col).alias("toks"),
        F.size(tokens_col).cast("bigint").alias("n"),
    ).where(F.col("n") > 0)
    offs = prefix_sum(counted, "doc", "n")
    tok = offs.select(
        "doc",
        F.posexplode("toks").alias("i", "tok"),
        F.col("offset"),
    ).select(
        "doc",
        "tok",
        (F.col("offset") + F.col("i")).alias("gpos"),
    ).withColumn("seq_id", (F.col("gpos") / seq_len).cast("bigint"))
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
    arrays: (seq_id, n_tokens, n_docs, first_token, last_token) —
    the bookkeeping view the driver oracle checks; min_by/max_by on
    global position pick the boundary tokens."""
    packed = pack_sequences(docs, seq_len, tokens_col, id_col)
    return packed.select(
        "seq_id",
        "n_tokens",
        "n_docs",
        F.element_at("tokens", 1).alias("first_token"),
        F.element_at("tokens", -1).alias("last_token"),
    )
