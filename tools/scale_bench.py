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
    "ann_cosine_topk_ivf",
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


def main() -> int:
    reps = 10
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])

    spark = get_spark("scale-bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10).mapInPandas(lambda it: it, "id long").count()
    t0 = time.time()
    dst = build(spark, reps)
    print(f"corpus at {dst} (build {time.time() - t0:.0f}s)", file=sys.stderr)

    inventory = load_all()
    print("| query | rows_1x | s_1x | rows_10x | s_10x | time ratio |")
    print("|---|---|---|---|---|---|")
    for name in QUERIES:
        spec = inventory[name]
        out = {}
        for label, d in (("1x", SRC), ("10x", dst)):
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = spec.spark(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[label] = (rows, best)
        r1, s1 = out["1x"]
        r10, s10 = out["10x"]
        print(
            f"| {name} | {r1:,} | {s1:.2f} | {r10:,} | {s10:.2f} "
            f"| {s10 / s1:.1f}x |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
