#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

Usage:
    python tools/profile_queries.py [--plans DIR] [--suffix _before] \
        [--sf SF_DIR] [--repeat N] query1 query2 ...

For each named query: builds the DataFrame, optionally writes
``.explain('formatted')`` to ``<plans>/<name><suffix>.txt``, then
times the noop-sink write (same basis as bench.py) ``--repeat``
times, printing each run plus the min. Queries run on the same
get_spark session as bench.py so numbers are comparable.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from hands_on_trino_iceberg_superset_spark.queries import load_all
    from hands_on_trino_iceberg_superset_spark.session import get_spark

    inv = load_all()
    unknown = [q for q in args.queries if q not in inv]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("profile")
    # same warm-up as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(args.sf + "/region.parquet").count()
    try:
        import pandas as pd  # noqa: F401
        spark.range(10).mapInPandas(lambda it: it, "id long").count()
    except Exception:
        pass
    from hands_on_trino_iceberg_superset_spark.queries.artifacts import (
        prewarm,
    )
    prewarm(spark, args.sf)

    import gc
    plans_dir = Path(args.plans) if args.plans else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    for name in args.queries:
        times = []
        for i in range(args.repeat):
            gc.collect()
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            df = inv[name].spark(spark, args.sf)
            t_build = time.perf_counter() - t0
            if i == 0 and plans_dir:
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")
                )
                (plans_dir / f"{name}{args.suffix}.txt").write_text(plan)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"{name} run{i}: {dt:7.3f}s (build {t_build:6.3f}s)",
                  flush=True)
            spark.sparkContext.setJobDescription(None)
        print(f"{name} MIN: {min(times):7.3f}s", flush=True)


if __name__ == "__main__":
    main()
