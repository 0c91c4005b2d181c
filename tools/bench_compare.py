#!/usr/bin/env python
"""Honest per-query Spark-vs-DuckDB timing over the full inventory.

Usage::

    python tools/bench_compare.py [sf_dir] [--json out.json]

For every oracle-checked query: Spark wall time (collect) and DuckDB
wall time (same oracle SQL the driver runs), plus the ratio. Prints
a markdown table sorted by Spark time and aggregate statistics that
EXCLUDE pathological outliers on either side (reported separately) —
see PERF.md for why the aggregate-only comparison was misleading.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from hands_on_trino_iceberg_superset_spark.oracle import duckdb_connection
from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.session import get_spark


def main() -> int:
    # consume --json (and its VALUE) before positional parsing —
    # otherwise the filename is mistaken for sf_dir
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: bench_compare.py [sf_dir] [--json out.json]",
                  file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        print(f"unknown options: {unknown}", file=sys.stderr)
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    inventory = load_all()
    spark = get_spark("bench-compare")
    # warm both engines (JVM + python workers + parquet footers)
    inventory["global_counts"].spark(spark, sf_dir).collect()

    rows = []
    for name, spec in inventory.items():
        t0 = time.time()
        spec.spark(spark, sf_dir).collect()
        spark_s = time.time() - t0
        duck_s = None
        if spec.oracle is not None:
            con = duckdb_connection(sf_dir)
            t0 = time.time()
            con.sql(spec.oracle).fetchall()
            duck_s = time.time() - t0
            con.close()
        # keep UNROUNDED floats: ratios from 3-decimal-rounded values
        # divide by zero for sub-millisecond oracles and skew the
        # median the tool exists to report (display rounds at print)
        rows.append({"query": name, "spark_s": spark_s,
                     "duckdb_s": duck_s})
        print(f"  {name}: spark={spark_s:.2f}s duckdb="
              f"{'-' if duck_s is None else f'{duck_s:.2f}s'}", flush=True)

    both = [r for r in rows if r["duckdb_s"] is not None]
    spark_total = sum(r["spark_s"] for r in rows)
    duck_total = sum(r["duckdb_s"] for r in both)
    ratios = sorted(r["spark_s"] / r["duckdb_s"] for r in both)
    med_ratio = statistics.median(ratios)
    # pathological ORACLE formulations: verification baselines that
    # are deliberately quadratic (exact pair sets) and exist only to
    # check values — excluding them from BOTH sides keeps the
    # aggregate honest in whichever direction it cuts
    patho = [r for r in both
             if r["duckdb_s"] > 10 and r["duckdb_s"] > 10 * r["spark_s"]]
    core = [r for r in both if r not in patho]
    core_spark = sum(r["spark_s"] for r in core)
    core_duck = sum(r["duckdb_s"] for r in core)

    print("\n| metric | value |")
    print("|---|---|")
    print(f"| queries timed | {len(rows)} ({len(both)} with oracle) |")
    print(f"| Spark total | {spark_total:.1f} s |")
    print(f"| DuckDB total (oracles) | {duck_total:.1f} s |")
    print(f"| median per-query ratio (spark/duckdb) | {med_ratio:.1f}x |")
    print(f"| quadratic-oracle baselines (excluded below) | "
          f"{', '.join(r['query'] for r in patho) or 'none'} |")
    print(f"| totals excluding those | spark {core_spark:.1f} s / "
          f"duckdb {core_duck:.1f} s = {core_spark / core_duck:.1f}x |")

    if json_out:
        out_rows = [
            {"query": r["query"], "spark_s": round(r["spark_s"], 4),
             "duckdb_s": (None if r["duckdb_s"] is None
                          else round(r["duckdb_s"], 4))}
            for r in rows
        ]
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "rows": out_rows,
                       "median_ratio": med_ratio}, fh, indent=1)
        print(f"\nwrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
