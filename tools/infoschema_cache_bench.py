"""Measure the information_schema snapshot cache at catalog scale.

VERDICT r12 stretch: the r12 cache is correctness-gated
(tests/test_engine.py::test_information_schema_snapshot_cache) but
its scale payoff was asserted, not measured. This lane registers a
~2k-view catalog and times:

- COLD:   the first introspection statement — full snapshot build,
          one ``spark.table(v).schema`` analysis per catalog entry;
- WARM:   consecutive introspection statements — cache key recompute
          only (entry listing + the r13 per-temp-view plan digest),
          ZERO schema analysis;
- SWAP:   one same-name view swap done directly on the SparkSession,
          then an introspection statement — the digest invalidates
          and the snapshot rebuilds (stale answers are worse than a
          rebuild).

Usage: python tools/infoschema_cache_bench.py [n_views]
Prints one JSON line; record the numbers in PERF.md.

Measurement-harness code lives in tools/ (not the package) so query
anchors don't flip to "changed" (memory: round-workflow).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from pyspark.sql import SparkSession

    from hands_on_trino_iceberg_superset_spark.engine import Engine

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)

    base = spark.range(1).selectExpr(
        "id AS c0", "id + 1 AS c1", "CAST(id AS string) AS c2"
    )
    t0 = time.perf_counter()
    for i in range(n_views):
        base.createOrReplaceTempView(f"icb_view_{i:05d}")
    register_s = time.perf_counter() - t0

    stmt = ("SELECT count(*) AS n FROM information_schema.columns "
            "WHERE table_name LIKE 'icb_view_%'")

    t0 = time.perf_counter()
    n_cols = eng.sql(stmt).collect()[0].n
    cold_s = time.perf_counter() - t0
    assert n_cols == 3 * n_views, n_cols

    warm = []
    for _ in range(5):
        t0 = time.perf_counter()
        eng.sql(stmt).collect()
        warm.append(time.perf_counter() - t0)
    warm_s = min(warm)

    # same-name swap directly on the SparkSession: digest catches it
    spark.range(1).selectExpr("id AS c0", "id AS extra") \
        .createOrReplaceTempView("icb_view_00000")
    t0 = time.perf_counter()
    n_cols = eng.sql(stmt).collect()[0].n
    swap_s = time.perf_counter() - t0
    assert n_cols == 3 * n_views - 1, n_cols

    t0 = time.perf_counter()
    eng.sql(stmt).collect()
    warm2_s = time.perf_counter() - t0

    print(json.dumps({
        "n_views": n_views,
        "register_s": round(register_s, 3),
        "cold_build_s": round(cold_s, 3),
        "warm_hit_s": round(warm_s, 3),
        "swap_rebuild_s": round(swap_s, 3),
        "warm_after_swap_s": round(warm2_s, 3),
        "speedup_cold_over_warm": round(cold_s / warm_s, 1),
    }))


if __name__ == "__main__":
    main()
