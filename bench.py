#!/usr/bin/env python
"""Headline benchmark: runs the query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count of the result) after a
warm-up of the session; per-query wall time includes planning +
execution, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.session import get_spark

# queries whose runtime is dominated by toPandas/driver collect or that
# are streaming-shaped are still included: bench measures end-to-end
# materialization via .count() only.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    inventory = load_all()
    spark = get_spark("bench")
    # JVM + session warm-up so query 1 isn't charged for startup:
    # codegen, the vectorized parquet reader, and the Python worker
    # pool (Arrow path) are all engine infrastructure, not per-query
    # work
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    try:
        import pandas as pd  # noqa: F401

        spark.range(10).mapInPandas(
            lambda it: it, "id long"
        ).count()
    except Exception:
        pass

    per_query: dict[str, float] = {}
    for name, spec in inventory.items():
        t0 = time.perf_counter()
        try:
            spec.spark(spark, sf_dir).count()
            per_query[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            per_query[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(v for v in per_query.values() if v >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "inventory_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
