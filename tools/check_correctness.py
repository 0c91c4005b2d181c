#!/usr/bin/env python
"""Fast local run of the DuckDB-oracle differential over the full
query inventory. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from hands_on_trino_iceberg_superset_spark.oracle import compare
from hands_on_trino_iceberg_superset_spark.queries import load_all
from hands_on_trino_iceberg_superset_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    inventory = load_all()
    # a typo'd query name must not silently match nothing and print
    # ALL OK with exit 0 — a false pass for any script using this as
    # a gate
    unknown = [q for q in only if q not in inventory]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("check-correctness")
    failures = 0
    for name, spec in inventory.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = compare(spec, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: EXCEPTION {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        oracle = "rows-only" if res.oracle_rows is None else f"oracle={res.oracle_rows}"
        print(f"{status} {name}: spark={res.spark_rows} {oracle} ({dt:.1f}s) {res.detail[:300]}")
        if not res.ok:
            failures += 1
    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
