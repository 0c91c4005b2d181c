#!/usr/bin/env python
"""Simulate the driver's CORRECTNESS window for the CURRENT working
tree — the pre-flight check for the oracle-rotation staleness plan.

Prints the 50-slot window's class histogram (0 failed / 1 new /
2 changed-green / 3 unchanged-green), the oldest-round coverage
(which stale cohorts are fully in-window), and any stale query that
would MISS the window. Under the r14 freshness-first ordering
(queries/base.py load_all), green rows rotate by oldest driver
snapshot regardless of anchor churn, so the oldest cohort fits
unless failed/new inflow crowds it — run before closing a round to
confirm the floor advances.

Usage::

    python tools/window_sim.py
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, ".")

from hands_on_trino_iceberg_superset_spark.queries.base import (  # noqa: E402
    REGISTRY,
    _changed_per_query,
    _check_failed,
    _last_driver_check,
    _WINDOW,
    load_all,
)


def main() -> int:
    ordered = list(load_all())
    seen = _last_driver_check()
    changed = _changed_per_query()

    def cls(name: str) -> int:
        if name not in seen:
            return 1
        rnd, rec = seen[name]
        if _check_failed(rec, REGISTRY[name].oracle is not None):
            return 0
        if changed(name, rnd):
            return 2
        return 3

    window = ordered[:_WINDOW]
    in_window = set(window)
    hist = Counter(cls(n) for n in window)
    print(f"window ({_WINDOW} slots): "
          + ", ".join(f"class{c}={hist.get(c, 0)}"
                      for c in (0, 1, 2, 3)))
    print("class 1 (new):",
          sorted(n for n in window if cls(n) == 1))
    print("class 2 (changed):",
          sorted(n for n in window if cls(n) == 2))

    rounds = sorted({r for r, _ in seen.values()})
    ok = True
    for rnd in rounds:
        cohort = [n for n, (r, _) in seen.items() if r == rnd]
        missed = [n for n in cohort if n not in in_window]
        state = "all in-window" if not missed else \
            f"{len(missed)} MISS: {missed}"
        print(f"r{rnd}: {len(cohort)} queries — {state}")
        if missed and rnd == rounds[0]:
            ok = False
    if not ok:
        print("\nWARNING: the OLDEST cohort does not fully fit — the "
              "staleness floor will not advance this round.")
        return 1
    print("\noldest cohort fully in-window; floor advances.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
