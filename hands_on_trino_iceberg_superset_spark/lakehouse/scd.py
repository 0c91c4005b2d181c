"""Slowly-changing-dimension (type 2) history construction.

The reference's BI layer (Superset over the seeded ``users`` /
``products`` dimensions, compose/seed.sh:82-105) reads
current-state dimensions; production lakehouses keep the HISTORY —
every attribute change becomes a validity-ranged row so facts join
to the dimension as-of their event time. This module builds that
history from an attribute-snapshot stream with plain window
functions:

- consecutive no-change snapshots are compressed away (a real SCD-2
  table stores transitions, not heartbeats);
- ``valid_from``/``valid_to`` form half-open ranges stitched by
  ``lead()`` over the per-key timeline; the open current row has
  ``valid_to IS NULL`` and ``is_current = true``.

100 TB shape: ONE shuffle keyed by the dimension key; both windows
(change detection, range stitching) ride the same partitioning, so
Catalyst plans a single Exchange. Dimension keys are naturally
high-cardinality, so the shuffle balances; no global sort, no
driver-side state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(
    snapshots: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Build the SCD-2 history from ``snapshots`` (one row per
    (key, ts) observation of the attribute values).

    Returns the input's key + attr columns plus ``valid_from``,
    ``valid_to`` (NULL while current) and ``is_current``. Ties on
    (key, ts) must not occur (snapshot streams are keyed by
    observation time); later duplicates of an unchanged state are
    dropped by the change filter.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        snapshots.withColumn("_prev", F.lag(attrs).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != attrs))
        .drop("_prev")
    )
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
