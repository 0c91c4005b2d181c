"""As-of join: for every left row, the most recent right row at or
before it (per key) — the time-series lookup Spark has no built-in
operator for.

Implementation is the scalable "union trick", not a join: tag both
sides, union them, sort within each key by (time, side, tiebreak)
via ONE window, and carry the right side's values forward with
``last(ignorenulls)``. Cost: a single shuffle on the key, state
bounded by the window frame — no per-row range probe, no candidate
blowup when a key has many right rows (a naive
``right.ts <= left.ts`` join is quadratic per key).

Right rows sort BEFORE left rows at equal timestamps, so a
same-instant right row is visible to the left row (standard as-of
semantics; pass ``strict=True`` for exclusive matching).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    order_col: str,
    carry_cols: list[str],
    tiebreak_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """All left columns + ``carry_cols`` from the latest right row
    with ``right.order_col <= left.order_col`` (``<`` if strict),
    matched per ``on`` key; nulls where no prior right row exists.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys and c != order_col]

    # fail loudly instead of silently colliding column names
    overlap = set(carry_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"carry_cols {sorted(overlap)} also exist on the left side; "
            "alias them on the right input first"
        )
    missing = [c for c in carry_cols if c not in right.columns]
    if missing:
        raise ValueError(f"carry_cols {missing} not found on the right side")
    reserved = {"_ord", "_side", "_tb"}
    user_cols = set(left.columns) | set(right.columns)
    bad = sorted(reserved & user_cols) + sorted(
        c for c in user_cols if c.startswith("_c_")
    )
    if bad:
        raise ValueError(
            f"column names {bad} collide with asof_join internals "
            "(_ord/_side/_tb/_c_*); rename them first"
        )

    # a right row with NULL order_col can never satisfy
    # right.order_col <= left.order_col — but the window sorts NULLS
    # FIRST, which would make it "earlier than everything" and carry
    # its values into every left row. Drop such rows up front.
    right = right.where(F.col(order_col).isNotNull())

    l_tagged = left.select(
        *keys,
        F.col(order_col).alias("_ord"),
        F.lit(1).alias("_side"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_c_{c}")
          for c in carry_cols],
    )
    r_tagged = right.select(
        *keys,
        F.col(order_col).alias("_ord"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("_tb"),
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
          for c in lcols],
        *[F.col(c).alias(f"_c_{c}") for c in carry_cols],
    )
    # strict: left rows see only strictly-earlier right rows, so at
    # equal _ord the left row must sort FIRST (side desc)
    side_order = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ord").asc(), side_order, F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        *keys,
        "_ord",
        "_side",
        *lcols,
        *[
            F.last(f"_c_{c}", ignorenulls=True).over(w).alias(c)
            for c in carry_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *keys,
        F.col("_ord").alias(order_col),
        *lcols,
        *carry_cols,
    )
