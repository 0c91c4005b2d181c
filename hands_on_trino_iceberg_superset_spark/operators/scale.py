"""Scale utilities: storage-level co-location and skew mitigation.

Two knobs that matter at 100 TB and are invisible at test scale:

- **Bucketing** (:func:`write_bucketed`): pre-shuffle a table into
  N hash buckets on its join/agg key at write time. Two tables
  bucketed the same way join with ZERO exchanges — the shuffle was
  paid once at ingest instead of per query.
  ``tests/test_scale.py`` asserts the exchange-free plan.
- **Salting** (:func:`salted_join`): a hot key (null user, default
  id, boilerplate doc) makes one shuffle partition arbitrarily
  large. Salting splits each key into ``n_salts`` sub-keys —
  replicating the build side ``n_salts``x — restoring parallelism
  at the cost of a bounded fan-out. AQE's skew-join handles the
  sort-merge case at runtime; explicit salting is for when the
  skew is known and extreme (or the join is broadcast-ineligible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on
    ``bucket_cols``. Joins/aggregations keyed on the bucket columns
    between same-bucketed tables skip their exchanges (and with
    ``sort_cols``, the sort)."""
    writer = (
        df.write.format(file_format)
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_on: str = "content",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) ``left`` side
    gets a per-row salt; the ``right`` side is replicated across all
    ``n_salts`` values; the join key becomes (key, salt), spreading
    each hot key over ``n_salts`` partitions.

    Result is identical to ``left.join(right, key, how)`` for inner
    and left joins (every right row exists under every salt). When
    both sides name the key identically, the right-side copy is
    dropped from the output (plain-equi-join column shape).

    ``salt_on`` picks the salt derivation:

    - ``"content"`` (default): ``xxhash64`` over every left column —
      fully DETERMINISTIC, so a partial stage retry re-salts each row
      identically and can never duplicate or drop join rows. Spreads
      a hot key whenever its rows differ in any column (the usual
      null-key/default-id skew). Fully-identical duplicate rows share
      a salt and stay in one partition — correct, just unspread.
    - ``"rowid"``: ``monotonically_increasing_id() % n_salts`` —
      spreads even byte-identical duplicate rows (the boilerplate-doc
      case), but the id depends on partition layout, so the LEFT
      INPUT MUST BE A DETERMINISTIC SCAN (e.g. a parquet read with a
      fixed split layout): if the left is itself shuffled output, a
      partial map-output recomputation can re-salt rows into
      different sub-keys and corrupt the join under task retries.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    if salt_on not in ("content", "rowid"):
        raise ValueError("salt_on must be 'content' or 'rowid'")
    if "_salt" in left.columns or "_salt" in right.columns:
        # withColumn would silently REPLACE a caller's _salt column
        # and the drops below would erase it from the result
        raise ValueError(
            "column '_salt' collides with salted_join internals; "
            "rename it first"
        )
    if salt_on == "content":
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                      F.lit(n_salts))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    salted_left = left.withColumn("_salt", salt)
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    # dataframe-qualified key refs: F.col(key) would raise
    # AMBIGUOUS_REFERENCE whenever left_key == right_key
    out = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["_salt"] == salted_right["_salt"]),
        how,
    )
    out = out.drop(salted_left["_salt"]).drop(salted_right["_salt"])
    if left_key == right_key:
        out = out.drop(salted_right[right_key])
    return out


def range_bucket_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 5,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Banded range join (``fact.value in [lo, hi)``) rewritten as an
    EQUI join through coarse buckets.

    A naive range join has no equality conjunct, so Spark plans a
    nested-loop join — O(facts x ranges) comparisons even when both
    sides are indexed by the same axis. The standard fix: explode
    each range into the ``bucket_width``-sized buckets it overlaps
    (``floor(lo/w) .. floor((hi-1)/w)``), map each fact row to its
    single bucket, equi-join on the bucket id, and re-apply the
    exact range as a residual filter. The hash join does the heavy
    lifting; each fact row meets only the ranges that share its
    bucket (ranges overlapping b buckets replicate b times — bounded
    fan-out on the SMALL side, chosen via ``bucket_width``).

    Half-open ``[lo, hi)`` semantics; the ranges side keeps its
    other columns. Same shape Databricks/Spark docs recommend for
    interval joins; at 100 TB the facts side is never replicated and
    never shuffled beyond the join itself. ``broadcast_ranges=False``
    falls back to a shuffled hash join on the bucket id for a ranges
    side too large to broadcast (the exploded side still bounds its
    own fan-out via ``bucket_width``).
    """
    w = bucket_width
    # temp bucket column name uniquified against BOTH inputs so a
    # caller whose frames already carry "_bkt" can't collide
    bkt = "_bkt"
    taken = set(facts.columns) | set(ranges.columns)
    while bkt in taken:
        bkt += "_"
    # upper bucket is floor(hi/w) — NOT floor((hi-1)/w), which is
    # only right for integer bounds: with hi=10.2, w=5 a fact at
    # 10.0 lives in bucket 2 while floor(9.2/5)=1 would never emit
    # it. When hi is an exact multiple this overshoots by one empty
    # bucket; the residual range predicate makes that harmless.
    r = ranges.withColumn(
        bkt,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w),
                F.floor(F.col(hi_col) / w),
            )
        ),
    )
    f = facts.withColumn(bkt, F.floor(F.col(value_col) / w))
    if broadcast_ranges:
        r = F.broadcast(r)
    # dataframe-qualified refs throughout: facts may legitimately
    # carry a column named lo_col/hi_col (and vice versa), which an
    # unqualified F.col would make AMBIGUOUS_REFERENCE
    out = f.join(
        r,
        (f[bkt] == r[bkt])
        & (f[value_col] >= r[lo_col])
        & (f[value_col] < r[hi_col]),
    )
    return out.drop(f[bkt]).drop(r[bkt])
