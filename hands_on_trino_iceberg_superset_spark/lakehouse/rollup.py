"""Continuous aggregates: materialized rollups over an Iceberg event
table, refreshed INCREMENTALLY from snapshot deltas — the
hypertable-rollup / continuous-aggregate pattern (TimescaleDB,
Materialize) rebuilt on Iceberg snapshot semantics.

The rollup is itself an Iceberg table whose properties record the
last source snapshot folded in. ``refresh`` reads ONLY the source
rows appended since then (:meth:`IcebergTable.read_incremental` — an
O(delta) metadata-planned scan), partially aggregates them, and
merges group-wise into the materialized state. Aggregates must be
decomposable (count / sum / min / max — avg derives as sum/count at
query time), which is exactly the restriction every incremental-view
engine imposes.

100 TB design: the source is never rescanned after the initial
build. Each refresh costs O(delta rows) + O(rollup size), and the
rollup is smaller than the source by the group-reduction factor
(hours x dims vs raw events). The merge is one shuffle on the group
keys of the (delta ∪ rollup) union — both sides pre-aggregated.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
    IcebergTable,
)

_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


class ContinuousAggregate:
    """A materialized rollup: ``dims`` are group-by expressions
    (name -> SQL over the source schema), ``aggs`` are decomposable
    aggregates (name -> ("count"|"sum"|"min"|"max", SQL expr))."""

    PROP_SNAP = "rollup.last-source-snapshot-id"
    PROP_SPEC = "rollup.spec"

    def __init__(self, spark: SparkSession, table: IcebergTable,
                 source: IcebergTable):
        self.spark = spark
        self.table = table
        self.source = source

    # ------------------------------------------------------- create

    @classmethod
    def create(
        cls,
        source: IcebergTable,
        path: str,
        dims: dict[str, str],
        aggs: dict[str, tuple[str, str]],
    ) -> "ContinuousAggregate":
        bad = [k for k, (fn, _e) in aggs.items() if fn not in _MERGE]
        if bad:
            raise ValueError(
                f"non-decomposable aggregates {bad}; supported: "
                f"{sorted(_MERGE)}"
            )
        snap_id = source._snapshot(None, None)["snapshot-id"]
        state = cls._aggregate(source.read(), dims, aggs)
        table = IcebergTable.create(
            source.spark, path, state,
            properties={
                cls.PROP_SNAP: str(snap_id),
                cls.PROP_SPEC: json.dumps(
                    {"dims": dims, "aggs": aggs}
                ),
            },
        )
        return cls(source.spark, table, source)

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             source: IcebergTable) -> "ContinuousAggregate":
        return cls(spark, IcebergTable.load(spark, path), source)

    # ---------------------------------------------------- internals

    @staticmethod
    def _aggregate(df: DataFrame, dims: dict[str, str],
                   aggs: dict[str, tuple[str, str]]) -> DataFrame:
        proj = df.select(
            *[F.expr(e).alias(n) for n, e in dims.items()],
            *[F.expr(e).alias(f"__in_{n}")
              for n, (_fn, e) in aggs.items()],
        )
        calls = []
        for n, (fn, _e) in aggs.items():
            col = F.col(f"__in_{n}")
            if fn == "count":
                calls.append(F.count(col).alias(n))
            else:
                calls.append(getattr(F, fn)(col).alias(n))
        return proj.groupBy(*dims).agg(*calls)

    @property
    def spec(self) -> dict:
        return json.loads(
            self.table.meta.get("properties", {})[self.PROP_SPEC]
        )

    @property
    def last_source_snapshot(self) -> int:
        return int(
            self.table.meta.get("properties", {})[self.PROP_SNAP]
        )

    # ------------------------------------------------------ refresh

    def refresh(self) -> int:
        """Fold appended source rows into the rollup. Returns the
        delta row count (0 = nothing to do, no new rollup snapshot).
        Overwrite snapshots in the source range raise — a rollup over
        retracted rows needs a rebuild, not a silent wrong answer."""
        spec = self.spec
        dims, aggs = spec["dims"], spec["aggs"]
        last = self.last_source_snapshot
        head = self.source._snapshot(None, None)["snapshot-id"]
        if head == last:
            return 0
        last_seq = [x["sequence-number"] for x in self.source.snapshots()
                    if x["snapshot-id"] == last]
        if not last_seq:
            raise ValueError(
                f"last folded source snapshot {last} has been expired "
                "from the source; the delta range is gone — rebuild "
                "the rollup"
            )
        retracts = [
            s for s in self.source.snapshots()
            if s["sequence-number"] > last_seq[0]
            and s.get("summary", {}).get("operation") != "append"
        ]
        if retracts:
            raise ValueError(
                "source range contains non-append snapshots "
                f"({[s['snapshot-id'] for s in retracts]}); "
                "rebuild the rollup instead of refreshing"
            )
        delta = self.source.read_incremental(last, head)
        n = delta.count()
        if n == 0:
            self._advance(head)
            return 0
        delta_agg = self._aggregate(delta, dims, aggs)
        schema = self.table.spark_schema()
        merged = (
            self.table.read().unionByName(
                delta_agg.select(*[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ])
            )
            .groupBy(*dims)
            .agg(*[
                getattr(F, _MERGE[fn])(F.col(name)).alias(name)
                for name, (fn, _e) in aggs.items()
            ])
            # re-aggregation widens decimals (sum(dec(p,s)) -> p+10);
            # pin the rollup's declared schema so the fold is stable
            # across arbitrarily many refreshes
            .select(*[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ])
        )
        # the rollup is group-cardinality-sized: a full rewrite is
        # the cheap side of this trade (the SOURCE is never rescanned).
        # The progress pointer advances in the SAME metadata commit as
        # the fold — two commits would leave a crash window in which
        # the delta is folded but not recorded, and the next refresh
        # would fold it AGAIN (doubled counts)
        self.table._commit_file_rewrite(
            merged, [], self.table.plan_scan().files, "rollup-refresh",
            carry_deletes=False,
            properties={self.PROP_SNAP: str(head)},
        )
        return n

    def _advance(self, head: int) -> None:
        props = dict(self.table.meta.get("properties", {}))
        props[self.PROP_SNAP] = str(head)
        self.table.meta["properties"] = props
        now = self.table.meta["last-updated-ms"]
        self.table._write_metadata_version(
            len(self.table.meta.get("metadata-log", [])) + 1, now
        )

    def read(self) -> DataFrame:
        return self.table.read()
