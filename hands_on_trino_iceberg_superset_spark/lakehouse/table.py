"""Copy-on-write versioned tables on plain Parquet — the lakehouse
core the reference gets from Iceberg-on-Nessie
(``/root/reference/compose/trino/catalog/iceberg.properties:1-19``):
snapshot isolation, time travel, and row-level DML
(DELETE / UPDATE / MERGE), restated Spark-first without the Iceberg
runtime jar (not present in this environment).

Layout (Iceberg-shaped, one JSON manifest per snapshot)::

    <root>/
      _snapshots/v00000001.json   {version, ts, op, entries: {pk: dir}}
      data/v00000001/<pk>/*.parquet

A snapshot's ``entries`` maps a partition key (or ``__all__`` for
unpartitioned tables) to the data directory holding that partition's
rows. Copy-on-write DML rewrites ONLY the partitions that contain
affected rows; untouched partitions carry over by reference into the
new manifest — at 100 TB a MERGE touching one day of an
event-partitioned table rewrites one partition, not the table.
Partition values live inside the files (value-homogeneous files, so
Parquet min/max stats give scan pruning) and in the manifest (so DML
prunes rewrites without listing data).

Commits are atomic single-writer: the manifest is written to a temp
name and ``os.rename``d into place (POSIX atomic), and the snapshot
counter advances monotonically. Concurrent multi-writer commits need
the compare-and-swap a real catalog provides (Nessie/Hive/REST in
Iceberg's case); that seam is ``_commit`` and is documented as such.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import urllib.parse
from dataclasses import dataclass, field
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

_UNPARTITIONED = "__all__"


@dataclass(frozen=True)
class Snapshot:
    version: int
    ts: str
    op: str
    entries: dict[str, str]  # partition key -> data dir (relative)
    row_count: int
    # schema evolution ledger: [name, type, default_sql, added_version]
    # per column added after table creation (metadata-only ALTER —
    # Iceberg-style; no data rewrite). Older manifests lack the field.
    added_cols: list = field(default_factory=list)
    # per-entry row counts (Iceberg manifest-stats style): lets a DML
    # commit derive the new row_count as carried + written without
    # re-scanning carried partitions. Manifests written before this
    # field exist without it; readers fall back to counting.
    entry_rows: dict = field(default_factory=dict)


class VersionedTable:
    """Handle to a versioned table rooted at ``path``.

    ``branch`` selects a named ref (Nessie-style, the reference pins
    ``iceberg.nessie-catalog.ref=main``, ``iceberg.properties:6``):
    every branch is its own manifest chain under ``_branches/<name>``
    (``main`` is the root chain at ``_snapshots/``), all branches
    SHARE data directories — branching is O(1) metadata, exactly the
    git-like model Nessie provides. See :meth:`create_branch` /
    :meth:`merge_branch`.
    """

    def __init__(self, spark: SparkSession, path: str,
                 partition_col: str | None = None,
                 branch: str = "main") -> None:
        self.spark = spark
        self.path = path
        self.partition_col = partition_col
        self.branch = branch

    # ------------------------------------------------------- creation

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        partition_col: str | None = None,
    ) -> "VersionedTable":
        """Create snapshot v1 from ``df`` (overwrites any existing
        table at ``path``)."""
        import shutil

        t = cls(spark, path, partition_col)
        os.makedirs(t._snap_dir, exist_ok=True)
        for f in os.listdir(t._snap_dir):
            os.remove(os.path.join(t._snap_dir, f))
        # a re-created table invalidates refs into the old history
        shutil.rmtree(os.path.join(path, "_branches"), ignore_errors=True)
        # old data dirs are unreferenced once the manifests are gone;
        # leaving them would leak storage forever (expire_snapshots
        # only reclaims dirs referenced by dropped manifests)
        shutil.rmtree(os.path.join(path, "data"), ignore_errors=True)
        entries, n, rows = t._write_data(df, 1)
        t._commit(Snapshot(1, _now(), "create", entries, n,
                           entry_rows=rows))
        return t

    # -------------------------------------------------------- reading

    def read(self, version: int | None = None,
             as_of: str | None = None) -> DataFrame:
        """Current state, or time travel: ``version=N`` reads snapshot
        N (``VERSION AS OF``), ``as_of='<iso ts>'`` the latest
        snapshot committed at or before that time (``TIMESTAMP AS
        OF``).

        Schema evolution: data dirs written before a column was added
        (metadata-only ALTER, see :meth:`add_column`) lack it on
        disk; they are read grouped by write-version and the missing
        columns filled with their recorded defaults — one grouped
        union, no file rewrite ever happens for an ADD COLUMN.
        """
        snap = self._resolve(version, as_of)
        if not snap.entries:
            raise ValueError(f"snapshot v{snap.version} is empty")
        if not snap.added_cols:
            dirs = [os.path.join(self.path, d) for d in snap.entries.values()]
            return self.spark.read.parquet(*dirs)
        # group dirs by data-write version; fill columns added later
        by_ver: dict[int, list[str]] = {}
        for d in snap.entries.values():
            by_ver.setdefault(_data_version(d), []).append(
                os.path.join(self.path, d)
            )
        parts = []
        for ver, dirs in sorted(by_ver.items()):
            df = self.spark.read.parquet(*dirs)
            for name, dtype, default_sql, added_v in snap.added_cols:
                if added_v > ver:
                    fill = (
                        F.expr(default_sql) if default_sql is not None
                        else F.lit(None)
                    )
                    df = df.withColumn(name, fill.cast(dtype))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def add_column(
        self, name: str, dtype: str, default_sql: str | None = None
    ) -> Snapshot:
        """Metadata-only ALTER TABLE ADD COLUMN (Iceberg-style schema
        evolution): no data file is touched. Existing rows read back
        with ``default_sql`` (an expression evaluated per row at read
        time; ``None`` -> NULL); rows written from now on carry the
        column physically."""
        cur = self.current()
        existing = {c[0] for c in cur.added_cols} | set(self.read().columns)
        if name in existing:
            raise ValueError(f"column {name} already exists")
        v = cur.version + 1
        return self._commit(
            Snapshot(
                v, _now(), "add_column", dict(cur.entries), cur.row_count,
                added_cols=[*cur.added_cols, [name, dtype, default_sql, v]],
                entry_rows=dict(cur.entry_rows),
            )
        )

    def export_iceberg(self, path: str):
        """Materialize the current snapshot as a REAL Iceberg v2
        table (spec metadata.json + Avro manifests, written by
        :mod:`.iceberg`) — the migration path OUT of this bespoke
        manifest format into something any Iceberg reader can adopt.
        One distributed rewrite of the live data; history does not
        carry over (the export is a fresh table at snapshot 1)."""
        from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
            IcebergTable,
        )

        return IcebergTable.create(
            self.spark, path, self.read(), partition_by=self.partition_col
        )

    def compact(self) -> Snapshot:
        """Small-file/partition-fragment compaction (the
        ``rewrite_data_files`` maintenance op): partitions split
        across multiple dirs by appends are rewritten into one dir
        each; single-dir partitions carry over untouched. Row-for-row
        identical state, one new snapshot."""
        cur = self.current()
        v = cur.version + 1
        frag: dict[str, list[str]] = {}
        for pk, d in cur.entries.items():
            frag.setdefault(_pk_base(pk), []).append(d)
        entries = {}
        changed = False
        for base, dirs in frag.items():
            if len(dirs) == 1:
                entries[base] = dirs[0]
                continue
            changed = True
            # fragments can carry different physical schemas (written
            # before/after an ADD COLUMN): fill each to the logical
            # schema before merging, so the compacted file is whole
            pieces = []
            for d in dirs:
                df = self.spark.read.parquet(os.path.join(self.path, d))
                ver = _data_version(d)
                for name, dtype, default_sql, added_v in cur.added_cols:
                    if added_v > ver:
                        fill = (
                            F.expr(default_sql) if default_sql is not None
                            else F.lit(None)
                        )
                        df = df.withColumn(name, fill.cast(dtype))
                pieces.append(df)
            merged = pieces[0]
            for p in pieces[1:]:
                merged = merged.unionByName(p)
            rel = f"data/v{v:08d}-{_write_token()}/{base}"
            merged.write.mode("overwrite").parquet(
                os.path.join(self.path, rel)
            )
            entries[base] = rel
        if not changed:
            return cur
        rev = {d: pk for pk, d in cur.entries.items()}
        entry_rows = {}
        for base, d in entries.items():
            frags = frag[base]
            if all(rev[f] in cur.entry_rows for f in frags):
                entry_rows[base] = sum(
                    cur.entry_rows[rev[f]] for f in frags
                )
        return self._commit(
            Snapshot(v, _now(), "compact", entries, cur.row_count,
                     added_cols=list(cur.added_cols),
                     entry_rows=entry_rows)
        )

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Garbage collection (Iceberg's ``expire_snapshots``): drop
        all but the newest ``keep_last`` snapshot manifests and
        delete every data dir no surviving snapshot references.
        Returns the expired version numbers. Time travel to expired
        versions stops working — that is the point (bounded storage);
        the current state is untouched.
        """
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self.snapshots()
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        if not drop:
            return []
        live_dirs = {d for sn in keep for d in sn.entries.values()}
        # data dirs are SHARED across branches (create_branch is
        # metadata-only): anything any other branch's history still
        # references is live, whatever this branch's retention says
        for other in self.branches():
            if other == self.branch:
                continue
            for sn in self.checkout(other).snapshots():
                live_dirs |= set(sn.entries.values())
        dead_dirs = {
            d for sn in drop for d in sn.entries.values()
        } - live_dirs
        for d in dead_dirs:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        for sn in drop:
            os.remove(
                os.path.join(self._snap_dir, f"v{sn.version:08d}.json")
            )
        # clean now-empty version dirs under data/
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for vd in os.listdir(data_root):
                full = os.path.join(data_root, vd)
                if os.path.isdir(full) and not os.listdir(full):
                    os.rmdir(full)
        return [sn.version for sn in drop]

    def snapshots(self) -> list[Snapshot]:
        # only committed manifests count: a crashed _commit can leave
        # a *.tmp behind (mkstemp + rename publish), and reading it
        # would either crash every subsequent call (partial JSON) or
        # resurface a phantom snapshot (fully written, never renamed)
        out = []
        for name in sorted(os.listdir(self._snap_dir)):
            if not re.fullmatch(r"v\d{8}\.json", name):
                continue
            with open(os.path.join(self._snap_dir, name)) as fh:
                j = json.load(fh)
            out.append(Snapshot(**j))
        return out

    def current(self) -> Snapshot:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(f"no snapshots at {self.path}")
        self._check_layout(snaps[-1])
        return snaps[-1]

    def _check_layout(self, snap: "Snapshot") -> None:
        """partition_col is load-bearing handle state: a handle
        opened with the WRONG value would silently no-op deletes
        (touched keys never match '__all__' entries) or duplicate
        rows on update. Validate it against the manifest's entry
        shape before any DML uses it."""
        keys = {_pk_base(k) for k in snap.entries}
        keys.discard("__empty__")
        if not keys:
            return
        is_unpart = keys == {_UNPARTITIONED}
        if is_unpart and self.partition_col is not None:
            raise ValueError(
                f"table at {self.path} is unpartitioned but this "
                f"handle was opened with partition_col="
                f"{self.partition_col!r}"
            )
        if not is_unpart and self.partition_col is None:
            raise ValueError(
                f"table at {self.path} is partitioned but this "
                "handle was opened without partition_col"
            )

    # ------------------------------------------------------------ DML

    def append(self, df: DataFrame) -> Snapshot:
        """Blind append: new files only, no existing partition is
        rewritten (append-heavy ingest stays O(new data)). The input
        must carry the table's full logical schema (including
        evolved columns) — new files are never backfilled."""
        cur = self.current()
        want = set(self.read().columns)
        got = set(df.columns)
        if got != want:
            raise ValueError(
                f"append schema mismatch: missing {sorted(want - got)}, "
                f"unexpected {sorted(got - want)}"
            )
        v = cur.version + 1
        new_entries, n_new, new_rows = self._write_data(df, v)
        entries = dict(cur.entries)
        entry_rows = dict(cur.entry_rows)
        for pk, d in new_entries.items():
            key = f"{pk}@v{v}" if pk in entries else pk
            entries[key] = d
            entry_rows[key] = new_rows[pk]
        return self._commit(
            Snapshot(v, _now(), "append", entries, cur.row_count + n_new,
                     added_cols=list(cur.added_cols),
                     entry_rows=entry_rows),
            base=cur,
            touched={_pk_base(k) for k in new_entries},
            mode="add",
        )

    def delete(self, predicate: str | Column) -> Snapshot:
        """Row-level DELETE (rows where the predicate is TRUE are
        removed; NULL keeps the row, matching SQL DELETE semantics).
        Copy-on-write at partition granularity."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._rewrite(
            op="delete",
            affected=pred,
            transform=lambda part: part.where(~pred.eqNullSafe(F.lit(True))),
        )

    def update(self, assignments: dict[str, str | Column],
               where: str | Column) -> Snapshot:
        """Row-level UPDATE ... SET, copy-on-write at partition
        granularity."""
        pred = F.expr(where) if isinstance(where, str) else where

        def apply(part: DataFrame) -> DataFrame:
            cols = []
            for name in part.columns:
                if name in assignments:
                    a = assignments[name]
                    val = F.expr(a) if isinstance(a, str) else a
                    cols.append(
                        F.when(pred.eqNullSafe(F.lit(True)), val)
                        .otherwise(F.col(name)).alias(name)
                    )
                else:
                    cols.append(F.col(name))
            return part.select(*cols)

        return self._rewrite(op="update", affected=pred, transform=apply)

    def merge(
        self,
        source: DataFrame,
        on: str,
        when_matched_update: dict[str, str] | None = None,
        when_matched_delete: str | None = None,
        insert_not_matched: bool = True,
    ) -> Snapshot:
        """MERGE INTO target USING source ON target.<on> = source.<on>
        — the upsert primitive Iceberg enables. Matched rows are
        updated (or deleted when ``when_matched_delete`` predicate
        holds on the source row); unmatched source rows are inserted.
        Partitions containing no matched keys and receiving no
        inserts carry over untouched.

        The source must have non-NULL, unique merge keys — the same
        contract SQL MERGE enforces (a NULL key joins nothing and
        would be misclassified; a duplicate key matches one target
        row twice, which ANSI MERGE rejects with a cardinality
        violation). Validated up front with one aggregate over the
        source; violations raise instead of corrupting the table.
        """
        if when_matched_update and on in when_matched_update:
            # rewriting the merge key would strand the updated rows:
            # touched-partition discovery semi-joins on the ORIGINAL
            # key values, so a row whose key changes matches no
            # partition and silently vanishes. SQL engines commonly
            # restrict this too; refuse loudly.
            raise ValueError(
                f"MERGE cannot update the merge key {on!r} itself"
            )
        key_stats = source.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(on).alias("n_nonnull"),
            F.countDistinct(on).alias("n_distinct"),
        ).collect()[0]
        if key_stats["n"] != key_stats["n_nonnull"]:
            raise ValueError(
                f"MERGE source has {key_stats['n'] - key_stats['n_nonnull']} "
                f"NULL value(s) in merge key '{on}'"
            )
        if key_stats["n_nonnull"] != key_stats["n_distinct"]:
            raise ValueError(
                f"MERGE source has duplicate values in merge key '{on}' "
                f"({key_stats['n_nonnull']} rows, "
                f"{key_stats['n_distinct']} distinct keys)"
            )
        cur = self.current()
        v = cur.version + 1
        target = self.read()
        t, s = target.alias("t"), source.alias("s")
        joined = t.join(s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer")
        matched = F.col(f"t.{on}").isNotNull() & F.col(f"s.{on}").isNotNull()
        t_only = F.col(f"s.{on}").isNull()

        out_cols = []
        for name in target.columns:
            upd = (when_matched_update or {}).get(name)
            if upd is not None:
                val = F.when(matched, F.expr(upd)).otherwise(F.col(f"t.{name}"))
            else:
                val = F.col(f"t.{name}")
            src_val = F.col(f"s.{name}") if name in source.columns else F.lit(None)
            out_cols.append(
                F.when(t_only | matched, val).otherwise(src_val).alias(name)
            )
        keep = F.lit(True)
        if when_matched_delete is not None:
            keep = ~(matched & F.expr(when_matched_delete).eqNullSafe(F.lit(True)))
        if not insert_not_matched:
            # source-only rows: no target match. Source keys are
            # validated non-NULL above, so a NULL t.<on> alone does
            # NOT mean source-only — a target row whose own key is
            # NULL also joins nothing and must be kept.
            keep = keep & ~(
                F.col(f"t.{on}").isNull() & F.col(f"s.{on}").isNotNull()
            )
        merged = joined.where(keep).select(*out_cols)

        if self.partition_col is None:
            entries, n, rows = self._write_data(merged, v)
            return self._commit(
                Snapshot(v, _now(), "merge", entries, n,
                         added_cols=list(cur.added_cols),
                         entry_rows=rows),
                base=cur, touched={_UNPARTITIONED},
            )

        # partition-granular COW: rewrite the partitions that held a
        # matched key (rows may leave them) plus the partitions where
        # affected rows land post-merge (updates may move rows across
        # partitions; inserts create/extend partitions); the rest
        # carry over by reference
        pc = self.partition_col
        affected_keys = source.select(on).distinct()
        old_parts = (
            target.join(affected_keys, on, "left_semi").select(pc).distinct()
        )
        new_parts = (
            merged.join(affected_keys, on, "left_semi").select(pc).distinct()
        )
        touched = old_parts.union(new_parts).distinct()
        touched_vals = [r[pc] for r in touched.collect()]
        touched_keys = {_pk(v_) for v_ in touched_vals}
        changed = merged.where(_partition_membership(pc, touched_vals))
        entries_new, _, rows_new = self._write_data(
            changed, v, only_keys=touched_keys
        )
        entries = {
            pk: d for pk, d in cur.entries.items()
            if _pk_base(pk) not in touched_keys
        }
        entry_rows = {
            pk: cur.entry_rows[pk] for pk in entries
            if pk in cur.entry_rows
        }
        entries.update(entries_new)
        entry_rows.update(rows_new)
        n = self._total_rows(entries, entry_rows)
        if n is None:  # pre-stats carried entries: count once
            n = self._count_entries(
                Snapshot(v, _now(), "merge", entries, -1)
            )
        return self._commit(
            Snapshot(v, _now(), "merge", entries, n,
                     added_cols=list(cur.added_cols),
                     entry_rows=entry_rows),
            base=cur, touched=touched_keys,
        )

    # ------------------------------------------------------- branching

    def create_branch(self, name: str) -> "VersionedTable":
        """Fork a named branch at the current head — O(1) metadata,
        no data is copied (branches share data dirs, the Nessie
        model). Returns a handle bound to the new branch; commits on
        it never move this branch's head."""
        if not re.fullmatch(r"[A-Za-z0-9_\-]+", name) or name == "main":
            raise ValueError(f"invalid branch name {name!r}")
        head = self.current()
        bdir = os.path.join(self.path, "_branches", name)
        os.makedirs(os.path.dirname(bdir), exist_ok=True)
        os.makedirs(bdir)  # FileExistsError if the branch exists
        with open(os.path.join(bdir, f"v{head.version:08d}.json"), "w") as fh:
            json.dump(head.__dict__, fh)
        with open(os.path.join(bdir, "_meta.json"), "w") as fh:
            json.dump(
                {
                    "from_branch": self.branch,
                    "base": head.__dict__,
                },
                fh,
            )
        return VersionedTable(
            self.spark, self.path, self.partition_col, branch=name
        )

    def checkout(self, name: str) -> "VersionedTable":
        """Handle bound to an existing branch (or ``main``)."""
        if name != "main" and not os.path.isdir(
            os.path.join(self.path, "_branches", name)
        ):
            raise ValueError(f"no branch {name!r}")
        return VersionedTable(
            self.spark, self.path, self.partition_col, branch=name
        )

    def branches(self) -> list[str]:
        root = os.path.join(self.path, "_branches")
        extra = sorted(os.listdir(root)) if os.path.isdir(root) else []
        return ["main", *extra]

    def drop_branch(self, name: str) -> None:
        """Delete a branch ref (metadata only; shared data dirs stay
        — they belong to whatever snapshots still reference them)."""
        import shutil

        if name == "main":
            raise ValueError("cannot drop main")
        shutil.rmtree(os.path.join(self.path, "_branches", name))

    def merge_branch(self, name: str) -> Snapshot:
        """Three-way merge of branch ``name`` into THIS branch at
        partition granularity (git-like, the capability the
        reference's Nessie catalog holds in reserve).

        The merge base is the manifest recorded at branch creation.
        A partition modified on both sides since the base is a
        genuine conflict and raises; otherwise each side's changes
        land (branch-touched partitions adopt the branch's entries,
        everything else keeps this branch's). Schema evolution merges
        the same way: evolved on one side only. The final publish
        goes through the optimistic :meth:`_commit` with the
        branch-touched partitions as the guarded set, so a racing
        writer on this branch triggers the normal rebase/conflict
        path.
        """
        bdir = os.path.join(self.path, "_branches", name)
        with open(os.path.join(bdir, "_meta.json")) as fh:
            meta = json.load(fh)
        if meta["from_branch"] != self.branch:
            raise ValueError(
                f"branch {name!r} was forked from {meta['from_branch']!r}, "
                f"not {self.branch!r}"
            )
        base = Snapshot(**meta["base"])
        b_head = self.checkout(name).current()
        head = self.current()

        def by_base(entries: dict[str, str]) -> dict[str, frozenset]:
            out: dict[str, set] = {}
            for k, d in entries.items():
                out.setdefault(_pk_base(k), set()).add((k, d))
            return {k: frozenset(v) for k, v in out.items()}

        base_by, head_by, br_by = (
            by_base(base.entries), by_base(head.entries),
            by_base(b_head.entries),
        )
        all_keys = set(base_by) | set(head_by) | set(br_by)
        # the delete-all sentinel holds zero rows — two branches each
        # emptying (or having emptied) the table cannot conflict ON
        # THE SENTINEL; real conflicts surface on the real partition
        # keys both sides touched
        all_keys.discard("__empty__")
        br_touched = {
            bk for bk in all_keys
            if br_by.get(bk, frozenset()) != base_by.get(bk, frozenset())
        }
        main_touched = {
            bk for bk in all_keys
            if head_by.get(bk, frozenset()) != base_by.get(bk, frozenset())
        }
        conflicts = sorted(br_touched & main_touched)
        if conflicts:
            raise RuntimeError(
                f"merge conflict: partition(s) {conflicts} modified on "
                f"both {self.branch!r} and {name!r} since the fork"
            )
        br_evolved = b_head.added_cols != base.added_cols
        main_evolved = head.added_cols != base.added_cols
        if br_evolved and main_evolved:
            raise RuntimeError(
                "merge conflict: schema evolved on both branches"
            )
        added_cols = b_head.added_cols if br_evolved else head.added_cols

        entries = {
            k: d for k, d in head.entries.items()
            if _pk_base(k) not in br_touched
        }
        entry_rows = {
            k: head.entry_rows[k] for k in entries
            if k in head.entry_rows
        }
        for k, d in b_head.entries.items():
            if _pk_base(k) in br_touched:
                entries[k] = d
                if k in b_head.entry_rows:
                    entry_rows[k] = b_head.entry_rows[k]
        if not entries:
            # a branch that emptied the table merges to zero real
            # entries; adopt one side's delete-all sentinel so the
            # merged snapshot stays readable (schema lives in its
            # parquet footer)
            for side in (b_head, head):
                for k, d in side.entries.items():
                    if _pk_base(k) == "__empty__":
                        entries[k] = d
                        entry_rows[k] = 0
                        break
                if entries:
                    break
        v = head.version + 1
        n = self._total_rows(entries, entry_rows)
        if n is None:
            n = self._count_entries(
                Snapshot(v, _now(), f"merge_branch:{name}", entries, -1)
            )
        return self._commit(
            Snapshot(v, _now(), f"merge_branch:{name}", entries, n,
                     added_cols=list(added_cols),
                     entry_rows=entry_rows),
            base=head, touched=br_touched,
        )

    # ------------------------------------------------------- internals

    @property
    def _snap_dir(self) -> str:
        if self.branch == "main":
            return os.path.join(self.path, "_snapshots")
        return os.path.join(self.path, "_branches", self.branch)

    def _resolve(self, version: int | None, as_of: str | None) -> Snapshot:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError(f"no snapshots at {self.path}")
        if version is not None:
            for sn in snaps:
                if sn.version == version:
                    return sn
            raise ValueError(f"no snapshot v{version} at {self.path}")
        if as_of is not None:
            eligible = [sn for sn in snaps if sn.ts <= as_of]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of}")
            return eligible[-1]
        return snaps[-1]

    def _write_data(
        self, df: DataFrame, version: int,
        only_keys: set[str] | None = None,
    ) -> tuple[dict[str, str], int, dict[str, int]]:
        """Write ``df`` under ``data/v{version}/``, one dir per
        partition value (or a single dir when unpartitioned).
        Returns (entries, row_count, rows_per_entry) — the per-entry
        counts become manifest stats so later commits can derive
        row_count without re-scanning carried partitions.

        Partitioned writes are ONE Spark job: the partition value is
        duplicated into a ``__pk`` dir column (``partitionBy`` strips
        the dir column from the files, so the duplicate keeps the
        real column physically present — the value-in-file layout
        read() and the scan-pruning story rely on), and the Hive-style
        ``__pk=<value>`` dirs are mapped into manifest entries
        afterwards. A per-partition write loop would be one job per
        value — a non-starter at real partition counts.
        """
        # the write root carries a unique token: two optimistic
        # writers racing from the same base would otherwise both
        # target data/v{N} and the second mode=overwrite write would
        # clobber the first writer's files before either commits
        rel = f"data/v{version:08d}-{_write_token()}"
        if self.partition_col is None:
            d = os.path.join(self.path, rel, _UNPARTITIONED)
            df.write.mode("overwrite").parquet(d)
            if not any(f.endswith(".parquet") for f in os.listdir(d)):
                # delete-all: empty tasks emit no part files, and a
                # part-less dir cannot be read back (no schema) —
                # write one empty footer-bearing file
                df.limit(0).repartition(1).write.mode(
                    "overwrite"
                ).parquet(d)
            n = self.spark.read.parquet(d).count()
            return (
                {_UNPARTITIONED: f"{rel}/{_UNPARTITIONED}"},
                n,
                {_UNPARTITIONED: n},
            )
        pc = self.partition_col
        out_root = os.path.join(self.path, rel)
        (
            df.withColumn("__pk", F.col(pc))
            .write.mode("overwrite")
            .partitionBy("__pk")
            .parquet(out_root)
        )
        entries: dict[str, str] = {}
        for name in os.listdir(out_root):
            if not name.startswith("__pk="):
                continue
            # dir name -> partition key; str() round-trips for the
            # string/int partition values this layout targets
            raw = urllib.parse.unquote(name[len("__pk="):])
            val = None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
            pk = _pk(val)
            full = os.path.join(out_root, name)
            if only_keys is not None and pk not in only_keys:
                import shutil

                shutil.rmtree(full, ignore_errors=True)
                continue
            entries[pk] = f"{rel}/{name}"
        if not entries:
            if only_keys is not None:
                # a rewrite emptied every touched partition; whether
                # the TABLE is empty is the caller's bookkeeping
                # (carried entries may remain) — but if nothing else
                # survives either, a part-less snapshot would brick
                # read()/append() (no schema source), so leave a
                # sentinel empty dir with a parquet footer
                sent = os.path.join(out_root, "__empty__")
                df.limit(0).repartition(1).write.mode(
                    "overwrite"
                ).parquet(sent)
                return (
                    {"__empty__": f"{rel}/__empty__"}, 0,
                    {"__empty__": 0},
                )
            return entries, 0, {}
        # one aggregation over the written files yields the per-entry
        # manifest stats (the partition value is physically present in
        # every file of its dir)
        stats = (
            self.spark.read.parquet(
                *[os.path.join(self.path, d) for d in entries.values()]
            )
            .groupBy(pc)
            .count()
            .collect()
        )
        rows_by_pk = {_pk(r[pc]): int(r["count"]) for r in stats}
        rows = {k: rows_by_pk.get(k, 0) for k in entries}
        return entries, sum(rows.values()), rows

    def _rewrite(self, op: str, affected: Column, transform) -> Snapshot:
        """Copy-on-write: rewrite only the partitions that contain
        rows where ``affected`` is TRUE; carry the rest over."""
        cur = self.current()
        v = cur.version + 1
        if self.partition_col is None:
            new_df = transform(self.read())
            entries, n, rows = self._write_data(new_df, v)
            return self._commit(
                Snapshot(v, _now(), op, entries, n,
                         added_cols=list(cur.added_cols),
                         entry_rows=rows),
                base=cur, touched={_UNPARTITIONED},
            )
        pc = self.partition_col
        current = self.read()
        hit = current.where(affected.eqNullSafe(F.lit(True)))
        # source partitions of affected rows, PLUS destination
        # partitions when the transform rewrites the partition column
        # (an UPDATE moving rows across partitions must rewrite both
        # ends); every predicate-matching row lives in a source
        # partition, so one pass closes the set
        touched_vals = [
            r[pc]
            for r in hit.select(pc)
            .union(transform(hit).select(pc))
            .distinct().collect()
        ]
        touched_keys = {_pk(val) for val in touched_vals}
        changed = transform(
            current.where(_partition_membership(pc, touched_vals))
        )
        entries_new, _, rows_new = self._write_data(
            changed, v, only_keys=touched_keys
        )
        entries = {
            pk: d for pk, d in cur.entries.items()
            if _pk_base(pk) not in touched_keys
        }
        entry_rows = {
            pk: cur.entry_rows[pk] for pk in entries
            if pk in cur.entry_rows
        }
        entries.update(entries_new)
        entry_rows.update(rows_new)
        n = self._total_rows(entries, entry_rows)
        if n is None:
            n = self._count_entries(
                Snapshot(v, _now(), op, entries, -1)
            )
        return self._commit(
            Snapshot(v, _now(), op, entries, n,
                     added_cols=list(cur.added_cols),
                     entry_rows=entry_rows),
            base=cur, touched=touched_keys,
        )

    def _count_entries(self, snap: Snapshot) -> int:
        dirs = [os.path.join(self.path, d) for d in snap.entries.values()]
        return self.spark.read.parquet(*dirs).count() if dirs else 0

    def _total_rows(self, entries: dict, entry_rows: dict) -> int | None:
        """Sum manifest stats, or None when any entry lacks them
        (pre-stats manifests) — callers then fall back to counting."""
        if all(k in entry_rows for k in entries):
            return int(sum(entry_rows[k] for k in entries))
        return None

    def _commit(
        self,
        snap: Snapshot,
        base: Snapshot | None = None,
        touched: set[str] | None = None,
        mode: str = "replace",
        max_retries: int = 5,
    ) -> Snapshot:
        """Optimistic-concurrency manifest publish — the
        compare-and-swap a real catalog provides (Nessie/REST in the
        reference's stack, ``iceberg.properties:4-7``), implemented
        with ``os.link`` (atomic, fails EEXIST) on the version file.

        When a concurrent writer wins the version number, the commit
        is REBASED instead of failing, Iceberg-style: re-read the new
        head, verify the loser's ``touched`` partitions were not also
        modified by the interleaved commits (comparing ``base`` vs
        head entry sets per partition base key), then re-derive the
        manifest from the new head — ``mode='replace'`` (DML) swaps
        in our rewritten partitions, ``mode='add'`` (append) adds our
        new fragment entries. Genuine conflicts — same partition
        touched, schema evolved concurrently, or no ``base``/
        ``touched`` provided (whole-table ops) — still raise.
        """
        os.makedirs(self._snap_dir, exist_ok=True)
        for _ in range(max_retries + 1):
            final = os.path.join(
                self._snap_dir, f"v{snap.version:08d}.json"
            )
            fd, tmp = tempfile.mkstemp(dir=self._snap_dir, suffix=".tmp")
            with os.fdopen(fd, "w") as fh:
                json.dump(snap.__dict__, fh)
            try:
                os.link(tmp, final)  # atomic CAS: EEXIST on conflict
                return snap
            except FileExistsError:
                pass
            finally:
                os.remove(tmp)
            if base is None or touched is None:
                raise RuntimeError(
                    f"concurrent commit detected at v{snap.version} "
                    f"(op={snap.op} cannot be rebased)"
                )
            snap = self._rebase(snap, base, touched, mode)
        raise RuntimeError(
            f"commit of op={snap.op} lost the CAS race "
            f"{max_retries + 1} times; giving up"
        )

    def _rebase(
        self, snap: Snapshot, base: Snapshot,
        touched: set[str], mode: str,
    ) -> Snapshot:
        """Re-derive ``snap`` against the current head after losing
        the commit race. Raises on real conflicts."""
        head = self.current()
        if head.added_cols != base.added_cols:
            raise RuntimeError(
                "concurrent commit conflict: schema evolved between "
                f"v{base.version} and v{head.version}"
            )
        base_by: dict[str, set] = {}
        for k, d in base.entries.items():
            base_by.setdefault(_pk_base(k), set()).add((k, d))
        head_by: dict[str, set] = {}
        for k, d in head.entries.items():
            head_by.setdefault(_pk_base(k), set()).add((k, d))
        if mode == "replace":
            overlap = [
                bk for bk in sorted(touched)
                if head_by.get(bk, set()) != base_by.get(bk, set())
            ]
            if overlap:
                raise RuntimeError(
                    "concurrent commit conflict: partition(s) "
                    f"{overlap} modified by both writers between "
                    f"v{base.version} and v{head.version}"
                )
        v = head.version + 1
        ours = {
            k: d for k, d in snap.entries.items()
            if _pk_base(k) in touched
        }
        if mode == "replace":
            entries = {
                k: d for k, d in head.entries.items()
                if _pk_base(k) not in touched
            }
            entries.update(ours)
        else:  # add: our fragments land alongside whatever head has
            # ours = entries this append actually wrote (new dirs),
            # NOT base-carried entries — head already has those
            ours = {
                k: d for k, d in snap.entries.items()
                if base.entries.get(k) != d
            }
            entries = dict(head.entries)
            for k, d in ours.items():
                kk = k
                while kk in entries:
                    kk = f"{_pk_base(k)}@v{v}.{len(entries)}"
                entries[kk] = d
        entry_rows = {
            k: head.entry_rows[k] for k in entries
            if k in head.entry_rows
        }
        for k in entries:
            if k in snap.entry_rows:
                entry_rows[k] = snap.entry_rows[k]
        n = self._total_rows(entries, entry_rows)
        if n is None:
            n = self._count_entries(
                Snapshot(v, _now(), snap.op, entries, -1)
            )
        return Snapshot(v, _now(), snap.op, entries, n,
                        added_cols=list(head.added_cols),
                        entry_rows=entry_rows)


def _partition_membership(pc: str, vals: list) -> Column:
    """Null-safe partition-membership predicate. ``isin`` follows SQL
    IN semantics — NULL never matches — but the null partition is a
    first-class citizen of this layout (``__HIVE_DEFAULT_PARTITION__``
    in :meth:`VersionedTable._write_data`), so a COW rewrite that
    touches null-partition rows must select them explicitly or the
    rewrite silently drops the whole null partition."""
    non_null = [v for v in vals if v is not None]
    pred = F.col(pc).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in vals):
        pred = pred | F.col(pc).isNull()
    return pred


def _now() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _pk(val) -> str:
    """Filesystem-safe AND INJECTIVE partition key for a value.

    Injectivity is load-bearing: two distinct partition values
    sharing a key would make one manifest entry overwrite the other
    (silent loss of a whole partition). Percent-encoding is
    injective over strings ('a b' -> p_a%20b, 'a_b' -> p_a_b), and
    NULL gets its own prefix so no string value — including the
    literal 'null' — can collide with it. '@' always encodes, so the
    ``@vN`` append-suffix parsing stays unambiguous."""
    if val is None:
        return "pn_"
    return "p_" + urllib.parse.quote(str(val), safe="")


def _write_token() -> str:
    """Unique-per-write suffix for data dirs (see _write_data)."""
    import uuid

    return uuid.uuid4().hex[:8]


def _data_version(rel_dir: str) -> int:
    """Write-version of a data dir, from its `data/vNNNNNNNN[-tok]/`
    path segment (the token distinguishes concurrent same-version
    writers; the version prefix is what schema-evolution fill keys
    on)."""
    part = rel_dir.split("/")[1]
    return int(re.match(r"v(\d{8})", part).group(1))


def _pk_base(pk: str) -> str:
    """Partition key without any ``@vN`` append suffix."""
    return pk.split("@", 1)[0]
