"""Versioned-table (lakehouse-lite) gates: snapshot isolation, time
travel, row-level DML semantics, and partition-granular copy-on-write
(untouched partitions must carry over by reference, not rewrite)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hands_on_trino_iceberg_superset_spark.lakehouse import VersionedTable


@pytest.fixture()
def orders_df(spark):
    rows = [
        (i, f"2024-01-{(i % 3) + 1:02d}",
         ["open", "paid", "shipped"][(i // 3) % 3],   # decorrelated from day
         float(i * 10))
        for i in range(1, 31)
    ]
    return spark.createDataFrame(
        rows, "order_id long, day string, status string, amount double"
    )


def test_create_read_roundtrip(spark, orders_df, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    assert t.current().version == 1
    assert t.read().count() == 30
    assert sorted(t.read().columns) == ["amount", "day", "order_id", "status"]


def test_delete_is_cow_and_time_travels(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    v1_entries = dict(t.current().entries)
    t.delete("status = 'open' AND day = '2024-01-01'")
    # v2 state: the 2024-01-01 'open' rows are gone
    v2 = t.read()
    assert v2.where("status = 'open' AND day = '2024-01-01'").count() == 0
    assert v2.count() == 30 - orders_df.where(
        "status = 'open' AND day = '2024-01-01'"
    ).count()
    # time travel: v1 still has them
    assert t.read(version=1).count() == 30
    # COW granularity: only the touched partition was rewritten
    v2_entries = t.current().entries
    assert v2_entries["p_2024-01-02"] == v1_entries["p_2024-01-02"]
    assert v2_entries["p_2024-01-03"] == v1_entries["p_2024-01-03"]
    assert v2_entries["p_2024-01-01"] != v1_entries["p_2024-01-01"]


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 50.0)], "id long, v double"
    )
    t = VersionedTable.create(spark, str(tmp_path / "t"), df)
    t.delete("v > 10")  # NULL predicate -> keep (SQL DELETE semantics)
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_update_assignments(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    t.update({"amount": "amount * 2", "status": "'audited'"},
             where="status = 'paid'")
    out = t.read()
    assert out.where("status = 'paid'").count() == 0
    audited = out.where("status = 'audited'")
    assert audited.count() == orders_df.where("status = 'paid'").count()
    # amounts doubled exactly for the updated rows, untouched otherwise
    orig = {r.order_id: r.amount for r in orders_df.collect()}
    for r in out.collect():
        expect = orig[r.order_id] * (2 if r.status == "audited" else 1)
        assert r.amount == expect


def test_merge_upsert_semantics(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    v1_entries = dict(t.current().entries)
    source = spark.createDataFrame(
        [
            (3, "2024-01-01", "cancelled", 0.0),     # matched -> update
            (6, "2024-01-01", "cancelled", 0.0),     # matched -> update
            (999, "2024-01-09", "open", 999.0),      # new -> insert
        ],
        "order_id long, day string, status string, amount double",
    )
    t.merge(
        source, on="order_id",
        when_matched_update={"status": "s.status", "amount": "s.amount"},
    )
    out = t.read()
    assert out.count() == 31
    got = {r.order_id: (r.status, r.amount, r.day) for r in out.collect()}
    assert got[3] == ("cancelled", 0.0, "2024-01-01")   # day kept from target
    assert got[6] == ("cancelled", 0.0, "2024-01-01")
    assert got[999] == ("open", 999.0, "2024-01-09")
    assert got[1][0] == "open"  # untouched row intact
    # partitions without matches/inserts carried over by reference
    v2_entries = t.current().entries
    assert v2_entries["p_2024-01-02"] == v1_entries["p_2024-01-02"]


def test_merge_matched_delete(spark, orders_df, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    source = spark.createDataFrame(
        [(9, "x", "y", 0.0), (12, "x", "y", 1.0)],
        "order_id long, day string, status string, amount double",
    )
    t.merge(source, on="order_id", when_matched_delete="s.amount = 0.0",
            when_matched_update={"status": "s.status"},
            insert_not_matched=False)
    out = {r.order_id: r.status for r in t.read().collect()}
    assert 9 not in out           # deleted
    assert out[12] == "y"         # updated
    assert len(out) == 29


def test_append_does_not_rewrite(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    v1_entries = dict(t.current().entries)
    extra = spark.createDataFrame(
        [(200, "2024-01-01", "open", 5.0), (201, "2024-01-09", "open", 6.0)],
        "order_id long, day string, status string, amount double",
    )
    t.append(extra)
    assert t.read().count() == 32
    v2 = t.current().entries
    # original partition dirs all still referenced unchanged
    for pk, d in v1_entries.items():
        assert v2[pk] == d
    # new partition appears; overlapping partition adds a second dir
    assert "p_2024-01-09" in v2
    assert any(k.startswith("p_2024-01-01@v") for k in v2)
    # and time travel to v1 is unaffected
    assert t.read(version=1).count() == 30


def test_timestamp_as_of(spark, orders_df, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    ts_between = t.current().ts
    t.delete("order_id <= 10")
    assert t.read().count() == 20
    assert t.read(as_of=ts_between).count() == 30


def test_concurrent_commit_detected(spark, orders_df, tmp_path):
    path = str(tmp_path / "t")
    t1 = VersionedTable.create(spark, path, orders_df)
    t2 = VersionedTable(spark, path)
    t2.delete("order_id = 1")
    # t1's stale handle now collides on the same next version number
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t1._commit(
            type(t1.current())(
                version=2, ts="x", op="delete", entries={}, row_count=0
            )
        )


def test_merge_then_groupby_matches_dataframe_math(spark, orders_df, tmp_path):
    """End-to-end: post-MERGE aggregate equals the declaratively
    recomputed expectation (the DuckDB-oracle shape used by the
    dml_* inventory queries)."""
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    source = orders_df.where(F.col("order_id") % 5 == 0).select(
        "order_id", "day",
        F.lit("bulk").alias("status"),
        (F.col("amount") + 1000).alias("amount"),
    )
    t.merge(source, on="order_id",
            when_matched_update={"status": "s.status", "amount": "s.amount"})
    got = {
        r.status: (r.n, r.total)
        for r in t.read().groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("amount"), 2).alias("total"))
        .collect()
    }
    bulk = orders_df.where(F.col("order_id") % 5 == 0)
    assert got["bulk"][0] == bulk.count()
    expect_total = sum(r.amount + 1000 for r in bulk.collect())
    assert abs(got["bulk"][1] - expect_total) < 1e-6


def test_update_moving_rows_across_partitions(spark, orders_df, tmp_path):
    """An UPDATE that rewrites the partition column must land the
    rows in their destination partition and remove them from the
    source partition."""
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    moved = orders_df.where("day = '2024-01-01' AND status = 'open'").count()
    t.update({"day": "'2024-02-01'"},
             where="day = '2024-01-01' AND status = 'open'")
    out = t.read()
    assert out.count() == 30
    assert out.where("day = '2024-02-01'").count() == moved
    assert out.where("day = '2024-01-01' AND status = 'open'").count() == 0


def test_merge_update_moving_partition(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    source = spark.createDataFrame(
        [(3, "2024-03-01", "moved", 1.0)],
        "order_id long, day string, status string, amount double",
    )
    t.merge(source, on="order_id",
            when_matched_update={"day": "s.day", "status": "s.status"})
    out = t.read()
    assert out.count() == 30
    got = {r.order_id: (r.day, r.status) for r in out.collect()}
    assert got[3] == ("2024-03-01", "moved")
    assert out.where("day = '2024-01-01'").count() == \
        orders_df.where("day = '2024-01-01'").count() - 1


def test_add_column_metadata_only_with_backfill(spark, orders_df, tmp_path):
    """ADD COLUMN is metadata-only: no data dir changes; old rows
    read back with the default expression, new writes carry the
    column physically, and time travel to the pre-ALTER snapshot
    does not show it."""
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    v1_entries = dict(t.current().entries)
    t.add_column("discount", "double", default_sql="amount * 0.01")
    # no rewrite happened
    assert t.current().entries == v1_entries
    out = t.read()
    assert "discount" in out.columns
    for r in out.collect():
        assert abs(r.discount - r.amount * 0.01) < 1e-12
    # time travel: pre-ALTER snapshot has no such column
    assert "discount" not in t.read(version=1).columns

    # DML after evolution: updates see and can set the new column
    t.update({"discount": "5.0"}, where="status = 'open'")
    got = {r.order_id: r.discount for r in t.read().collect()}
    orig = {r.order_id: (r.amount, r.status) for r in orders_df.collect()}
    for oid, disc in got.items():
        amount, status = orig[oid]
        expect = 5.0 if status == "open" else amount * 0.01
        assert abs(disc - expect) < 1e-12
    # appends with the full schema keep working
    extra = spark.createDataFrame(
        [(300, "2024-01-01", "open", 1.0, 9.9)],
        "order_id long, day string, status string, amount double, discount double",
    )
    t.append(extra)
    assert t.read().where("order_id = 300").collect()[0].discount == 9.9


def test_add_column_null_default_and_duplicate_rejected(spark, orders_df, tmp_path):
    import pytest

    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    t.add_column("note", "string")
    assert all(r.note is None for r in t.read().collect())
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("note", "string")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("amount", "double")


def test_compact_merges_append_fragments(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    extra = spark.createDataFrame(
        [(400, "2024-01-01", "open", 4.0), (401, "2024-01-01", "paid", 5.0)],
        "order_id long, day string, status string, amount double",
    )
    t.append(extra)
    assert any("@v" in k for k in t.current().entries)
    before = {(r.order_id, r.status, r.amount) for r in t.read().collect()}
    t.compact()
    # fragments merged into one dir per partition, state identical
    assert not any("@v" in k for k in t.current().entries)
    after = {(r.order_id, r.status, r.amount) for r in t.read().collect()}
    assert after == before
    assert t.current().op == "compact"


def test_compact_after_evolution_materializes_schema(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    t.add_column("flag", "string", default_sql="'old'")
    extra = spark.createDataFrame(
        [(500, "2024-01-01", "open", 4.0, "new")],
        "order_id long, day string, status string, amount double, flag string",
    )
    t.append(extra)
    t.compact()
    got = {r.order_id: r.flag for r in t.read().collect()}
    assert got[500] == "new"
    assert got[1] == "old"


def test_expire_snapshots_gc(spark, orders_df, tmp_path):
    """expire_snapshots drops old manifests and deletes data dirs no
    surviving snapshot references — current state intact, expired
    time travel gone, shared dirs (carried over by COW) preserved."""
    import os

    import pytest

    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    t.delete("day = '2024-01-01' AND status = 'open'")
    t.update({"amount": "amount + 1"}, where="day = '2024-01-02'")
    assert [s.version for s in t.snapshots()] == [1, 2, 3]
    state_before = {(r.order_id, r.amount) for r in t.read().collect()}

    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    assert [s.version for s in t.snapshots()] == [3]
    # current state identical (carried-over dirs survived the GC)
    assert {(r.order_id, r.amount) for r in t.read().collect()} == state_before
    # expired versions are gone
    with pytest.raises(ValueError):
        t.read(version=1)
    # v1-only data dirs removed from disk
    assert not os.path.isdir(
        os.path.join(str(tmp_path / "t"), "data", "v00000001", "p_2024-01-01")
    )


def test_dml_on_null_partition_preserves_other_null_rows(spark, tmp_path):
    """A DELETE/UPDATE touching null-partition rows must rewrite the
    null partition like any other (SQL IN semantics would silently
    drop ALL of it: isin never matches NULL)."""
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 30.0), (4, "b", 40.0)],
        "id long, day string, amount double",
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), df, partition_col="day"
    )
    v1_entries = dict(t.current().entries)
    t.delete("id = 1")
    out = t.read()
    # row 2 (same null partition, not matched) must survive
    assert sorted(r.id for r in out.collect()) == [2, 3, 4]
    assert out.where(F.col("day").isNull()).count() == 1
    # and the non-null partitions carried over untouched
    v2_entries = t.current().entries
    assert v2_entries["p_a"] == v1_entries["p_a"]
    assert v2_entries["p_b"] == v1_entries["p_b"]
    # UPDATE on the null partition behaves the same
    t.update({"amount": "amount * 2"}, where="id = 2")
    got = {r.id: r.amount for r in t.read().collect()}
    assert got == {2: 40.0, 3: 30.0, 4: 40.0}


def test_merge_touching_null_partition(spark, tmp_path):
    """MERGE whose matched rows live in the null partition must not
    drop that partition's unmatched rows."""
    df = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 30.0)],
        "id long, day string, amount double",
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), df, partition_col="day"
    )
    src = spark.createDataFrame(
        [(1, None, 11.0)], "id long, day string, amount double"
    )
    t.merge(src, on="id", when_matched_update={"amount": "s.amount"})
    got = {r.id: r.amount for r in t.read().collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0}


def test_merge_rejects_null_and_duplicate_source_keys(spark, orders_df, tmp_path):
    """ANSI MERGE contract: NULL merge keys and duplicate source keys
    are errors, not silent misclassification / fan-out."""
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    null_key = spark.createDataFrame(
        [(None, "2024-01-01", "open", 1.0)],
        "order_id long, day string, status string, amount double",
    )
    with pytest.raises(ValueError, match="NULL"):
        t.merge(null_key, on="order_id")
    dup_key = spark.createDataFrame(
        [(1, "2024-01-01", "open", 1.0), (1, "2024-01-02", "paid", 2.0)],
        "order_id long, day string, status string, amount double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(dup_key, on="order_id")


def test_merge_keeps_null_key_target_rows(spark, tmp_path):
    """A target row whose own merge key is NULL joins nothing; it is
    target-only and must survive even with insert_not_matched=False."""
    df = spark.createDataFrame(
        [(None, 1.0), (2, 2.0), (3, 3.0)], "k long, v double"
    )
    t = VersionedTable.create(spark, str(tmp_path / "t"), df)
    src = spark.createDataFrame([(2, 20.0), (9, 90.0)], "k long, v double")
    t.merge(src, on="k", when_matched_update={"v": "s.v"},
            insert_not_matched=False)
    got = sorted(
        ((r.k, r.v) for r in t.read().collect()),
        key=lambda x: (x[0] is None, x[0]),
    )
    # NULL-key target row kept, k=2 updated, k=9 NOT inserted
    assert got == [(2, 20.0), (3, 3.0), (None, 1.0)]


def test_snapshots_ignore_stray_tmp_files(spark, orders_df, tmp_path):
    """A crashed _commit leaves a *.tmp in _snapshots/; reads must
    skip it (partial JSON would crash; complete-but-unrenamed would
    resurface a phantom snapshot)."""
    import os

    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    t.delete("order_id = 1")
    # partial write (crash mid-json.dump)
    with open(os.path.join(t._snap_dir, "tmpabc123.tmp"), "w") as fh:
        fh.write('{"version": 99, "ts"')
    # fully written but never renamed
    with open(os.path.join(t._snap_dir, "tmpdef456.tmp"), "w") as fh:
        fh.write(
            '{"version": 99, "ts": "x", "op": "delete", '
            '"entries": {}, "row_count": 0, "added_cols": []}'
        )
    assert [s.version for s in t.snapshots()] == [1, 2]
    assert t.current().version == 2


def test_cas_rebase_two_writers_both_land(spark, orders_df, tmp_path):
    """Optimistic concurrency: writer B races from a stale base,
    loses the version number to writer A, and its commit REBASES onto
    A's head instead of failing — both changes visible, disjoint
    partitions."""
    path = str(tmp_path / "t")
    t_a = VersionedTable.create(spark, path, orders_df, partition_col="day")
    t_b = VersionedTable(spark, path, partition_col="day")

    orig_write = t_b._write_data
    state = {"interleaved": False}

    def interleaved(df, version, only_keys=None):
        # writer A commits AFTER B has read its base but BEFORE B's
        # commit — the classic lost-update interleaving
        if not state["interleaved"]:
            state["interleaved"] = True
            t_a.update({"amount": "amount + 1000"},
                       where="day = '2024-01-01'")
        return orig_write(df, version, only_keys=only_keys)

    t_b._write_data = interleaved
    t_b.update({"amount": "amount + 1"}, where="day = '2024-01-03'")

    snaps = t_a.snapshots()
    assert [s.version for s in snaps] == [1, 2, 3]
    out = t_a.read()
    assert out.where("day = '2024-01-01' AND amount < 1000").count() == 0
    base = {r.order_id: r.amount for r in orders_df.collect()}
    got = {r.order_id: r.amount for r in out.collect()}
    for r in orders_df.collect():
        bump = 1000 if r.day == "2024-01-01" else (
            1 if r.day == "2024-01-03" else 0
        )
        assert got[r.order_id] == base[r.order_id] + bump
    # row_count stayed consistent through the rebase
    assert t_a.current().row_count == 30


def test_cas_same_partition_conflict_raises(spark, orders_df, tmp_path):
    """Two writers touching the SAME partition is a genuine conflict:
    the loser must raise, not silently clobber the winner."""
    path = str(tmp_path / "t")
    t_a = VersionedTable.create(spark, path, orders_df, partition_col="day")
    t_b = VersionedTable(spark, path, partition_col="day")

    orig_write = t_b._write_data
    state = {"interleaved": False}

    def interleaved(df, version, only_keys=None):
        if not state["interleaved"]:
            state["interleaved"] = True
            t_a.update({"amount": "amount + 1000"},
                       where="day = '2024-01-01'")
        return orig_write(df, version, only_keys=only_keys)

    t_b._write_data = interleaved
    with pytest.raises(RuntimeError, match="conflict"):
        t_b.update({"amount": "amount + 1"}, where="day = '2024-01-01'")


def test_cas_rebase_append_during_dml(spark, orders_df, tmp_path):
    """A stale APPEND rebases in 'add' mode: its new fragments land
    alongside the winner's DML without duplicating carried entries."""
    path = str(tmp_path / "t")
    t_a = VersionedTable.create(spark, path, orders_df, partition_col="day")
    t_b = VersionedTable(spark, path, partition_col="day")

    extra = spark.createDataFrame(
        [(100, "2024-01-02", "open", 5.0)],
        "order_id long, day string, status string, amount double",
    )
    orig_write = t_b._write_data
    state = {"interleaved": False}

    def interleaved(df, version, only_keys=None):
        if not state["interleaved"]:
            state["interleaved"] = True
            t_a.delete("day = '2024-01-01'")
        return orig_write(df, version, only_keys=only_keys)

    t_b._write_data = interleaved
    t_b.append(extra)

    out = t_a.read()
    assert out.where("day = '2024-01-01'").count() == 0
    assert out.where("order_id = 100").count() == 1
    assert out.count() == 30 - 10 + 1
    assert [s.version for s in t_a.snapshots()] == [1, 2, 3]


# ---------------------------------------------------------- branching


def test_branch_isolation_and_merge(spark, orders_df, tmp_path):
    """Nessie-model branching: a branch commit is invisible on main
    until merge; merge lands exactly the branch's partition changes;
    the branch fork is O(1) metadata (no data copied)."""
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    dev = t.create_branch("dev")
    assert t.branches() == ["main", "dev"]

    dev.update({"amount": "amount + 1000"}, where="day = '2024-01-02'")
    # isolation: main unchanged, branch changed
    assert t.read().where("amount >= 1000").count() == 0
    assert dev.read().where("amount >= 1000").count() == 10
    # fork shared the data dirs: branch v-head references main's v1
    # dirs for the untouched partitions
    main_v1 = t.current().entries
    dev_head = dev.current().entries
    assert dev_head["p_2024-01-01"] == main_v1["p_2024-01-01"]

    # divergent-but-disjoint main commit merges cleanly
    t.delete("day = '2024-01-03'")
    merged = t.merge_branch("dev")
    assert merged.op == "merge_branch:dev"
    out = t.read()
    assert out.where("day = '2024-01-03'").count() == 0
    assert out.where("day = '2024-01-02' AND amount < 1000").count() == 0
    assert out.where("day = '2024-01-01' AND amount >= 1000").count() == 0
    assert out.count() == 20
    # branch history is untouched by the merge
    assert dev.read().count() == 30


def test_branch_merge_conflict_same_partition(spark, orders_df, tmp_path):
    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    dev = t.create_branch("dev")
    dev.update({"amount": "amount + 1"}, where="day = '2024-01-01'")
    t.update({"amount": "amount + 2"}, where="day = '2024-01-01'")
    with pytest.raises(RuntimeError, match="merge conflict"):
        t.merge_branch("dev")
    # the failed merge left main's head alone
    assert t.current().op == "update"


def test_branch_time_travel_and_drop(spark, orders_df, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    dev = t.create_branch("dev")
    dev.delete("order_id <= 10")
    dev.delete("order_id <= 20")
    # branch has its own chain: fork manifest + two deletes
    assert [s.version for s in dev.snapshots()] == [1, 2, 3]
    assert dev.read(version=2).count() == 20
    t.drop_branch("dev")
    assert t.branches() == ["main"]
    with pytest.raises(ValueError, match="no branch"):
        t.checkout("dev")
    # main never saw any of it
    assert t.read().count() == 30 and t.current().version == 1


def test_branch_schema_evolution_merges_one_side(spark, orders_df, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "t"), orders_df)
    dev = t.create_branch("dev")
    dev.add_column("note", "string", default_sql="'none'")
    t.merge_branch("dev")
    assert "note" in t.read().columns
    assert t.read().where("note = 'none'").count() == 30


def test_expire_on_main_keeps_branch_referenced_dirs(
    spark, orders_df, tmp_path
):
    """Branch refs pin shared data dirs: main's GC must not delete
    dirs a branch's history still references."""
    import os

    t = VersionedTable.create(
        spark, str(tmp_path / "t"), orders_df, partition_col="day"
    )
    dev = t.create_branch("dev")
    # main rewrites every partition twice, then expires old snapshots
    t.update({"amount": "amount + 1"}, where="amount >= 0")
    t.update({"amount": "amount + 1"}, where="amount >= 0")
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    # the branch still reads the fork-time state intact
    assert dev.read().count() == 30
    assert dev.read().agg(F.sum("amount")).collect()[0][0] == sum(
        i * 10.0 for i in range(1, 31)
    )


def test_partition_key_encoding_is_injective(spark, tmp_path):
    """Distinct partition values that sanitize identically must keep
    distinct manifest entries — a collision would let one entry
    overwrite the other (silent loss of a whole partition)."""
    df = spark.createDataFrame(
        [(1, "a b", 1.0), (2, "a_b", 2.0), (3, "null", 3.0),
         (4, None, 4.0)],
        "id long, k string, v double",
    )
    t = VersionedTable.create(
        spark, str(tmp_path / "inj"), df, partition_col="k"
    )
    assert len(t.current().entries) == 4
    got = {r.id: r.k for r in t.read().collect()}
    assert got == {1: "a b", 2: "a_b", 3: "null", 4: None}
    # DML on one of the colliding-under-sanitization values touches
    # ONLY that partition
    t.delete("k = 'a b'")
    assert {r.id for r in t.read().collect()} == {2, 3, 4}


def test_delete_all_keeps_table_usable(spark, tmp_path):
    """Emptying the table is legal: read() returns an empty frame
    with the schema intact and append() repopulates."""
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0)], "id long, k string, v double"
    )
    for pc in ("k", None):
        t = VersionedTable.create(
            spark, str(tmp_path / f"da_{pc}"), df, partition_col=pc
        )
        t.delete("true")
        assert t.read().count() == 0
        assert t.read().columns == ["id", "k", "v"]
        t.append(df)
        assert t.read().count() == 2


def test_mismatched_partition_col_handle_raises(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", 1.0)], "id long, k string, v double")
    VersionedTable.create(spark, str(tmp_path / "pc"), df)
    wrong = VersionedTable(spark, str(tmp_path / "pc"), partition_col="k")
    with pytest.raises(ValueError, match="unpartitioned"):
        wrong.delete("k = 'x'")
    VersionedTable.create(
        spark, str(tmp_path / "pc2"), df, partition_col="k"
    )
    wrong2 = VersionedTable(spark, str(tmp_path / "pc2"))
    with pytest.raises(ValueError, match="partitioned"):
        wrong2.delete("k = 'x'")


def test_merge_rejects_merge_key_update(spark, orders_df, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "mk"), orders_df)
    src = orders_df.limit(1)
    with pytest.raises(ValueError, match="merge key"):
        t.merge(src, on="order_id",
                when_matched_update={"order_id": "s.order_id + 100"})


def test_recreate_reclaims_old_data_dirs(spark, tmp_path):
    import os

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    path = str(tmp_path / "rc")
    VersionedTable.create(spark, path, df)
    old_dirs = set(os.listdir(os.path.join(path, "data")))
    VersionedTable.create(spark, path, df)
    new_dirs = set(os.listdir(os.path.join(path, "data")))
    assert old_dirs.isdisjoint(new_dirs), "old data dirs must be gone"


def test_scd2_history_compresses_and_stitches(spark):
    """SCD-2 construction: no-change snapshots vanish, validity
    ranges are half-open and contiguous, exactly one current row
    per key."""
    from hands_on_trino_iceberg_superset_spark.lakehouse.scd import (
        scd2_history,
    )

    snaps = spark.createDataFrame(
        [
            (1, "A", "2020-01-01"),
            (1, "A", "2020-02-01"),  # heartbeat: compressed away
            (1, "B", "2020-03-01"),
            (1, "B", "2020-04-01"),  # heartbeat
            (1, "A", "2020-05-01"),  # flips back: a NEW row
            (2, "X", "2020-01-15"),
        ],
        "k int, attr string, ts string",
    )
    hist = scd2_history(snaps, ["k"], ["attr"], "ts")
    # capture the plan BEFORE the action: the post-execution AQE
    # final-plan string prints the exchange once as the node and
    # once inside its ShuffleQueryStage wrapper
    plan = hist._jdf.queryExecution().executedPlan().toString()
    rows = sorted(hist.collect(), key=lambda r: (r.k, r.valid_from))
    k1 = [r for r in rows if r.k == 1]
    assert [(r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in k1] == [
        ("A", "2020-01-01", "2020-03-01", False),
        ("B", "2020-03-01", "2020-05-01", False),
        ("A", "2020-05-01", None, True),
    ]
    k2 = [r for r in rows if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].valid_to is None
    # plan: one Exchange carries both windows
    assert plan.count("Exchange") <= 1, plan


def test_scd2_asof_join_attributes_temporally(spark, tmp_path):
    """An order placed BEFORE a segment flip lands in the old
    segment, after in the new — the current-state join would put
    both in the new segment."""
    import pyspark.sql.functions as F

    from hands_on_trino_iceberg_superset_spark.queries import load_all

    spark.createDataFrame(
        [(1, "n1", "BUILDING", 0.0, "1-111", "a", "c")],
        "c_custkey long, c_name string, c_mktsegment string, "
        "c_acctbal double, c_phone string, c_address string, "
        "c_comment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    rows = [
        # early cheap order -> stays BUILDING
        (10, 1, "O", 100.0, "1995-01-01 00:00:00", "1-URGENT"),
        # big order flips the customer that day
        (11, 1, "O", 200000.0, "1996-01-01 00:00:00", "1-URGENT"),
        # later cheap order -> attributed to BIG-SPENDER era? no:
        # the cheap day snapshot flips the segment BACK, so the
        # as-of join lands it in BUILDING again
        (12, 1, "O", 50.0, "1997-01-01 00:00:00", "1-URGENT"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority "
        "string",
    ).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")
    ).write.parquet(str(tmp_path / "orders.parquet"))

    inv = load_all()
    df = inv["scd2_asof_revenue_by_segment"].spark(spark, str(tmp_path))
    out = {r.segment: r for r in df.collect()}
    assert out["BUILDING"].n_orders == 2
    assert out["BUILDING"].revenue == 150.0
    assert out["BIG-SPENDER"].n_orders == 1
    assert out["BIG-SPENDER"].revenue == 200000.0
    # the range predicate rides a HASH join on the key, never a
    # nested-loop range explosion
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
