"""Hidden-partitioning transforms: spec reference vectors (an
independent check against the published Iceberg spec appendix, not a
self-roundtrip) + transform-pruned scan gates."""

from __future__ import annotations

import datetime as dt
import os
import struct

import pyspark.sql.functions as F
import pytest

from hands_on_trino_iceberg_superset_spark.lakehouse.iceberg import (
    IcebergTable,
    _np_murmur3_long,
)
from hands_on_trino_iceberg_superset_spark.lakehouse.transforms import (
    apply_transform,
    bucket,
    murmur3_32,
    transform_filter,
)
from hands_on_trino_iceberg_superset_spark.sources import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------- spec reference vectors


def test_murmur3_spec_vectors():
    """Hash values published in the Iceberg spec (Appendix B)."""
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int/long 34
    assert murmur3_32(b"iceberg") == 1210000089             # string
    assert murmur3_32(struct.pack("<q", 17486)) == -653330422   # date 2017-11-16
    assert murmur3_32(struct.pack("<q", 1510871468000000)) == -2047944441  # ts
    assert murmur3_32(struct.pack("<d", 1.0)) == -142385009  # double 1.0


def test_bucket_matches_spec():
    assert bucket(16, "long", 34) == bucket(16, "int", 34)
    assert bucket(16, "string", "iceberg") == 1210000089 % 16
    assert bucket(16, "long", None) is None


def test_numpy_murmur_bit_identical():
    import numpy as np

    vals = np.array(
        [0, 1, -1, 34, 2**62, -(2**62), 123456789, -987654321],
        dtype=np.int64,
    )
    assert list(_np_murmur3_long(vals)) == [
        murmur3_32(struct.pack("<q", int(v))) for v in vals
    ]


def test_temporal_and_truncate_transforms():
    d = dt.date(2017, 11, 16)
    assert apply_transform("day", "date", d) == 17486
    assert apply_transform("month", "date", d) == 574
    assert apply_transform("year", "date", d) == 47
    assert apply_transform("truncate[10]", "long", -1) == -10  # floors
    assert apply_transform("truncate[10]", "long", 17) == 10
    assert apply_transform("truncate[3]", "string", "iceberg") == "ice"
    assert apply_transform("bucket[16]", "long", None) is None


def test_transform_filter_shapes():
    # monotonic: ranges map through
    assert transform_filter(
        "day", "timestamp",
        (dt.datetime(1995, 1, 1), dt.datetime(1995, 1, 15)),
    ) == (9131, 9145)
    # bucket: equality maps, ranges cannot prune
    assert transform_filter("bucket[8]", "long", (1, 10)) is None
    assert transform_filter("bucket[8]", "long", [34]) == [
        bucket(8, "long", 34)
    ]


# --------------------------------------------------- scan plan gates


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders")


def test_bucket_partitioned_scan(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "bucketed")
    t = IcebergTable.create(spark, path, orders,
                            partition_by="bucket(8, o_orderkey)")
    pruned = t.plan_scan(filter={"o_orderkey": [42, 77]})
    assert len(pruned.files) <= 2 < pruned.total_files
    got = sorted(
        r.o_orderkey
        for r in t.read(filter={"o_orderkey": [42, 77]}).collect()
    )
    assert got == [42, 77]
    # ranges cannot prune through the bucket PARTITION tier, but the
    # column-bounds tier still skips files whose o_orderkey min/max
    # misses the range — ranged queries stay correct and still prune
    rng = t.plan_scan(filter={"o_orderkey": (1, 10)})
    assert 0 < len(rng.files) <= rng.total_files
    assert t.read(filter={"o_orderkey": (1, 10)}).count() == \
        orders.where("o_orderkey between 1 and 10").count()


def test_day_partitioned_scan(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "daily")
    t = IcebergTable.create(spark, path, orders,
                            partition_by="day(o_orderdate)")
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1995, 1, 15)
    pruned = t.plan_scan(filter={"o_orderdate": (lo, hi)})
    assert 0 < len(pruned.files) < pruned.total_files
    expected = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    ).count()
    assert t.read(filter={"o_orderdate": (lo, hi)}).count() == expected


def test_truncate_partitioned_scan(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "trunc")
    t = IcebergTable.create(spark, path, orders,
                            partition_by="truncate(1, o_orderpriority)")
    pruned = t.plan_scan(filter={"o_orderpriority": "1-URGENT"})
    assert len(pruned.files) == 1 and pruned.total_files == 5
    assert t.read(filter={"o_orderpriority": "1-URGENT"}).count() == \
        orders.where("o_orderpriority = '1-URGENT'").count()


def test_partition_field_naming_and_spec(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ice") / "named")
    t = IcebergTable.create(spark, path, orders,
                            partition_by="bucket(4, o_custkey)")
    spec = IcebergTable.load(spark, path).partition_spec()
    assert spec == [{
        "name": "o_custkey_bucket", "transform": "bucket[4]",
        "source-id": 2, "field-id": 1000,
    }]


def test_invalid_transforms_rejected(spark, orders, tmp_path_factory):
    base = tmp_path_factory.mktemp("ice")
    with pytest.raises(ValueError, match="not supported"):
        IcebergTable.create(spark, str(base / "a"), orders,
                            partition_by="truncate(2, o_orderdate)")
    with pytest.raises(ValueError, match="unknown partition transform"):
        IcebergTable.create(spark, str(base / "b"), orders,
                            partition_by="nope(3, o_orderkey)")
