"""Avro OCF codec tests, including the independence check: files we
write are read by the JVM Avro implementation Spark bundles
(avro-1.12.1.jar) and vice versa — two codebases agreeing on the
bytes, not a self-roundtrip."""

from __future__ import annotations

import json
import tempfile

import pytest

from hands_on_trino_iceberg_superset_spark.lakehouse.avro import (
    read_ocf,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "int"}},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "b", "type": "boolean"},
        {"name": "by", "type": "bytes"},
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["RED", "GREEN"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f8",
                                "size": 4}},
        {"name": "nested", "type": {
            "type": "record", "name": "inner",
            "fields": [{"name": "x", "type": ["null", "long"],
                        "default": None}],
        }},
    ],
}

RECS = [
    {"a": 1, "i": -5, "s": "héllo", "arr": [1, -2, 3], "m": {"k": 7},
     "d": 1.5, "f": 0.25, "b": True, "by": b"\x00\xff", "e": "RED",
     "fx": b"abcd", "nested": {"x": 9}},
    {"a": -(2 ** 62), "i": 2 ** 31 - 1, "s": None, "arr": [], "m": {},
     "d": -0.0, "f": -1.0, "b": False, "by": b"", "e": "GREEN",
     "fx": b"\x00\x00\x00\x00", "nested": {"x": None}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(codec):
    p = tempfile.mktemp(suffix=".avro")
    write_ocf(p, SCHEMA, RECS, codec=codec)
    schema, meta, out = read_ocf(p)
    assert out == RECS
    assert meta["avro.codec"] == codec
    assert schema["name"] == "t"


def test_multiblock_roundtrip():
    recs = [{"a": i, "i": i, "s": str(i), "arr": [i], "m": {},
             "d": float(i), "f": 0.0, "b": bool(i % 2), "by": b"x",
             "e": "RED", "fx": b"0000", "nested": {"x": None}}
            for i in range(257)]
    p = tempfile.mktemp(suffix=".avro")
    write_ocf(p, SCHEMA, recs, block_records=100)
    _, _, out = read_ocf(p)
    assert out == recs


def test_deterministic_bytes():
    a = write_ocf("", SCHEMA, RECS)
    b = write_ocf("", SCHEMA, RECS)
    assert a == b  # content-derived sync marker: stable fixtures


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"nope" + b"\x00" * 64)


def test_union_rejects_unmatched():
    with pytest.raises(ValueError, match="union"):
        write_ocf("", {"type": "record", "name": "r", "fields": [
            {"name": "u", "type": ["null", "long"]}]}, [{"u": "str"}])


# ------------------------------------------------- JVM independence


JVM_SCHEMA = {
    "type": "record",
    "name": "jt",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
    ],
}
JVM_RECS = [
    {"a": 1, "s": "x", "arr": [1, 2, 3], "d": 1.5, "b": True},
    {"a": -99, "s": None, "arr": [], "d": -0.25, "b": False},
]


def test_jvm_reads_our_files(spark):
    jvm = spark._jvm
    p = tempfile.mktemp(suffix=".avro")
    write_ocf(p, JVM_SCHEMA, JVM_RECS, codec="deflate")
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while rdr.hasNext():
        got.append(json.loads(rdr.next().toString()))
    rdr.close()
    assert got == JVM_RECS


def test_we_read_jvm_files(spark):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(JVM_SCHEMA)
    )
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p = tempfile.mktemp(suffix=".avro")
    w.create(schema, jvm.java.io.File(p))
    for r in JVM_RECS:
        gr = jvm.org.apache.avro.generic.GenericData.Record(schema)
        gr.put("a", r["a"])
        gr.put("s", r["s"])
        arr = jvm.java.util.ArrayList()
        for x in r["arr"]:
            arr.add(x)
        gr.put("arr", arr)
        gr.put("d", r["d"])
        gr.put("b", r["b"])
        w.append(gr)
    w.close()
    _, meta, out = read_ocf(p)
    assert meta["avro.codec"] == "deflate"
    assert out == JVM_RECS


# ------------------------------------------------- property-based


from hypothesis import given, settings, strategies as st

_prim = st.sampled_from(["long", "int", "double", "boolean", "string",
                         "bytes"])


def _value_for(t):
    return {
        "long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "double": st.floats(allow_nan=False),
        "boolean": st.booleans(),
        "string": st.text(max_size=40),
        "bytes": st.binary(max_size=40),
    }[t]


@st.composite
def _schema_and_records(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields = []
    for i in range(n_fields):
        t = draw(_prim)
        nullable = draw(st.booleans())
        as_array = draw(st.booleans())
        ftype = {"type": "array", "items": t} if as_array else t
        fields.append({
            "name": f"f{i}",
            "type": ["null", ftype] if nullable else ftype,
            **({"default": None} if nullable else {}),
            "_t": t, "_null": nullable, "_arr": as_array,
        })
    schema = {"type": "record", "name": "r",
              "fields": [{k: v for k, v in f.items()
                          if not k.startswith("_")} for f in fields]}
    n_recs = draw(st.integers(min_value=0, max_value=8))
    records = []
    for _ in range(n_recs):
        rec = {}
        for f in fields:
            if f["_null"] and draw(st.booleans()):
                rec[f["name"]] = None
            elif f["_arr"]:
                rec[f["name"]] = draw(
                    st.lists(_value_for(f["_t"]), max_size=5)
                )
            else:
                rec[f["name"]] = draw(_value_for(f["_t"]))
        records.append(rec)
    return schema, records


@settings(max_examples=60, deadline=None)
@given(_schema_and_records(), st.sampled_from(["null", "deflate"]))
def test_property_roundtrip(schema_records, codec):
    schema, records = schema_records
    data = write_ocf("", schema, records, codec=codec)
    got_schema, meta, got = read_ocf(data)
    assert got == records
    assert got_schema["fields"] == schema["fields"]
