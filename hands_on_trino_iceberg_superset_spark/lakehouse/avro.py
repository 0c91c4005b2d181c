"""Minimal pure-Python Avro Object Container File codec.

Why this exists: the reference stack's catalog speaks Iceberg
(``/root/reference/compose/trino/catalog/iceberg.properties:1-19``),
and Iceberg's table metadata below the root JSON is Avro — the
manifest list and every manifest file are Avro OCF files. This
container ships Spark without the ``spark-avro`` datasource or an
``iceberg-spark-runtime`` jar, so adopting or producing *real*
Iceberg metadata needs an Avro codec of our own. The JVM-side
``avro-1.12.1.jar`` that Spark bundles for its own internals serves
as the independent cross-check in ``tests/test_avro.py`` (files we
write are read back through ``org.apache.avro.file.DataFileReader``
and vice versa).

Scope, deliberately minimal but spec-complete for Iceberg metadata:

- container format: magic ``Obj\\x01``, file-metadata map
  (``avro.schema``, ``avro.codec``), 16-byte sync marker, then
  ``(count, byte-size, payload, sync)`` blocks;
- codecs: ``null`` and ``deflate`` (raw DEFLATE, no zlib wrapper —
  the two codecs every Avro implementation must support and the two
  Iceberg writers emit);
- types: all primitives, records, enums, arrays, maps, unions,
  fixed — including the negative-block-count array/map form the
  spec allows;
- decoding always follows the *writer* schema embedded in the file
  (no reader-schema resolution: Iceberg readers list files, they do
  not project manifests through foreign schemas).

Logical types are intentionally surfaced raw (e.g. a
``timestamp-micros`` long stays an int, decimal bytes stay bytes):
Iceberg's manifest consumers treat those as opaque and this codec
does not guess.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from hashlib import md5
from typing import Any, BinaryIO, Iterable

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# --------------------------------------------------------------- schema


class _Names:
    """Registry of named types (record/enum/fixed) so later references
    by full name resolve — Iceberg manifest schemas reference the
    partition record (``r102``) and stats key/value records by name."""

    def __init__(self) -> None:
        self.types: dict[str, Any] = {}

    def define(self, schema: dict) -> None:
        name = schema["name"]
        ns = schema.get("namespace")
        self.types[name] = schema
        if ns:
            self.types[f"{ns}.{name}"] = schema

    def resolve(self, ref: str) -> Any:
        if ref in _PRIMITIVES:
            return ref
        if ref in self.types:
            return self.types[ref]
        raise ValueError(f"unresolved Avro type reference: {ref!r}")


def parse_schema(src: str | dict | list) -> tuple[Any, _Names]:
    schema = json.loads(src) if isinstance(src, str) else src
    names = _Names()
    _walk_names(schema, names)
    return schema, names


def _walk_names(schema: Any, names: _Names) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed", "error"):
            names.define(schema)
        if t == "record":
            for f in schema["fields"]:
                _walk_names(f["type"], names)
        elif t == "array":
            _walk_names(schema["items"], names)
        elif t == "map":
            _walk_names(schema["values"], names)
    elif isinstance(schema, list):
        for branch in schema:
            _walk_names(branch, names)


# --------------------------------------------------------------- binary


def write_long(out: io.BytesIO, n: int) -> None:
    if not -(1 << 63) <= n < (1 << 63):
        # the zigzag mask below would silently WRAP an out-of-range
        # Python int into a different value
        raise ValueError(f"{n} does not fit a signed 64-bit long")
    z = (n << 1) ^ (n >> 63)  # arithmetic shift keeps the sign bit
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def read_long(buf: BinaryIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


class _Encoder:
    def __init__(self, names: _Names) -> None:
        self.names = names
        self.out = io.BytesIO()

    def encode(self, schema: Any, value: Any) -> None:
        if isinstance(schema, str):
            schema = self.names.resolve(schema)
        if isinstance(schema, list):  # union
            self._union(schema, value)
            return
        if isinstance(schema, str):
            self._primitive(schema, value)
            return
        t = schema["type"]
        if t in _PRIMITIVES:
            self._primitive(t, value)
        elif t == "record":
            for f in schema["fields"]:
                # explicit membership check, NOT try/except around
                # the recursive encode — a KeyError raised deeper
                # (malformed nested schema) must not be mislabeled
                # as a missing field of THIS record
                if f["name"] not in value:
                    raise ValueError(
                        f"record {schema['name']!r} missing field "
                        f"{f['name']!r}"
                    )
                self.encode(f["type"], value[f["name"]])
        elif t == "array":
            items = list(value)
            if items:
                write_long(self.out, len(items))
                for it in items:
                    self.encode(schema["items"], it)
            write_long(self.out, 0)
        elif t == "map":
            entries = dict(value)
            if entries:
                write_long(self.out, len(entries))
                for k, v in entries.items():
                    self._primitive("string", k)
                    self.encode(schema["values"], v)
            write_long(self.out, 0)
        elif t == "enum":
            self.out.write(
                _varint_bytes(schema["symbols"].index(value))
            )
        elif t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError(
                    f"fixed {schema['name']} wants {schema['size']} bytes, "
                    f"got {len(value)}"
                )
            self.out.write(bytes(value))
        else:
            raise ValueError(f"cannot encode Avro type {t!r}")

    def _union(self, branches: list, value: Any) -> None:
        idx = _pick_branch(branches, value, self.names)
        write_long(self.out, idx)
        self.encode(branches[idx], value)

    def _primitive(self, t: str, v: Any) -> None:
        o = self.out
        if t == "null":
            if v is not None:
                raise ValueError(f"null schema cannot hold {v!r}")
        elif t == "boolean":
            o.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            # same loud-error contract as the union matcher: a
            # non-integral float in an int/long slot must raise, not
            # silently round (int(7.9) -> 7 corrupts the value); and
            # integral floats beyond float64's exact range already
            # lost precision upstream
            if isinstance(v, float) and (
                not v.is_integer() or abs(v) > 2.0 ** 53
            ):
                raise ValueError(
                    f"cannot encode float {v!r} as Avro {t}"
                )
            iv = int(v)
            if t == "int" and not -(1 << 31) <= iv < (1 << 31):
                raise ValueError(f"{iv} does not fit an Avro int")
            write_long(o, iv)
        elif t == "float":
            o.write(struct.pack("<f", float(v)))
        elif t == "double":
            o.write(struct.pack("<d", float(v)))
        elif t == "bytes":
            b = bytes(v)
            write_long(o, len(b))
            o.write(b)
        elif t == "string":
            b = v.encode("utf-8")
            write_long(o, len(b))
            o.write(b)
        else:  # pragma: no cover
            raise ValueError(f"unknown primitive {t!r}")


def _varint_bytes(n: int) -> bytes:
    tmp = io.BytesIO()
    write_long(tmp, n)
    return tmp.getvalue()


def _branch_name(branch: Any) -> str:
    if isinstance(branch, str):
        return branch
    return branch.get("name", branch["type"])


def _pick_branch(branches: list, value: Any, names: _Names) -> int:
    """Union branch selection by Python type — sufficient for the
    [null, T] and [null, recordA, recordB-disambiguated-by-keys]
    unions Iceberg metadata uses."""
    def matches(branch: Any) -> bool:
        b = names.resolve(branch) if isinstance(branch, str) else branch
        t = b if isinstance(b, str) else b["type"]
        if t == "null":
            return value is None
        if value is None:
            return False
        if t == "boolean":
            return isinstance(value, bool)
        if t in ("int", "long"):
            # integral floats are accepted ONLY inside float64's
            # exact-integer range: a nullable int64 column arrives
            # from the Arrow->pandas bridge as float64 (NaN for
            # null), so 7.0 in a [null, long] union is a long — but
            # a float beyond ±2^53 has already lost integer
            # precision upstream, and silently writing the rounded
            # long would corrupt the value, so it stays unmatched
            # (loud error) instead
            return (isinstance(value, int) and not isinstance(value, bool)) \
                or (isinstance(value, float) and value.is_integer()
                    and abs(value) <= 2.0 ** 53)
        if t in ("float", "double"):
            return isinstance(value, float)
        if t in ("bytes", "fixed"):
            return isinstance(value, (bytes, bytearray))
        if t in ("string", "enum"):
            return isinstance(value, str)
        if t == "array":
            return isinstance(value, (list, tuple))
        if t in ("map", "record", "error"):
            return isinstance(value, dict)
        return False

    hits = [i for i, br in enumerate(branches) if matches(br)]
    if not hits:
        raise ValueError(
            f"no union branch in {[_branch_name(b) for b in branches]} "
            f"matches {type(value).__name__}"
        )
    if len(hits) > 1 and isinstance(value, dict):
        # multi-record unions disambiguate by the value's keys:
        # first-match would silently pick the first record branch
        # and DROP the fields it lacks
        def fields_of(i: int) -> set[str] | None:
            b = branches[i]
            b = names.resolve(b) if isinstance(b, str) else b
            if isinstance(b, dict) and b.get("type") in ("record",
                                                         "error"):
                return {f["name"] for f in b["fields"]}
            return None

        keys = set(value)
        recs = {i: f for i in hits
                if (f := fields_of(i)) is not None}
        if len(recs) > 1:
            exact = [i for i, f in recs.items() if f == keys]
            if len(exact) == 1:
                return exact[0]
            supers = [i for i, f in recs.items() if f >= keys]
            if supers:
                return min(supers, key=lambda i: len(recs[i]))
            raise ValueError(
                "value keys match no record branch of the union "
                f"{[_branch_name(branches[i]) for i in recs]}: "
                f"{sorted(keys)}"
            )
    return hits[0]


class _Decoder:
    def __init__(self, data: bytes, names: _Names) -> None:
        self.buf = io.BytesIO(data)
        self.names = names

    def decode(self, schema: Any) -> Any:
        if isinstance(schema, str):
            schema = self.names.resolve(schema)
        if isinstance(schema, list):  # union: branch index prefix
            idx = read_long(self.buf)
            if not 0 <= idx < len(schema):
                raise ValueError(f"union branch {idx} out of range")
            return self.decode(schema[idx])
        if isinstance(schema, str):
            return self._primitive(schema)
        t = schema["type"]
        if t in _PRIMITIVES:
            return self._primitive(t)
        if t == "record":
            return {
                f["name"]: self.decode(f["type"]) for f in schema["fields"]
            }
        if t == "array":
            return list(self._blocks(schema["items"]))
        if t == "map":
            out = {}
            for _ in self._block_counts():
                k = self._primitive("string")
                out[k] = self.decode(schema["values"])
            return out
        if t == "enum":
            return schema["symbols"][read_long(self.buf)]
        if t == "fixed":
            return self._read(schema["size"])
        raise ValueError(f"cannot decode Avro type {t!r}")

    def _blocks(self, item_schema: Any):
        for _ in self._block_counts():
            yield self.decode(item_schema)

    def _block_counts(self):
        """Array/map block protocol: a count per block, 0 terminates;
        a NEGATIVE count means |count| items preceded by the block's
        byte size (which a streaming reader could skip — we just read
        through it)."""
        while True:
            count = read_long(self.buf)
            if count == 0:
                return
            if count < 0:
                count = -count
                read_long(self.buf)  # block byte size, unused here
            for _ in range(count):
                yield None

    def _read(self, n: int) -> bytes:
        b = self.buf.read(n)
        if len(b) != n:
            raise EOFError(f"wanted {n} bytes, got {len(b)}")
        return b

    def _primitive(self, t: str) -> Any:
        if t == "null":
            return None
        if t == "boolean":
            return self._read(1) != b"\x00"
        if t in ("int", "long"):
            return read_long(self.buf)
        if t == "float":
            return struct.unpack("<f", self._read(4))[0]
        if t == "double":
            return struct.unpack("<d", self._read(8))[0]
        if t == "bytes":
            return self._read(read_long(self.buf))
        if t == "string":
            return self._read(read_long(self.buf)).decode("utf-8")
        raise ValueError(f"unknown primitive {t!r}")  # pragma: no cover


# ------------------------------------------------------------ container


_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(
    path: str,
    schema: str | dict,
    records: Iterable[dict],
    *,
    codec: str = "deflate",
    metadata: dict[str, str | bytes] | None = None,
    block_records: int = 1000,
) -> bytes:
    """Write an Avro Object Container File; returns the file bytes
    (also written to ``path`` unless it is empty)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema_json = schema if isinstance(schema, str) else json.dumps(schema)
    parsed, names = parse_schema(schema_json)

    meta = {"avro.schema": schema_json, "avro.codec": codec}
    for k, v in (metadata or {}).items():
        if k in ("avro.schema", "avro.codec"):
            # records are encoded with `schema`/`codec`; a header
            # advertising different values would make every reader
            # mis-decode the payload
            raise ValueError(f"metadata key {k!r} is reserved")
        if not isinstance(v, (str, bytes, bytearray)):
            # bytes(int) builds N NUL bytes — silent corruption;
            # stringify scalars instead
            v = str(v)
        meta[k] = v

    # deterministic sync marker (content-derived, so identical writes
    # produce identical bytes — keeps fixtures and driver hashes stable)
    sync = md5(schema_json.encode() + str(sorted(meta)).encode()).digest()

    out = io.BytesIO()
    out.write(MAGIC)
    enc = _Encoder(names)
    enc.out = out
    enc.encode(
        _META_SCHEMA,
        {
            k: (v.encode("utf-8") if isinstance(v, str) else bytes(v))
            for k, v in meta.items()
        },
    )
    out.write(sync)

    recs = list(records)
    for start in range(0, len(recs), block_records):
        chunk = recs[start:start + block_records]
        benc = _Encoder(names)
        for r in chunk:
            benc.encode(parsed, r)
        payload = benc.out.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw DEFLATE
            payload = co.compress(payload) + co.flush()
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)

    data = out.getvalue()
    if path:
        with open(path, "wb") as fh:
            fh.write(data)
    return data


def read_ocf(src: str | bytes) -> tuple[dict | list | str, dict, list]:
    """Read an Avro OCF → ``(writer_schema, file_metadata, records)``.
    ``src`` is a path or raw bytes. File metadata values are returned
    as ``str`` when UTF-8-decodable, else ``bytes``."""
    if isinstance(src, (bytes, bytearray)):
        raw = bytes(src)
    else:
        with open(src, "rb") as fh:
            raw = fh.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")

    hdr = _Decoder(raw[4:], _Names())
    meta_raw = hdr.decode(_META_SCHEMA)
    consumed = 4 + hdr.buf.tell()
    meta: dict[str, Any] = {}
    for k, v in meta_raw.items():
        try:
            meta[k] = v.decode("utf-8")
        except UnicodeDecodeError:
            meta[k] = v
    schema_json = meta["avro.schema"]
    codec = meta.get("avro.codec", "null")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    parsed, names = parse_schema(schema_json)

    sync = raw[consumed:consumed + 16]
    pos = consumed + 16
    records: list = []
    view = io.BytesIO(raw)
    view.seek(pos)
    while view.tell() < len(raw):
        count = read_long(view)
        size = read_long(view)
        payload = view.read(size)
        if len(payload) != size:
            raise EOFError("truncated Avro block")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        dec = _Decoder(payload, names)
        for _ in range(count):
            records.append(dec.decode(parsed))
        marker = view.read(16)
        if marker != sync:
            raise ValueError("Avro block sync marker mismatch")
    return json.loads(schema_json), meta, records
