"""Iceberg partition transforms — hidden partitioning.

The reference's Iceberg catalog supports transform-partitioned
tables (``bucket[N]``, ``truncate[W]``, ``year/month/day/hour``);
adopting one requires evaluating the transform on filter literals so
partition pruning still works when the partition value is a DERIVED
value (a hash bucket, a truncated prefix, an epoch-day ordinal) —
that is the entire point of hidden partitioning: queries filter on
the SOURCE column, the layout prunes on the transform.

``bucket[N]`` is defined by the spec as ``(murmur3_x86_32(bytes) &
MAX_INT) % N`` over the value's canonical bytes (longs and ints hash
as 8-byte little-endian longs, strings as UTF-8, dates as the
day-ordinal int widened to long, timestamps as micros). The
murmur3_x86_32 here is validated against the reference hash values
published in the Iceberg spec appendix (34 -> 2017239379,
"iceberg" -> 1210000089, ...) in ``tests/test_transforms.py`` — an
independent check against the spec, not a self-roundtrip.

Monotonic transforms (truncate, year/month/day/hour) also map RANGE
predicates: ``ts BETWEEN a AND b`` prunes to ``day(ts) BETWEEN
day(a) AND day(b)``. Bucket is non-monotonic, so only equality/IN
prunes through it (ranges scan all buckets — the correct, safe
answer).
"""

from __future__ import annotations

import datetime as dt
import struct

_EPOCH = dt.date(1970, 1, 1)
_EPOCH_TS = dt.datetime(1970, 1, 1)


# ----------------------------------------------------- murmur3_x86_32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32, returning a SIGNED 32-bit int (the Java
    convention Iceberg's bucket transform uses)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n - (n % 4)
    for i in range(0, rounded, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[rounded:]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _hash_bytes_for(ice_type: str, v) -> bytes:
    """Canonical byte form per spec Appendix B."""
    if ice_type in ("int", "long"):
        return struct.pack("<q", int(v))
    if ice_type == "date":
        return struct.pack("<q", _to_epoch_days(v))
    if ice_type in ("timestamp", "timestamptz"):
        return struct.pack("<q", _to_epoch_micros(v))
    if ice_type == "string":
        return str(v).encode("utf-8")
    if ice_type == "binary":
        return bytes(v)
    if ice_type in ("float", "double"):
        # spec: hash doubles as their IEEE-754 long bits; floats
        # widen to double first. -0.0 canonicalizes to 0.0 and every
        # NaN to the canonical quiet NaN (doubleToLongBits semantics)
        # — SQL equality treats 0.0 = -0.0, so the two MUST land in
        # the same bucket or an equality filter on 0.0 would prune
        # files whose partition tuple says the -0.0 bucket
        f = float(v)
        if f != f:  # NaN
            return struct.pack("<Q", 0x7FF8000000000000)
        if f == 0.0:
            f = 0.0
        return struct.pack("<d", f)
    raise ValueError(f"bucket transform unsupported on {ice_type!r}")


def bucket(n: int, ice_type: str, v) -> int | None:
    if v is None:
        return None
    return (murmur3_32(_hash_bytes_for(ice_type, v)) & 0x7FFFFFFF) % n


# ------------------------------------------------- temporal helpers


def _to_epoch_days(v) -> int:
    if isinstance(v, dt.datetime):
        return (v.date() - _EPOCH).days
    if isinstance(v, dt.date):
        return (v - _EPOCH).days
    return int(v)  # already an ordinal


def _to_epoch_micros(v) -> int:
    # integer arithmetic throughout: double has 53 mantissa bits, so
    # total_seconds()*1e6 / timestamp()*1e6 drop 1 us on ~1% of
    # modern timestamps — enough to land a bucket[N] hash in the
    # wrong partition and silently prune matching files
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            # aware: absolute instant vs the UTC epoch (anchoring the
            # epoch at the VALUE's offset would skew by that offset)
            td = v - _EPOCH_TS.replace(tzinfo=dt.timezone.utc)
        else:
            td = v - _EPOCH_TS
        return (td.days * 86_400_000_000 + td.seconds * 1_000_000
                + td.microseconds)
    return int(v)


def _as_datetime(ice_type: str, v) -> dt.datetime:
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    if ice_type == "date":
        return dt.datetime.combine(
            _EPOCH + dt.timedelta(days=int(v)), dt.time()
        )
    return _EPOCH_TS + dt.timedelta(microseconds=int(v))


# ------------------------------------------------- transform dispatch


def parse_transform(name: str) -> tuple[str, int | None]:
    """'bucket[16]' -> ('bucket', 16); 'day' -> ('day', None)."""
    name = name.strip()
    if "[" in name:
        base, arg = name[:-1].split("[", 1)
        return base, int(arg)
    return name, None


def apply_transform(transform: str, ice_type: str, v):
    """Evaluate a transform on a single source value (None-safe,
    matching spec null handling: transforms of null are null)."""
    if v is None:
        return None
    base, arg = parse_transform(transform)
    if base == "identity":
        # canonical representation: temporal values compare as their
        # epoch ordinals (how partition tuples and bounds store them)
        if ice_type == "date":
            return _to_epoch_days(v)
        if ice_type in ("timestamp", "timestamptz"):
            return _to_epoch_micros(v)
        return v
    if base == "void":
        return None
    if base == "bucket":
        return bucket(arg, ice_type, v)
    if base == "truncate":
        if ice_type in ("int", "long"):
            return int(v) - (int(v) % arg)  # floors toward -inf
        if ice_type == "string":
            return str(v)[:arg]
        raise ValueError(f"truncate unsupported on {ice_type!r}")
    if base in ("day", "days"):
        return _to_epoch_micros(_norm_utc(ice_type, v)) // 86_400_000_000
    if base in ("hour", "hours"):
        return _to_epoch_micros(_norm_utc(ice_type, v)) // 3_600_000_000
    d = _norm_utc(ice_type, v)
    if base in ("month", "months"):
        return (d.year - 1970) * 12 + (d.month - 1)
    if base in ("year", "years"):
        return d.year - 1970
    raise ValueError(f"unknown transform {transform!r}")


def _norm_utc(ice_type: str, v) -> dt.datetime:
    """Value -> naive UTC datetime (aware values convert; naive and
    date/ordinal values are taken at face value)."""
    d = _as_datetime(ice_type, v)
    if d.tzinfo is not None:
        d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return d


def is_monotonic(transform: str) -> bool:
    base, _ = parse_transform(transform)
    return base in ("identity", "truncate", "day", "days", "month",
                    "months", "year", "years", "hour", "hours")


def transform_filter(transform: str, ice_type: str, cond):
    """Map a source-column filter condition through the transform to
    a condition on the PARTITION value, or None when the transform
    cannot prune it (e.g. a range through bucket). ``cond`` uses the
    scan-planner convention: 2-tuple = inclusive range, otherwise a
    value or list of values (IN)."""
    if isinstance(cond, tuple) and len(cond) == 2:
        if not is_monotonic(transform):
            return None
        lo, hi = cond
        return (
            apply_transform(transform, ice_type, lo),
            apply_transform(transform, ice_type, hi),
        )
    vals = cond if isinstance(cond, (list, set)) else [cond]
    return [apply_transform(transform, ice_type, v) for v in vals]
