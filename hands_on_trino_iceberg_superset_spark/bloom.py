"""Shared Bloom-filter kernel (numpy bitset over xxhash64 values).

One implementation of the sizing formula, the double-hash probe
sequence, and the bitset fold/probe, used by BOTH consumers:

- :meth:`lakehouse.iceberg.IcebergTable.build_bloom_index` /
  ``_bloom_skip`` (per-file point-lookup skipping), and
- :func:`operators.dedup.incremental_exact_mark` (cross-batch
  corpus-membership prefilter).

The double-hash scheme — ``h1 = h % m``, ``h2 = rot17(h) % (m-1) + 1``,
probe ``i`` at ``(h1 + i*h2) % m`` — is a compatibility contract: a
bitset folded by one consumer must be probeable by the other's code
path, so the scheme lives here exactly once.
"""

from __future__ import annotations

import math

import numpy as np


def bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """(m bits, k probes) for ``n`` expected keys at ``fpp`` false-
    positive rate; m rounds up to a whole number of 64-bit words."""
    n = max(n, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _probe_positions(h: np.ndarray, i: int, m: int) -> np.ndarray:
    h1 = h % np.uint64(m)
    h2 = (h >> np.uint64(17) | h << np.uint64(47)) \
        % np.uint64(m - 1) + np.uint64(1)
    return (h1 + np.uint64(i) * h2) % np.uint64(m)


def fold_hashes(bits: np.ndarray, hashes: np.ndarray,
                m: int, k: int) -> None:
    """Set the probe bits of every hash (int64-sourced xxhash64
    values) in ``bits`` (uint64 words, len m//64). In place."""
    h = hashes.astype(np.uint64)
    for i in range(k):
        pos = _probe_positions(h, i, m)
        np.bitwise_or.at(
            bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )


def probe_hashes(bits: np.ndarray, hashes: np.ndarray,
                 m: int, k: int) -> np.ndarray:
    """Vectorized membership test: bool array, True = maybe present
    (no false negatives), False = definitely absent."""
    h = hashes.astype(np.uint64)
    out = np.ones(len(h), dtype=bool)
    for i in range(k):
        pos = _probe_positions(h, i, m)
        out &= (
            bits[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ).astype(np.uint64) & np.uint64(1) > 0
    return out
