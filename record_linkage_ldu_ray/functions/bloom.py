"""Vectorized Bloom filter over 64-bit hashes (sketch library, SURVEY §2.9
family: MinHash / SimHash / HLL / bottom-k / Bloom).

The filter is a plain uint64 bitset + k derived probe positions per key, so
it is (a) mergeable by bitwise OR — partial filters built per batch combine
associatively like every other sketch in the engine — and (b) broadcast-
friendly: ``m_bits/8`` bytes ship once via ``ray.put`` however many keys
went in, the memory-bounded alternative to an exact sorted-hash set when
the "small side" of a membership probe stops being small.

Probe positions are independent splitmix64 streams of the key (Kirsch-
Mitzenstein double hashing needs only two independents; we derive each of
the k positions from its own odd multiplier for simplicity — still fully
vectorized).  False-negative-free by construction; false-positive rate is
the standard (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import numpy as np

from record_linkage_ldu_ray.functions.hashing import splitmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(k, n) bit positions for each key — pure uint64 arithmetic."""
    h = hashes.astype(np.uint64, copy=False)
    out = np.empty((k, len(h)), np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            out[i] = splitmix64(h + np.uint64(2 * i + 1) * _GOLDEN)
    return out % np.uint64(m_bits)


def bloom_build(hashes: np.ndarray, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Build a Bloom bitset (uint64 words) from uint64 key hashes."""
    assert m_bits % 64 == 0
    words = np.zeros(m_bits // 64, np.uint64)
    if len(hashes):
        pos = _positions(np.asarray(hashes), k, m_bits).ravel()
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Associative merge of two same-shape filters (bitwise OR)."""
    return np.bitwise_or(a, b)


def bloom_probe(words: np.ndarray, hashes: np.ndarray, k: int = 4) -> np.ndarray:
    """Membership probe: True = possibly present (no false negatives)."""
    m_bits = len(words) * 64
    n = len(hashes)
    if n == 0:
        return np.zeros(0, bool)
    pos = _positions(np.asarray(hashes), k, m_bits)
    hit = np.ones(n, bool)
    for i in range(k):
        w = words[(pos[i] >> np.uint64(6)).astype(np.int64)]
        hit &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
    return hit
