"""Similarity kernels (reference: compare_ldu_hw.py:66-76 dispatch —
``td.ratcliff_obershelp`` for long multi-token fields, normalized
Levenshtein for short fields; both in [0, 1]).

Graft additions per the north star: token-set Jaccard (long-field analog),
Jaro-Winkler (short-field analog), timestamp-gap similarity.  All are plain
deterministic functions; the scorer actor (stages/scoring.py) holds the
dispatch table as state.
"""

from __future__ import annotations

import math
from difflib import SequenceMatcher

import numpy as np


def ratcliff_obershelp(s1: str, s2: str) -> float:
    """Ratcliff/Obershelp similarity — same algorithm difflib implements
    (the reference uses textdistance's, compare_ldu_hw.py:69)."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return SequenceMatcher(None, s1, s2).ratio()


def levenshtein_normalized(s1: str, s2: str) -> float:
    """1 - levenshtein(s1, s2) / max(len); vectorized DP over numpy rows."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    if n1 < n2:
        s1, s2, n1, n2 = s2, s1, n2, n1
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    m = len(b)
    jr = np.arange(m + 1)
    prev = jr.astype(np.int64)
    for i, ca in enumerate(a, 1):
        # deletion/substitution candidates, vectorized
        t = np.minimum(prev[1:] + 1, prev[:-1] + (b != ca))
        # insertion chain cur[j] = min_{k<=j} (u[k] + (j-k)) via cumulative min
        u = np.concatenate(([i], t))
        prev = np.minimum.accumulate(u - jr) + jr
    dist = int(prev[-1])
    return 1.0 - dist / max(n1, n2)


def jaro(s1: str, s2: str) -> float:
    n1, n2 = len(s1), len(s2)
    if n1 == 0 and n2 == 0:
        return 1.0
    if n1 == 0 or n2 == 0:
        return 0.0
    match_dist = max(n1, n2) // 2 - 1
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    b_matched = np.zeros(n2, dtype=bool)
    a_match_idx = np.full(n1, -1, dtype=np.int64)
    for i in range(n1):
        lo = max(0, i - match_dist)
        hi = min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == a[i]:
                b_matched[j] = True
                a_match_idx[i] = j
                break
    m_idx = a_match_idx[a_match_idx >= 0]
    m = len(m_idx)
    if m == 0:
        return 0.0
    # transpositions: matched chars of a, in order, vs matched chars of b in order
    t = int(np.count_nonzero(a[a_match_idx >= 0] != b[np.sort(m_idx)])) // 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler in [0, 1] (prefix boost over plain Jaro)."""
    j = jaro(s1, s2)
    if j == 0.0:
        return 0.0
    ell = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        ell += 1
    return j + ell * prefix_weight * (1.0 - j)


def jaccard_sorted_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two SORTED-UNIQUE uint64 token-hash arrays.

    O(m log n) vectorized searchsorted — the per-pair hot path of the
    scorer; token sets are pre-hashed/pre-sorted once per conversation in
    feature extraction, not per pair.
    """
    na, nb = len(a), len(b)
    if na == 0 and nb == 0:
        return 1.0
    if na == 0 or nb == 0:
        return 0.0
    if na > nb:
        a, b, na, nb = b, a, nb, na
    idx = np.searchsorted(b, a)
    idx[idx == nb] = nb - 1
    inter = int(np.count_nonzero(b[idx] == a))
    return inter / (na + nb - inter)


def ngram_jaccard(s1: str, s2: str, n: int = 3) -> float:
    """Character n-gram Jaccard (dedup library kernel)."""
    if s1 == s2:
        return 1.0
    g1 = {s1[i : i + n] for i in range(max(0, len(s1) - n + 1))}
    g2 = {s2[i : i + n] for i in range(max(0, len(s2) - n + 1))}
    if not g1 and not g2:
        return 1.0
    if not g1 or not g2:
        return 0.0
    inter = len(g1 & g2)
    return inter / (len(g1) + len(g2) - inter)


def ts_gap_similarity(delta_seconds: np.ndarray, tau: float) -> np.ndarray:
    """Timestamp-gap feature: exp(-|Δ| / tau), vectorized, in (0, 1]."""
    return np.exp(-np.abs(delta_seconds) / tau)


def minmax_ratio(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min/max ratio similarity for counts (e.g. n_turns); 1.0 when both 0."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    out = np.ones_like(hi)
    nz = hi > 0
    out[nz] = lo[nz] / hi[nz]
    return out


def hamming_similarity_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of equal elements of two equal-length uint64 vectors —
    the MinHash Jaccard estimator."""
    if len(a) == 0:
        return 0.0
    return float(np.count_nonzero(a == b)) / len(a)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token-hash multiset (near-dup kernel)."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    if weights is None:
        v = bits.sum(axis=0) * 2 - len(token_hashes)
    else:
        v = (bits * weights[:, None]).sum(axis=0) * 2 - weights.sum()
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_hamming_sim(h1: int, h2: int) -> float:
    """1 - hamming(h1, h2)/64 for two 64-bit SimHashes."""
    x = np.uint64(h1) ^ np.uint64(h2)
    return 1.0 - bin(int(x)).count("1") / 64.0


def exp_decay(x: float, tau: float) -> float:
    return math.exp(-abs(x) / tau)
