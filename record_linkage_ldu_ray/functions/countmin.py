"""Count-Min sketch over 64-bit key hashes (mergeable frequency estimator).

Completes the engine's sketch family (MinHash / SimHash / HLL / bottom-k /
Bloom / CMS).  A (d × w) counter matrix; each key increments one counter
per row (d independent splitmix64 streams), the estimate is the min across
rows.  Properties the pipelines rely on, each pytest-pinned:

- NEVER underestimates: estimate ≥ true count (one-sided error, the safe
  direction for heavy-hitter screening and contamination triage);
- overestimate bounded: ≤ true + 2N/w with prob ≥ 1 − (1/2)^d over the
  hash choice (N = total insertions);
- mergeable: element-wise SUM of two sketches == the sketch of the
  concatenated stream, exactly — so per-block partial sketches combine
  associatively through a tiny driver (or tree) merge, the same contract
  as every other sketch here, making results partitioning-invariant.
"""

from __future__ import annotations

import numpy as np

from record_linkage_ldu_ray.functions.hashing import splitmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _cols(hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) column indices — one independent stream per row."""
    h = np.asarray(hashes, dtype=np.uint64)
    out = np.empty((d, len(h)), np.int64)
    with np.errstate(over="ignore"):
        for i in range(d):
            out[i] = (splitmix64(h ^ np.uint64(i + 1) * _GOLDEN) % np.uint64(w)).astype(
                np.int64
            )
    return out


def cms_build(hashes: np.ndarray, d: int = 4, w: int = 1 << 14) -> np.ndarray:
    """Build a (d, w) int64 Count-Min sketch from uint64 key hashes
    (each occurrence counts — pass the raw stream, not distincts)."""
    m = np.zeros((d, w), np.int64)
    if len(hashes):
        cols = _cols(hashes, d, w)
        for i in range(d):
            np.add.at(m[i], cols[i], 1)
    return m


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Associative merge (element-wise sum)."""
    return a + b


def cms_estimate(m: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Estimated count per key (min over rows) — always ≥ the true count."""
    d, w = m.shape
    if len(hashes) == 0:
        return np.zeros(0, np.int64)
    cols = _cols(hashes, d, w)
    est = m[0][cols[0]]
    for i in range(1, d):
        est = np.minimum(est, m[i][cols[i]])
    return est
