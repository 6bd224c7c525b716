"""MinHash signatures + LSH band keys (the graft's blocking sketch).

The reference does a full cartesian index (compare_ldu_hw.py:160-162) and
its README recommends blocking for larger data (README.md:245).  At
10^12-turn scale the candidate space must come from LSH over MinHash
signatures of the conversation token set, plus a phonetic/prefix key.

Deterministic: permutation parameters derive from the config seed via a
seeded Generator — fixed config → byte-identical signatures at any
parallelism.
"""

from __future__ import annotations

import numpy as np

from record_linkage_ldu_ray.config import BlockingConfig, MinHashConfig
from record_linkage_ldu_ray.functions.hashing import combine_hash_columns, splitmix64

_MERSENNE61 = np.uint64((1 << 61) - 1)
EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def perm_params(cfg: MinHashConfig) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) arrays of shape (num_perm,) for h_i(x) = (a_i*x + b_i) mod M61."""
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, int(_MERSENNE61), size=cfg.num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE61), size=cfg.num_perm, dtype=np.uint64)
    return a, b


def minhash_segments(
    token_hashes: np.ndarray,
    offsets: np.ndarray,
    params: tuple[np.ndarray, np.ndarray],
) -> np.ndarray:
    """MinHash signatures for many records at once.

    ``token_hashes``: flat uint64 array of all records' token hashes;
    ``offsets``: int64 array (n+1,) delimiting each record's slice.
    Returns (n, num_perm) uint64.  Empty records get EMPTY_SENTINEL rows
    (an empty token set never LSH-collides with anything by accident —
    matches missing→0 semantics, README.md:169).

    Vectorized: (T, K) permuted-hash matrix, segment-min via
    ``np.minimum.reduceat`` — no per-record Python loop.
    """
    a, b = params
    k = len(a)
    n = len(offsets) - 1
    out = np.full((n, k), EMPTY_SENTINEL, dtype=np.uint64)
    if len(token_hashes) == 0 or n == 0:
        return out
    lengths = offsets[1:] - offsets[:-1]
    nonempty = lengths > 0
    if not nonempty.any():
        return out
    x = token_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        # (T, K): wrapping 64-bit a*x+b then splitmix keeps the map uniform
        # without 128-bit mod arithmetic.
        hv = splitmix64(x[:, None] * a[None, :] + b[None, :])
    starts = offsets[:-1][nonempty].astype(np.int64)
    mins = np.minimum.reduceat(hv, starts, axis=0)
    # reduceat with consecutive equal starts is avoided by filtering empties;
    # but reduceat on starts of nonempty segments still spans into the next
    # segment when segments are non-contiguous?  No: reduceat reduces
    # [starts[i], starts[i+1]) — gaps only occur when a dropped (empty)
    # segment sits between two nonempty ones, and empty segments occupy zero
    # flat positions, so slices stay exact.
    out[nonempty] = mins
    return out


def lsh_band_hashes(signatures: np.ndarray, cfg: BlockingConfig) -> np.ndarray:
    """(n, bands) uint64 band keys from (n, bands*rows_per_band) signatures.

    Band index is mixed into the key so identical row-hashes in different
    bands never collide into one block.
    """
    n, k = signatures.shape
    assert k == cfg.bands * cfg.rows_per_band, (k, cfg.bands, cfg.rows_per_band)
    keys = np.empty((n, cfg.bands), dtype=np.uint64)
    for j in range(cfg.bands):
        band = signatures[:, j * cfg.rows_per_band : (j + 1) * cfg.rows_per_band]
        with np.errstate(over="ignore"):
            keys[:, j] = splitmix64(combine_hash_columns(band) + np.uint64(j))
    return keys
