"""Deterministic vectorized hashing.

The reference keys records by positional pandas index (fragile,
pre_processing.py:153-154); this engine keys by content hashes that must be
identical across processes and cluster sizes.  Python's builtin ``hash`` is
salted per process, so we implement FNV-1a over Arrow string buffers in
numpy (wrapping uint64 arithmetic) plus splitmix64 finalization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _as_single_array(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.string())
    # binary and string share the (offsets, data) buffer layout, so the
    # byte fold below works on both — only the offset width differs
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    return arr, off_dtype


def fnv1a_hash_strings(arr, seed: int = 0) -> np.ndarray:
    """uint64 FNV-1a hash per string.  Nulls and empty strings hash to the
    seed-dependent offset basis (callers mask nulls themselves if needed).

    Vectorized: one pass per byte position (strings here are short tokens /
    keys), each pass a masked numpy gather — no per-row Python.
    """
    arr, off_dtype = _as_single_array(arr)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1]
    offsets = offsets.astype(np.int64, copy=False)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)

    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFFSET ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        lengths = offsets[1:] - offsets[:-1]
        starts = offsets[:-1]
        maxlen = int(lengths.max()) if n else 0
        for i in range(maxlen):
            mask = lengths > i
            if not mask.any():
                break
            byte = data[starts[mask] + i].astype(np.uint64)
            h[mask] = (h[mask] ^ byte) * _FNV_PRIME
    return splitmix64(h)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def pair_hash(a_col, b_col, seed: int = 0) -> np.ndarray:
    """uint64 hash of the canonical pair key 'a|b' (vectorized)."""
    import pyarrow.compute as pc

    if isinstance(a_col, pa.ChunkedArray):
        a_col = a_col.combine_chunks()
    if isinstance(b_col, pa.ChunkedArray):
        b_col = b_col.combine_chunks()
    if pa.types.is_large_string(a_col.type) or pa.types.is_large_string(b_col.type):
        a_col = a_col.cast(pa.large_string())
        b_col = b_col.cast(pa.large_string())
        sep = pa.scalar("|", pa.large_string())
    else:
        sep = pa.scalar("|", pa.string())
    key = pc.binary_join_element_wise(a_col, b_col, sep)
    return fnv1a_hash_strings(key, seed)


def combine_hash_columns(cols: np.ndarray) -> np.ndarray:
    """Combine an (n, k) uint64 matrix row-wise into one uint64 per row
    (polynomial rolling + splitmix finalize).  Used for LSH band keys."""
    with np.errstate(over="ignore"):
        h = np.full(cols.shape[0], _FNV_OFFSET, dtype=np.uint64)
        for j in range(cols.shape[1]):
            h = (h ^ cols[:, j]) * _FNV_PRIME
    return splitmix64(h)
