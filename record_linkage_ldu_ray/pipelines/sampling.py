"""Deterministic sampling / splitting operators for training-data curation.

A 100 TB pipeline never uses RNG-state sampling for train/val/test splits —
membership must be a pure function of the record key so it is stable across
reruns, resumable shards, and engine versions.  Two interchangeable hash
modes, both interval-membership over a uniform hash of ``salt + str(id)``:

- ``hash_fn="fast"`` (default): ``splitmix64(fnv1a(salt_seed, str(id)))``
  compared against uint64 interval thresholds.  Fully vectorized over the
  Arrow string buffers (`functions/hashing.py`) — no per-row Python, the
  mode a 10^12-row corpus uses.
- ``hash_fn="md5"``: hex-digest intervals, byte-identical to DuckDB's
  ``md5()`` so splits are SQL-reproducible (the correctness-oracle mode).
  Per-row ``hashlib`` — embarrassingly parallel but interpreter-bound;
  only for parity checks and small runs.

Both are deterministic, uniform, independent of row order / partitioning /
cluster size, and *nested*: the fraction-f sample is a subset of the
fraction-g sample for f ≤ g (same salt).  Every stage is an embarrassingly
parallel ``map_batches`` with no shuffle and no driver state.

Reference parity: the reference samples with ``df.sample`` / slicing
(analyze_results.py) — non-deterministic across runs; this is the
deterministic replacement a distributed engine needs (SURVEY §2.8 O3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings

_U64_SPAN = 1 << 64


def _hex_threshold(fraction: float) -> str:
    """32-hex-digit threshold t such that P(md5_hex < t) == fraction (up to
    1/2**128): the hex expansion of ``fraction`` scaled to 16**32.
    fraction ≥ 1 returns a sentinel above every hex digest ('g' > 'f');
    fraction ≤ 0 returns the all-zero string (below every digest)."""
    v = int(round(fraction * (1 << 128)))
    if v >= (1 << 128):
        return "g" * 32
    if v <= 0:
        return "0" * 32
    return format(v, "032x")


def _u64_threshold(fraction: float) -> np.uint64:
    """uint64 threshold t such that P(h < t) == fraction up to 1/2**64.
    fraction ≥ 1 clamps to 2**64-1 (bias of one hash value in 2**64 —
    irrelevant and deterministic); fraction ≤ 0 keeps nothing."""
    v = int(round(fraction * _U64_SPAN))
    return np.uint64(min(max(v, 0), _U64_SPAN - 1))


def _md5_hex(ids: pa.Array, salt: str) -> np.ndarray:
    """Oracle-parity hash: per-row md5 hex of ``salt + str(id)`` (matches
    DuckDB ``md5(salt || CAST(id AS VARCHAR))``).  Python loop by design —
    see module docstring; the hot path is :func:`_u64_hash`."""
    pre = salt.encode("utf-8")
    return np.array(
        [hashlib.md5(pre + str(v).encode("utf-8")).hexdigest() for v in ids.to_pylist()],
        dtype=object,
    )


def _u64_hash(ids: pa.Array, salt: str) -> np.ndarray:
    """Vectorized hash: splitmix64-finalized FNV-1a of str(id), seeded by a
    digest of the salt.  No per-row Python — operates on Arrow buffers."""
    seed = int.from_bytes(hashlib.md5(salt.encode("utf-8")).digest()[:8], "big")
    if not (pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type)):
        ids = pc.cast(ids, pa.string())
    return fnv1a_hash_strings(ids, seed=seed)


def _split_assigner(fractions: dict[str, float], salt: str, hash_fn: str):
    """Build a vectorized (ids: pa.Array) -> np.ndarray[object] label
    assigner for consecutive interval membership in the given hash space."""
    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    labels = np.array(names, dtype=object)
    if hash_fn == "md5":
        uppers = np.array(
            [_hex_threshold(c) for c in cum[:-1]] + ["g" * 32], dtype=object
        )

        def _assign(ids: pa.Array) -> np.ndarray:
            hexes = _md5_hex(ids, salt)
            return labels[np.searchsorted(uppers, hexes, side="right")]

    elif hash_fn == "fast":
        uppers = np.array([_u64_threshold(c) for c in cum], dtype=np.uint64)

        def _assign(ids: pa.Array) -> np.ndarray:
            h = _u64_hash(ids, salt)
            # last upper is clamped to 2**64-1; a hash equal to it belongs
            # to the last split, hence the min().
            idx = np.minimum(
                np.searchsorted(uppers, h, side="right"), len(labels) - 1
            )
            return labels[idx]

    else:
        raise ValueError(f"hash_fn must be 'fast' or 'md5', got {hash_fn!r}")
    return _assign


def _keep_mask_fn(fraction: float, salt: str, hash_fn: str):
    """Build a vectorized (ids: pa.Array) -> np.ndarray[bool] Bernoulli
    membership test: keep iff hash < threshold(fraction)."""
    if hash_fn == "md5":
        thr = np.array(_hex_threshold(fraction), dtype=object)

        def _mask(ids: pa.Array) -> np.ndarray:
            return _md5_hex(ids, salt) < thr

    elif hash_fn == "fast":
        if fraction >= 1.0:
            return lambda ids: np.ones(len(ids), bool)
        thr = _u64_threshold(fraction)

        def _mask(ids: pa.Array) -> np.ndarray:
            return _u64_hash(ids, salt) < thr

    else:
        raise ValueError(f"hash_fn must be 'fast' or 'md5', got {hash_fn!r}")
    return _mask


def hash_split(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
    hash_fn: str = "fast",
):
    """Assign every record to a named split by hashing ``salt + str(id)``:
    membership is deterministic, uniform, and independent of row order,
    partitioning, and cluster size.  ``fractions`` maps split name →
    fraction (must sum to 1.0); splits occupy consecutive intervals of the
    hash space in the given order.  ``hash_fn``: see module docstring
    ("fast" vectorized default; "md5" for SQL-oracle parity).

    Output: (``id_col``, split:string) — join it back to route records.
    """
    total = sum(fractions.values())
    assert abs(total - 1.0) < 1e-9, f"fractions must sum to 1.0, got {total}"
    assign = _split_assigner(fractions, salt, hash_fn)

    def _assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        return pa.table({id_col: t[id_col], "split": pa.array(assign(ids), pa.string())})

    return ds.select_columns([id_col]).map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True
    )


def stratified_hash_sample(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    default: float = 0.0,
    cols: list[str] | None = None,
    hash_fn: str = "fast",
):
    """Per-group deterministic Bernoulli sample — the corpus-mixing /
    up-down-weighting step of a training-data pipeline: each group keeps
    its own fraction (groups absent from ``fractions`` keep ``default``).
    Same interval membership as :func:`hash_sample` (stable, nested
    across fractions), still a pure ``map_batches`` filter with no shuffle:
    the per-group threshold lookup is a tiny vectorized searchsorted.
    """
    keys = np.array(sorted(fractions), dtype=object)
    if hash_fn == "md5":
        vals = np.array([_hex_threshold(fractions[g]) for g in keys], dtype=object)
        dflt = _hex_threshold(default)
        hash_ids = lambda ids: _md5_hex(ids, salt)  # noqa: E731
    elif hash_fn == "fast":
        vals = np.array([_u64_threshold(fractions[g]) for g in keys], dtype=np.uint64)
        dflt = _u64_threshold(default)
        hash_ids = lambda ids: _u64_hash(ids, salt)  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be 'fast' or 'md5', got {hash_fn!r}")

    def _filter(t: pa.Table) -> pa.Table:
        keep_cols = cols if cols is not None else t.column_names
        hashes = hash_ids(t[id_col].combine_chunks())
        groups = np.asarray(t[group_col].to_pylist(), dtype=object)
        idx = np.searchsorted(keys, groups)
        idx_c = np.clip(idx, 0, max(len(keys) - 1, 0))
        known = (idx < len(keys)) & (keys[idx_c] == groups) if len(keys) else np.zeros(len(groups), bool)
        thresholds = np.where(known, vals[idx_c] if len(keys) else dflt, dflt)
        mask = pa.array(hashes < thresholds)
        return t.select(keep_cols).filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample(
    ds: "ray.data.Dataset",
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    cols: list[str] | None = None,
    hash_fn: str = "fast",
):
    """Deterministic Bernoulli sample: keep a record iff
    ``hash(salt + str(id)) < threshold(fraction)``.  Same guarantees as
    :func:`hash_split`; pure filter, no shuffle.
    """
    mask_fn = _keep_mask_fn(fraction, salt, hash_fn)

    def _filter(t: pa.Table) -> pa.Table:
        keep = cols if cols is not None else t.column_names
        mask = pa.array(mask_fn(t[id_col].combine_chunks()))
        return t.select(keep).filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)
