"""Deterministic sampling / splitting operators for training-data curation.

A 100 TB pipeline never uses RNG-state sampling for train/val/test splits —
membership must be a pure function of the record key so it is stable across
reruns, resumable shards, and engine versions.  These operators hash the id
with MD5 (public, byte-stable everywhere, SQL-reproducible via DuckDB's
``md5()``) and compare the hex digest against interval thresholds: every
stage is an embarrassingly parallel ``map_batches`` with no shuffle and no
driver state.

Reference parity: the reference samples with ``df.sample`` / slicing
(analyze_results.py) — non-deterministic across runs; this is the
deterministic replacement a distributed engine needs (SURVEY §2.8 O3).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


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


def _md5_hex(ids: pa.Array, salt: str) -> np.ndarray:
    pre = salt.encode("utf-8")
    return np.array(
        [hashlib.md5(pre + str(v).encode("utf-8")).hexdigest() for v in ids.to_pylist()],
        dtype=object,
    )


def hash_split(
    ds: "ray.data.Dataset",
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
):
    """Assign every record to a named split by hashing ``salt + str(id)``:
    membership is deterministic, uniform, and independent of row order,
    partitioning, and cluster size.  ``fractions`` maps split name →
    fraction (must sum to 1.0); splits occupy consecutive intervals of the
    MD5 hex space in the given order.

    Output: (``id_col``, split:string) — join it back to route records.
    """
    total = sum(fractions.values())
    assert abs(total - 1.0) < 1e-9, f"fractions must sum to 1.0, got {total}"
    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    # upper threshold per split; last is the max hex so every hash lands
    uppers = np.array([_hex_threshold(c) for c in cum[:-1]] + ["g" * 32], dtype=object)
    labels = np.array(names, dtype=object)

    def _assign(t: pa.Table) -> pa.Table:
        hexes = _md5_hex(t[id_col].combine_chunks(), salt)
        idx = np.searchsorted(uppers, hexes, side="right")
        return pa.table({id_col: t[id_col], "split": pa.array(labels[idx], pa.string())})

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
):
    """Per-group deterministic Bernoulli sample — the corpus-mixing /
    up-down-weighting step of a training-data pipeline: each group keeps
    its own fraction (groups absent from ``fractions`` keep ``default``).
    Same MD5-interval membership as :func:`hash_sample` (stable, nested
    across fractions), still a pure ``map_batches`` filter with no shuffle:
    the per-group threshold lookup is a tiny vectorized searchsorted.
    """
    thr_map = {g: _hex_threshold(f) for g, f in fractions.items()}
    keys = np.array(sorted(thr_map), dtype=object)
    vals = np.array([thr_map[g] for g in keys], dtype=object)
    dflt = _hex_threshold(default)

    def _filter(t: pa.Table) -> pa.Table:
        keep_cols = cols if cols is not None else t.column_names
        hexes = _md5_hex(t[id_col].combine_chunks(), salt)
        groups = np.asarray(t[group_col].to_pylist(), dtype=object)
        idx = np.searchsorted(keys, groups)
        idx_c = np.clip(idx, 0, max(len(keys) - 1, 0))
        known = (idx < len(keys)) & (keys[idx_c] == groups) if len(keys) else np.zeros(len(groups), bool)
        thresholds = np.where(known, vals[idx_c] if len(keys) else dflt, dflt)
        mask = pa.array(hexes < thresholds)
        return t.select(keep_cols).filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample(
    ds: "ray.data.Dataset",
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    cols: list[str] | None = None,
):
    """Deterministic Bernoulli sample: keep a record iff
    ``md5(salt + str(id)) < threshold(fraction)``.  Same guarantees as
    :func:`hash_split`; pure filter, no shuffle.
    """
    thr = _hex_threshold(fraction)

    def _filter(t: pa.Table) -> pa.Table:
        keep = cols if cols is not None else t.column_names
        hexes = _md5_hex(t[id_col].combine_chunks(), salt)
        mask = pa.array(hexes < np.array(thr, dtype=object))
        return t.select(keep).filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)
