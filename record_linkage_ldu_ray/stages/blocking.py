"""S3 — blocking-key emission with hot-key salting (SURVEY §2.4 J1/J2).

The reference enumerates the full cartesian index (compare_ldu_hw.py:160-162,
17.8M pairs at 8.6k records) — O(n²) and impossible at 10^12 turns.  Its own
README recommends blocking ("check only those with matching countries",
README.md:245).  Here candidates come from the union of:

- ``bands`` LSH keys over the MinHash signature (one per band), and
- one phonetic/prefix key: soundex of the alphabetically-first normalized
  token — the **reference blocking key** at which the F1 gate is evaluated.

Hot blocks (power-law key frequencies) are salted with the triangle scheme:
a key with n > max_block_records splits into s = min(max_salt, ceil(n/cap))
buckets by hash(conv_id); each record replicates to the s sub-blocks
{(min(b,j), max(b,j)) : j < s}, so every record pair still co-occurs in
exactly the sub-block of their bucket pair — no recall loss, bounded block
size.  Hot-key counts are logged as stage counters.

Two passes over the (small) feature table: pass A counts keys (partial
counts inside map_batches, then a tiny groupby — SURVEY A-scale advice),
pass B re-emits salted block rows.  Block keys are uint64 hashes (cheap to
shuffle); features travel inside the block rows so pair scoring needs no
extra join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings, splitmix64
from record_linkage_ldu_ray.functions.minhash import EMPTY_SENTINEL, lsh_band_hashes
from record_linkage_ldu_ray.functions.text import soundex_array

_PREFIX_TAG = np.uint64(0x9E37_0001)


def _record_keys(
    batch: pa.Table, cfg: PipelineConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat_keys, row_indices, key_src): every blocking key of every
    record; ``key_src`` is the band index the key came from (prefix key =
    ``cfg.blocking.bands``) — the pair stage's lowest-colliding-band dedup
    relies on it."""
    n = len(batch)
    mh = batch["minhash"]
    if isinstance(mh, pa.ChunkedArray):
        mh = mh.combine_chunks()
    k = cfg.minhash.num_perm
    sigs = mh.flatten().to_numpy(zero_copy_only=False).reshape(n, k)
    band_keys = lsh_band_hashes(sigs, cfg.blocking)  # (n, bands)
    nonempty = sigs[:, 0] != EMPTY_SENTINEL  # empty convs emit no LSH keys

    keys = []
    rows = []
    srcs = []
    bands = cfg.blocking.bands
    row_idx = np.arange(n, dtype=np.int64)
    for j in range(bands):
        keys.append(band_keys[nonempty, j])
        rows.append(row_idx[nonempty])
        srcs.append(np.full(int(nonempty.sum()), j, dtype=np.int8))
    if cfg.blocking.use_prefix_key:
        import pyarrow.compute as pc

        first = batch["first_token"]
        if isinstance(first, pa.ChunkedArray):
            first = first.combine_chunks()
        first = pc.fill_null(first.cast(pa.string()), "")
        if cfg.blocking.prefix_key_kind == "soundex":
            # soundex is per-unique-token Python; feed it the dictionary
            # vocabulary only, then gather codes back by index.
            enc = first.dictionary_encode()
            vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            code_vocab = soundex_array(vocab) if len(vocab) else np.empty(0, object)
            pk_vocab = splitmix64(
                fnv1a_hash_strings(pa.array(code_vocab.astype(str))) ^ _PREFIX_TAG
            )
            pk = pk_vocab[idx]
            has_tok = np.array([bool(c) for c in code_vocab], dtype=bool)[idx]
        else:  # "prefix4": exact 4-char prefix (digit-preserving), Arrow kernel
            codes = pc.utf8_slice_codeunits(first, 0, 4)
            pk = splitmix64(fnv1a_hash_strings(codes) ^ _PREFIX_TAG)
            has_tok = pc.not_equal(pc.utf8_length(first), 0).to_numpy(
                zero_copy_only=False
            )
        keys.append(pk[has_tok])
        rows.append(row_idx[has_tok])
        srcs.append(np.full(int(has_tok.sum()), bands, dtype=np.int8))
    # int64 view: Ray Data sort/groupby handles int64 natively (uint64 above
    # 2^63 falls back to Python objects), wrap semantics preserved
    return (
        np.concatenate(keys).view(np.int64),
        np.concatenate(rows),
        np.concatenate(srcs),
    )


def _emit_key_counts(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Pass A: partial per-batch key counts (pre-aggregation before the tiny
    groupby — avoids shuffling one row per (record, key))."""
    flat_keys, _, _ = _record_keys(batch, cfg)
    uniq, cnt = np.unique(flat_keys, return_counts=True)
    return pa.table({"block_key": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())})


def hot_key_table(
    features_ds, cfg: PipelineConfig
) -> tuple[dict[int, int], dict[int, int]]:
    """Driver-side ``(hot, dropped)``: ``hot`` maps block_key → salt count
    (keys over max_block_records, salted to bound block size); ``dropped``
    maps block_key → record count for keys over ``drop_block_records`` —
    non-discriminative blocks whose O(n²) pair cost salting cannot fix
    (recall falls back to the LSH bands).  Both small by construction."""
    import pyarrow.compute as pc

    from record_linkage_ldu_ray.runtime import default_num_parts

    counts = features_ds.map_batches(
        _emit_key_counts,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"cfg": cfg},
    ).groupby("block_key", num_partitions=default_num_parts()).sum("n")
    cap = cfg.blocking.max_block_records
    hot_ds = counts.map_batches(
        lambda t: t.filter(pc.greater(t["sum(n)"], cap)), batch_format="pyarrow"
    )
    drop_cap = cfg.blocking.drop_block_records
    hot, dropped = {}, {}
    for row in hot_ds.take_all():  # tiny: only keys above the cap survive
        n = int(row["sum(n)"])
        k = int(row["block_key"])
        if drop_cap is not None and n > drop_cap:
            dropped[k] = n
        else:
            hot[k] = int(min(cfg.blocking.max_salt, -(-n // cap)))
    return hot, dropped


def _emit_block_rows(
    batch: pa.Table,
    cfg: PipelineConfig,
    hot: dict[int, int],
    dropped: dict[int, int] | None = None,
) -> pa.Table:
    """Pass B: replicate each record to all its (salted) block keys;
    oversized non-discriminative keys in ``dropped`` emit nothing."""
    flat_keys, rows, srcs = _record_keys(batch, cfg)

    if dropped:
        drop_keys = np.fromiter(dropped.keys(), dtype=np.int64, count=len(dropped))
        keep = ~np.isin(flat_keys, drop_keys)
        flat_keys, rows, srcs = flat_keys[keep], rows[keep], srcs[keep]

    if hot:
        conv_h = fnv1a_hash_strings(batch["conv_id"])
        hot_keys = np.fromiter(hot.keys(), dtype=np.int64, count=len(hot))
        is_hot = np.isin(flat_keys, hot_keys)
        hk = flat_keys[is_hot].view(np.uint64)
        hr = rows[is_hot]
        hs = srcs[is_hot]
        # vectorized triangle replication: record with bucket b goes to the
        # s sub-blocks {(min(b,j), max(b,j)) : j < s}
        s_arr = np.array([hot[int(k.view(np.int64))] for k in hk], dtype=np.int64)
        rep_keys = np.repeat(hk, s_arr)
        rep_rows = np.repeat(hr, s_arr)
        rep_srcs = np.repeat(hs, s_arr)  # salted sub-blocks keep the source
        total = int(s_arr.sum())
        j_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(s_arr) - s_arr, s_arr
        )
        b_rep = np.repeat(
            (conv_h[hr] % s_arr.astype(np.uint64)).astype(np.int64), s_arr
        )
        lo = np.minimum(b_rep, j_idx).astype(np.uint64)
        hi = np.maximum(b_rep, j_idx).astype(np.uint64)
        with np.errstate(over="ignore"):
            salted = splitmix64(rep_keys ^ (lo * np.uint64(0x10000) + hi + np.uint64(0xA17)))
        flat_keys = np.concatenate([flat_keys[~is_hot], salted.view(np.int64)])
        rows = np.concatenate([rows[~is_hot], rep_rows])
        srcs = np.concatenate([srcs[~is_hot], rep_srcs])
        # a same-bucket pair co-occurs in EVERY off-diagonal sub-block that
        # includes its bucket; the pair stage keeps it only in the diagonal
        # (lo == hi) sub-block, so each replica records its bucket + whether
        # its sub-block is diagonal
        n_cold = int((~is_hot).sum())
        bucket = np.concatenate(
            [np.full(n_cold, -1, np.int8), b_rep.astype(np.int8)]
        )
        diag = np.concatenate([np.zeros(n_cold, bool), lo == hi])
    else:
        bucket = np.full(len(rows), -1, np.int8)
        diag = np.zeros(len(rows), bool)

    taken = batch.take(pa.array(rows, pa.int64()))
    taken = taken.append_column("block_key", pa.array(flat_keys, pa.int64()))
    taken = taken.append_column("key_src", pa.array(srcs, pa.int8()))
    taken = taken.append_column("salt_bucket", pa.array(bucket, pa.int8()))
    return taken.append_column("salt_diag", pa.array(diag, pa.bool_()))


def emit_block_rows(
    features_ds,
    cfg: PipelineConfig,
    hot: dict[int, int],
    dropped: dict[int, int] | None = None,
):
    """Pass B as a map_batches stage; the hot/dropped key tables are
    broadcast ONCE via ``ray.put`` and fetched per task from the local
    object store — not pickled into every task's serialized closure (the
    engine's own broadcast-once rule; they are bounded but a degenerate
    corpus can make them non-trivial)."""
    import ray

    tables_ref = ray.put((hot, dropped))

    def _emit(batch: pa.Table) -> pa.Table:
        h, d = ray.get(tables_ref)
        return _emit_block_rows(batch, cfg, h, d)

    return features_ds.map_batches(
        _emit,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
