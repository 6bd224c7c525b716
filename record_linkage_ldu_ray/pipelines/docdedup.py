"""Document-level deduplication suite (training-data pipeline operators).

The reference's whole purpose is near-duplicate detection over fuzzy records
(compare_ldu_ldu.py self-dedup: full pairwise index → per-field similarity →
threshold rule).  These operators re-express that capability over a generic
``documents(doc_id, text, …)`` table at corpus scale, each as a streaming
Ray Data pipeline:

- exact_dedup            hash-partition + per-group min  (D7 analog)
- jaccard_dup_pairs      within-block pairwise token-set Jaccard
                         (compare_ldu_ldu.py:28-40 similarity + README.md:245
                         blocking advice)
- minhash_lsh_dup_pairs  shingle → MinHash → LSH bands → bucket groupby →
                         verify (the scale path; SURVEY §2.6 sketch note)
- simhash + near-dup     64-bit SimHash, banded Hamming candidates
- embedding_dup_pairs    cosine near-dup over an embedding column

All are deterministic (fixed seeds, canonical ``id_a < id_b`` pair order) so
N-CPU and 4N-CPU runs agree byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.config import BlockingConfig, MinHashConfig
from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings, splitmix64
from record_linkage_ldu_ray.functions.rounding import round6
from record_linkage_ldu_ray.functions.minhash import (
    lsh_band_hashes,
    minhash_segments,
    perm_params,
)

_NUM_PARTS = 64  # hash-partition fan-out for group stages


def _oversized_block_keep_mask(
    df: "pl.DataFrame", block_col: str, cap: int, op: str
) -> np.ndarray | None:
    """Row keep-mask dropping every block with more than ``cap`` records,
    or None when nothing exceeds the cap.  Logs the drop counters
    (blocks dropped, records dropped, sample keys).

    An exact-key block past the cap is non-discriminative: its O(n²) pair
    cost belongs to the MinHash/LSH path, not the exact enumerator.  The
    counters make the recall loss auditable (SURVEY §4 "cap + log dropped
    pairs as counters")."""
    sizes = df.select(pl.len().over(block_col).alias("n"))["n"].to_numpy()
    drop = sizes > cap
    if not drop.any():
        return None
    dropped_keys = df.filter(pl.Series(drop))[block_col].unique().to_list()
    import logging

    logging.getLogger(__name__).warning(
        "%s: dropped %d oversized block(s) (> %d records, %d records total): %s",
        op,
        len(dropped_keys),
        cap,
        int(drop.sum()),
        sorted(dropped_keys)[:10],
    )
    return ~drop


# ---------------------------------------------------------------------------
# exact dedup


def _add_hash_part(col: str, num_parts: int = _NUM_PARTS):
    def _f(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t[col].cast(pa.string()))
        part = (h % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    return _f


def exact_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Keep the lowest ``id`` per identical ``text`` (exact dedup).

    Physical plan: hash-partition on text hash (NOT the full text — the
    shuffle key stays 8 bytes), then one vectorized polars group_by per
    partition.  Equal texts share a hash so they co-locate; grouping inside
    the partition is on the full text, so hash collisions stay correct.
    """
    ds = ds.select_columns([id_col, text_col]).map_batches(
        _add_hash_part(text_col), batch_format="pyarrow", zero_copy_batch=True
    )

    def _dedup(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        out = df.group_by(text_col).agg(pl.col(id_col).min()).sort(id_col)
        return out.select([id_col, text_col]).to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(ds, ["part"], _NUM_PARTS, _dedup)


def dedup_keep_best(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Priority-rule dedup: group documents by NORMALIZED text (lower-cased,
    whitespace-collapsed) and keep the best variant per group — longest raw
    text, ties to the lowest id.  The "keep the richest record" policy of a
    curation pipeline (vs ``exact_dedup``'s keep-first), reference D2 rule
    shape with an explicit priority (main_ldu_ldu.py keeps first occurrence).

    Physical plan: per-batch partial winners first (one row per DISTINCT
    norm per batch — the exchange never carries raw text, only the norm key,
    winner id, winner length, count), then one hash exchange keyed by the
    norm's 8-byte hash, then a per-partition merge.  Winner selection is
    associative, so batch-level pre-aggregation is exact.

    Output: (``id_col``, n_dups:int64) — one row per group, the kept id.
    """

    def _norm(texts: pa.ChunkedArray) -> pl.Series:
        s = pl.from_arrow(texts.combine_chunks())
        return s.str.to_lowercase().str.strip_chars().str.replace_all(r"\s+", " ")

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                id_col: pl.from_arrow(t[id_col].combine_chunks()),
                "L": pl.from_arrow(t[text_col].combine_chunks()).str.len_chars().cast(pl.Int64),
                "norm": _norm(t[text_col]),
            }
        )
        agg = (
            df.sort(["norm", "L", id_col], descending=[False, True, False])
            .group_by("norm", maintain_order=True)
            .agg(
                pl.col(id_col).first(),
                pl.col("L").first(),
                cnt=pl.len().cast(pl.Int64),
            )
        )
        out = agg.to_arrow()
        h = fnv1a_hash_strings(out["norm"].combine_chunks())
        return out.append_column(
            "part", pa.array((h % np.uint64(_NUM_PARTS)).astype(np.int32), pa.int32())
        )

    partials = ds.select_columns([id_col, text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([(id_col, pa.int64()), ("n_dups", pa.int64())]).empty_table()
        agg = (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["norm", "L", id_col], descending=[False, True, False])
            .group_by("norm", maintain_order=True)
            .agg(pl.col(id_col).first(), n_dups=pl.col("cnt").sum())
            .select([id_col, "n_dups"])
            .sort(id_col)
        )
        return agg.to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(partials, ["part"], _NUM_PARTS, _merge)


# ---------------------------------------------------------------------------
# shared: tokenization + canonical pair enumeration helpers


def _ws_token_lists(texts: pa.ChunkedArray | pa.Array) -> pl.Series:
    """Whitespace tokenization → list<string> (vectorized), SEQUENCE
    semantics: splitting "" yields the single-element list [""], exactly
    like DuckDB's ``string_split``.  Only positional consumers (shingle
    windows, token counts, packing) that replay the same artifact in
    their SQL oracles may call this directly — every token-SET builder
    (Jaccard, blocking keys, vocab) MUST go through ``_prep_tokens``,
    which drops the empty-string artifact to match the oracles'
    ``list_filter(..., x -> x <> '')``."""
    s = pl.from_arrow(texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts)
    return s.str.strip_chars().str.replace_all(r"\s+", " ").str.split(" ")


def _prep_tokens(
    texts: pa.ChunkedArray | pa.Array, *, unique: bool = True
) -> pl.Series:
    """Canonical token-set preparation for EVERY set-semantics tokenizing
    pipeline: whitespace split, drop the empty-string artifact of
    splitting "" (so an all-whitespace document has an EMPTY token set,
    matching the SQL oracles' non-empty-token filter), then sorted-unique.

    New operators that compare token sets must call this — not
    ``_ws_token_lists`` — so the engine-vs-oracle empty-token divergence
    cannot be reintroduced."""
    toks = _ws_token_lists(texts).list.eval(pl.element().filter(pl.element() != ""))
    if unique:
        toks = toks.list.unique().list.sort()
    return toks


def _triangle_pairs_sorted(group_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group index pairs (i < j) of a SORTED group-id array —
    fully vectorized (no Python loop per group): element at local position
    t emits t pairs, one with each earlier element of its group."""
    n = len(group_ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new_grp = np.ones(n, bool)
    new_grp[1:] = group_ids[1:] != group_ids[:-1]
    starts = np.where(new_grp, np.arange(n, dtype=np.int64), 0)
    np.maximum.accumulate(starts, out=starts)  # start index of own group
    pos = np.arange(n, dtype=np.int64) - starts
    total = int(pos.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    j_idx = np.repeat(np.arange(n, dtype=np.int64), pos)
    run_first = np.repeat(np.cumsum(pos) - pos, pos)
    i_idx = np.arange(total, dtype=np.int64) - run_first + np.repeat(starts, pos)
    return i_idx, j_idx


def _pairs_within_groups(df: pl.DataFrame, group_col: str, id_col: str) -> np.ndarray:
    """(m, 2) row-index pairs (i, j), i<j by ``id_col`` order, within each
    group of ``group_col``."""
    df = df.with_row_index("_row")
    s = df.sort([group_col, id_col])
    gid = s[group_col].to_numpy()
    rows = s["_row"].to_numpy().astype(np.int64)
    # codes for arbitrary dtype group ids
    if gid.dtype == object:
        _, codes = np.unique(gid, return_inverse=True)
    else:
        codes = gid
    ii, jj = _triangle_pairs_sorted(codes)
    return np.stack([rows[ii], rows[jj]], axis=1) if len(ii) else np.empty((0, 2), np.int64)


# ---------------------------------------------------------------------------
# within-block pairwise token-set Jaccard (SQL-expressible oracle shape)


def _pair_jaccard_f64(
    flat_sorted: np.ndarray, offsets: np.ndarray, ii: np.ndarray, jj: np.ndarray
) -> np.ndarray:
    """float64 Jaccard for row-index pairs (ii, jj) over per-row
    SORTED-unique uint64 hash segments — one lexsort over (pair, value),
    no per-pair Python (float64 kept end-to-end for oracle hash parity;
    both-sides-empty → 0.0, matching the SQL oracle's len()>0 guard)."""
    from record_linkage_ldu_ray.functions.sim import gather_list_segments

    m = len(ii)
    va, oa = gather_list_segments(flat_sorted, offsets, ii)
    vb, ob = gather_list_segments(flat_sorted, offsets, jj)
    la = oa[1:] - oa[:-1]
    lb = ob[1:] - ob[:-1]
    pid = np.concatenate(
        [np.repeat(np.arange(m, dtype=np.int64), la), np.repeat(np.arange(m, dtype=np.int64), lb)]
    )
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, pid))
    sv, sp = vals[order], pid[order]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    inter = np.zeros(m, dtype=np.int64)
    np.add.at(inter, sp[1:][dup], 1)
    denom = la + lb - inter
    out = np.zeros(m, dtype=np.float64)
    live = denom > 0
    out[live] = inter[live] / denom[live]
    return out


def jaccard_dup_pairs(
    ds: "ray.data.Dataset",
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.5,
    side_col: str | None = None,
    max_block_records: int | None = None,
    num_parts: int | None = None,
):
    """All pairs within a block whose unique-token-set Jaccard ≥ tau.

    The per-pair kernel is the reference's token-set similarity two-tier
    idea (compare_ldu_ldu.py:28-40) with semantic blocking standing in for
    "check only those with matching countries" (README.md:245) — fully
    vectorized (one lexsort-merge per partition, no per-pair Python loop).

    ``side_col``: BIPARTITE mode (the reference's cross-table LDU↔HW index,
    compare_ldu_hw.py:160-162) — only pairs whose side values differ are
    scored, and the lower side's record is emitted as ``*_a``.

    ``max_block_records``: blocks larger than this are SKIPPED (logged) —
    an exact-key block is non-discriminative at that size and its O(n²)
    pair cost belongs to the MinHash/LSH path instead.  None (default)
    disables the cap, keeping exact SQL-oracle parity.

    ``num_parts``: hash-partition fan-out for the block exchange; None
    derives it from the cluster (``runtime.default_num_parts``).

    Output: (id_a, id_b, jaccard) with id_a < id_b (or side_a < side_b in
    bipartite mode), jaccard float64 rounded to 6dp.
    """
    cols = [id_col, block_col, text_col] + ([side_col] if side_col else [])
    ds = ds.select_columns(cols)

    def _score(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        toks = _prep_tokens(t[text_col])
        df = df.with_columns(toks.alias("_toks"))
        if max_block_records is not None and len(df):
            keep_rows = _oversized_block_keep_mask(
                df, block_col, max_block_records, "jaccard_dup_pairs"
            )
            if keep_rows is not None:
                df = df.filter(pl.Series(keep_rows))
        pairs = _pairs_within_groups(df, block_col, id_col)
        empty = pa.table(
            {
                f"{id_col}_a": pa.array([], pa.int64()),
                f"{id_col}_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(pairs) == 0:
            return empty
        ii, jj = pairs[:, 0], pairs[:, 1]
        ids = df[id_col].to_numpy()
        if side_col is not None:
            sides = df[side_col].to_numpy()
            cross = sides[ii] != sides[jj]
            ii, jj = ii[cross], jj[cross]
            if len(ii) == 0:
                return empty
            flip = sides[ii] > sides[jj]  # orient: lower side first
            ii, jj = np.where(flip, jj, ii), np.where(flip, ii, jj)
        tok_arr = df["_toks"].to_arrow()
        if pa.types.is_large_list(tok_arr.type):
            tok_arr = tok_arr.cast(pa.list_(pa.string()))
        offsets = tok_arr.offsets.to_numpy().astype(np.int64)
        flat = fnv1a_hash_strings(tok_arr.flatten())
        # sort hashes within each row (token strings were sorted; their
        # hashes are not) so the merge kernel sees sorted-unique segments
        lens = offsets[1:] - offsets[:-1]
        parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        flat = flat[np.lexsort((flat, parents))]
        ja = _pair_jaccard_f64(flat, offsets, ii, jj)
        keep = ja >= tau
        ia, ib = ids[ii[keep]], ids[jj[keep]]
        if side_col is None:
            ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
        return pa.table(
            {
                f"{id_col}_a": pa.array(ia, pa.int64()),
                f"{id_col}_b": pa.array(ib, pa.int64()),
                "jaccard": pa.array(round6(ja[keep]), pa.float64()),
            }
        )

    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()
    withpart = ds.map_batches(
        _add_hash_part(block_col, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(withpart, ["part"], n_parts, _score)


def ngram_jaccard_dup_pairs(
    ds: "ray.data.Dataset",
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    tau: float = 0.3,
    num_parts: int | None = None,
    max_block_records: int | None = None,
):
    """All pairs within a block whose word ``n``-gram shingle-set Jaccard
    ≥ tau — the EXACT similarity the MinHash+LSH path approximates
    (``minhash_lsh_dup_pairs`` uses the same ``_shingle_hashes`` sets), so
    the two operators are directly comparable on the same corpus.

    Same distribution shape as ``jaccard_dup_pairs`` (hash-partition by
    block, vectorized triangle enumeration, one lexsort-merge per
    partition); docs with fewer than ``n`` tokens have no shingles and
    never pair (denominator-0 guard matches the SQL oracle).

    ``max_block_records``: blocks larger than this are DROPPED with logged
    counters (blocks + records) — their quadratic pair cost belongs to the
    LSH path.  None (default) disables the cap for exact SQL-oracle parity;
    compositions meant for scale (``fuzzy_dedup_documents``) pass a finite
    cap.

    Output: (id_a, id_b, jaccard:float64 rounded 6dp), id_a < id_b.
    """
    ds = ds.select_columns([id_col, block_col, text_col])

    def _score(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([id_col, block_col]))
        empty = pa.table(
            {
                f"{id_col}_a": pa.array([], pa.int64()),
                f"{id_col}_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if max_block_records is not None and len(df):
            keep_rows = _oversized_block_keep_mask(
                df, block_col, max_block_records, "ngram_jaccard_dup_pairs"
            )
            if keep_rows is not None:
                # the shingle offsets below are positional in t — filter the
                # Arrow table and the frame together to keep them aligned
                t = t.filter(pa.array(keep_rows))
                df = df.filter(pl.Series(keep_rows))
        pairs = _pairs_within_groups(df, block_col, id_col)
        if len(pairs) == 0:
            return empty
        ii, jj = pairs[:, 0], pairs[:, 1]
        flat, offsets = _shingle_hashes(t[text_col], n)  # sorted-unique per doc
        ja = _pair_jaccard_f64(flat, offsets, ii, jj)
        keep = ja >= tau
        ids = df[id_col].to_numpy()
        ia, ib = ids[ii[keep]], ids[jj[keep]]
        ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
        return pa.table(
            {
                f"{id_col}_a": pa.array(ia, pa.int64()),
                f"{id_col}_b": pa.array(ib, pa.int64()),
                "jaccard": pa.array(round6(ja[keep]), pa.float64()),
            }
        )

    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()
    withpart = ds.map_batches(
        _add_hash_part(block_col, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(withpart, ["part"], n_parts, _score)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the 100 TB scale path)


def _shingle_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-unique uint64 hashes of word ``n``-gram shingles.

    Returns (flat_hashes, offsets).  Rolling combine over token hashes —
    vectorized across the whole batch, no per-row Python.
    """
    # sequence semantics, NOT a token set: the SQL oracle replays the same
    # unfiltered string_split positions (see _ws_token_lists docstring)
    toks = _ws_token_lists(texts)
    arr = toks.to_arrow()
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(pa.string()))
    arr = arr.fill_null([])
    offs = arr.offsets.to_numpy().astype(np.int64)
    th = fnv1a_hash_strings(arr.flatten()) if len(arr.flatten()) else np.empty(0, np.uint64)
    ndocs = len(arr)
    lengths = offs[1:] - offs[:-1]
    # rolling n-gram combine: h_i = mix(th[i], th[i+1], ..., th[i+n-1])
    with np.errstate(over="ignore"):
        comb = th.copy()
        for k in range(1, n):
            shifted = np.roll(th, -k)
            comb = splitmix64(comb * np.uint64(0x100000001B3) ^ shifted)
    # valid shingle start positions: within-doc, at least n tokens remain
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lengths)
    pos_in_doc = np.arange(len(th), dtype=np.int64) - np.repeat(offs[:-1], lengths)
    valid = pos_in_doc <= np.repeat(lengths, lengths) - n
    sh = comb[valid]
    sh_doc = doc_of[valid]
    # sorted-unique per doc
    order = np.lexsort((sh, sh_doc))
    sh, sh_doc = sh[order], sh_doc[order]
    keep = np.ones(len(sh), bool)
    if len(sh) > 1:
        keep[1:] = ~((sh[1:] == sh[:-1]) & (sh_doc[1:] == sh_doc[:-1]))
    sh, sh_doc = sh[keep], sh_doc[keep]
    counts = np.bincount(sh_doc, minlength=ndocs)
    new_offs = np.zeros(ndocs + 1, np.int64)
    np.cumsum(counts, out=new_offs[1:])
    return sh, new_offs


class ShingleMinHasher:
    """Actor-pool stage: doc batch → MinHash signature of word-shingle set.

    Permutation params built once per actor (T1/T2 pattern, SURVEY §2.3).
    """

    def __init__(self, n: int = 3, minhash: MinHashConfig = MinHashConfig()):
        self.n = n
        self.cfg = minhash
        self.params = perm_params(minhash)

    def __call__(self, t: pa.Table) -> pa.Table:
        sh, offs = _shingle_hashes(t["text"], self.n)
        sig = minhash_segments(sh, offs, self.params)
        k = self.cfg.num_perm
        mh = pa.FixedSizeListArray.from_arrays(pa.array(sig.reshape(-1), pa.uint64()), k)
        n_sh = pa.array((offs[1:] - offs[:-1]).astype(np.int64), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "minhash": mh, "n_shingles": n_sh})


def minhash_lsh_dup_pairs(
    ds: "ray.data.Dataset",
    tau: float = 0.7,
    shingle_n: int = 3,
    minhash: MinHashConfig = MinHashConfig(),
    blocking: BlockingConfig | None = None,
):
    """Near-dup pairs via shingle → MinHash → LSH-band buckets → verify.

    Candidate pairs come ONLY from shared band buckets (never all-pairs);
    the estimate is the signature agreement fraction, deduped across bands
    by canonical pair key.  Output: (doc_id_a, doc_id_b, est_jaccard ≥ tau).
    """
    blocking = blocking or BlockingConfig(bands=16, rows_per_band=4)
    assert blocking.bands * blocking.rows_per_band == minhash.num_perm

    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        ShingleMinHasher,
        fn_constructor_kwargs={"n": shingle_n, "minhash": minhash},
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=4096,
    )

    def _emit_bands(t: pa.Table) -> pa.Table:
        """Band rows carry a SLIM payload instead of the full 512-byte
        signature ×bands (the dominant exchange amplification): the 16
        uint64 band keys (exact lowest-colliding-band ownership) plus a
        1-byte-per-perm signature fingerprint for the Jaccard estimate —
        fingerprint-collision bias ≤ 1/256 per perm, an order of magnitude
        below the 64-perm estimator's own sampling noise."""
        sig = np.asarray(t["minhash"].combine_chunks().flatten()).reshape(
            len(t), minhash.num_perm
        )
        keys = lsh_band_hashes(sig, blocking)  # (n, bands)
        sig8 = (sig & np.uint64(0xFF)).astype(np.uint8)
        n, b = keys.shape
        n_sh = t["n_shingles"].to_numpy()
        nonempty = np.repeat(n_sh > 0, b)  # empty docs never block with anything
        flat_keys = keys.reshape(-1)[nonempty]
        band_idx = np.tile(np.arange(b, dtype=np.int8), n)[nonempty]
        return pa.table(
            {
                "band_key": pa.array(flat_keys, pa.uint64()),
                "band_idx": pa.array(band_idx, pa.int8()),
                "part": pa.array(
                    (flat_keys % np.uint64(_NUM_PARTS)).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), b)[nonempty], pa.int64()),
                "band_keys": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(keys, b, axis=0)[nonempty].reshape(-1), pa.uint64()),
                    b,
                ),
                "sig8": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.repeat(sig8, b, axis=0)[nonempty].reshape(-1), pa.uint8()
                    ),
                    minhash.num_perm,
                ),
            }
        )

    banded = sigs.map_batches(_emit_bands, batch_format="pyarrow", zero_copy_batch=True)

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        """One hash-partition of band buckets: vectorized triangle
        enumeration grouped by band_key; each pair kept only in its FIRST
        colliding band (shuffle-free dedup across bands, same rule as the
        flagship pair stage)."""
        empty = pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
        if len(t) < 2:
            return empty
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        ii, jj = _triangle_pairs_sorted(bk[order])
        if len(ii) == 0:
            return empty
        ii, jj = order[ii], order[jj]
        # first-colliding-band canonicality from the shipped band keys
        all_keys = np.asarray(t["band_keys"].combine_chunks().flatten()).reshape(
            len(t), blocking.bands
        )
        eq = all_keys[ii] == all_keys[jj]
        first = eq.argmax(axis=1)  # a collision exists (this bucket)
        keep = first == t["band_idx"].to_numpy(zero_copy_only=False)[ii].astype(np.int64)
        sig8 = np.asarray(t["sig8"].combine_chunks().flatten()).reshape(
            len(t), minhash.num_perm
        )
        est = (sig8[ii] == sig8[jj]).mean(axis=1)
        ia, ib = ids[ii], ids[jj]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        keep &= (est >= tau) & (lo != hi)
        o = np.lexsort((hi[keep], lo[keep]))
        return pa.table(
            {
                "doc_id_a": pa.array(lo[keep][o], pa.int64()),
                "doc_id_b": pa.array(hi[keep][o], pa.int64()),
                "est_jaccard": pa.array(est[keep][o], pa.float64()),
            }
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(banded, ["part"], _NUM_PARTS, _bucket_pairs)


# ---------------------------------------------------------------------------
# SimHash


def simhash_signatures(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """64-bit SimHash per document over whitespace tokens (term-frequency
    weighted).  Output: (doc_id, simhash: uint64)."""

    def _simhash(t: pa.Table) -> pa.Table:
        # sequence semantics, NOT a token set: the recursive-CTE SQL oracle
        # replays the same unfiltered split (see _ws_token_lists docstring)
        toks = _ws_token_lists(t[text_col])
        arr = toks.to_arrow()
        if pa.types.is_large_list(arr.type):
            arr = arr.cast(pa.list_(pa.string()))
        arr = arr.fill_null([])
        offs = arr.offsets.to_numpy().astype(np.int64)
        flat = arr.flatten()
        h = fnv1a_hash_strings(flat) if len(flat) else np.empty(0, np.uint64)
        n = len(arr)
        lengths = offs[1:] - offs[:-1]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        # bits: (T, 64) ±1 contributions, segment-summed per doc, sign → bit
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int32
        )
        contrib = bits * 2 - 1
        sums = np.zeros((n, 64), np.int64)
        np.add.at(sums, doc_of, contrib)
        sig = (
            ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :])
            .sum(axis=1, dtype=np.uint64)
        )
        sig[lengths == 0] = np.uint64(0)
        return pa.table(
            {id_col: t[id_col], "simhash": pa.array(sig, pa.uint64())}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _simhash, batch_format="pyarrow", zero_copy_batch=True
    )


def simhash_dup_pairs(ds: "ray.data.Dataset", max_hamming: int = 3):
    """Near-dup pairs by SimHash: candidates share one of four 16-bit bands
    (any pair within Hamming ≤ 3 of a 64-bit key shares ≥1 exact band by
    pigeonhole), verified by exact popcount distance."""
    sigs = simhash_signatures(ds)

    def _emit(t: pa.Table) -> pa.Table:
        sig = t["simhash"].to_numpy()
        ids = t["doc_id"].to_numpy()
        n = len(sig)
        bands = np.empty((n, 4), np.uint64)
        for j in range(4):
            bands[:, j] = ((sig >> np.uint64(16 * j)) & np.uint64(0xFFFF)) | (
                np.uint64(j) << np.uint64(48)
            )
        flat = bands.reshape(-1)
        return pa.table(
            {
                "band_key": pa.array(flat, pa.uint64()),
                "band_idx": pa.array(np.tile(np.arange(4, dtype=np.int8), n), pa.int8()),
                "part": pa.array(
                    (flat % np.uint64(_NUM_PARTS)).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "simhash": pa.array(np.repeat(sig, 4), pa.uint64()),
            }
        )

    banded = sigs.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)

    def _verify(t: pa.Table) -> pa.Table:
        """One hash-partition of 16-bit-band buckets: vectorized triangle
        enumeration + exact popcount verify; each pair kept only in its
        first matching band (shuffle-free cross-band dedup)."""
        empty = pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
            }
        )
        if len(t) < 2:
            return empty
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = t["simhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        ii, jj = _triangle_pairs_sorted(bk[order])
        if len(ii) == 0:
            return empty
        ii, jj = order[ii], order[jj]
        x = sig[ii] ^ sig[jj]
        ham = np.zeros(len(x), np.int32)
        for k in range(64):  # vectorized popcount
            ham += ((x >> np.uint64(k)) & np.uint64(1)).astype(np.int32)
        # first matching 16-bit band decides the canonical copy
        first = np.full(len(x), 4, np.int64)
        for j in range(3, -1, -1):
            band_eq = ((x >> np.uint64(16 * j)) & np.uint64(0xFFFF)) == 0
            first = np.where(band_eq, j, first)
        keep = first == t["band_idx"].to_numpy(zero_copy_only=False)[ii].astype(np.int64)
        ia, ib = ids[ii], ids[jj]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        keep &= (ham <= max_hamming) & (lo != hi)
        o = np.lexsort((hi[keep], lo[keep]))
        return pa.table(
            {
                "doc_id_a": pa.array(lo[keep][o], pa.int64()),
                "doc_id_b": pa.array(hi[keep][o], pa.int64()),
                "hamming": pa.array(ham[keep][o], pa.int32()),
            }
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(banded, ["part"], _NUM_PARTS, _verify)


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    tau: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_parts: int | None = None,
):
    """Pairs with cosine similarity ≥ tau, blocked by ``block_col`` (the
    IVF-style bucket: at scale the block is a coarse-quantizer cell).
    Output: (vec_id_a, vec_id_b, cos_sim rounded 6dp), vec_id_a < vec_id_b.
    """

    def _score(t: pa.Table) -> pa.Table:
        """One hash-partition of blocks: per-block dense cosine (the block
        is small by IVF construction), vectorized within-block pairs."""
        ids_all = t[id_col].to_numpy()
        vec = t[vec_col]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        mat_all = np.asarray(vec.values).reshape(len(t), -1).astype(np.float64)
        labels = t[block_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_all, labels))
        out_a, out_b, out_c = [], [], []
        bounds = np.nonzero(
            np.concatenate(([True], labels[order][1:] != labels[order][:-1], [True]))
        )[0]
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            sel = order[s0:s1]
            if len(sel) < 2:
                continue
            ids = ids_all[sel]
            mat = mat_all[sel]
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            cos = unit @ unit.T
            iu, ju = np.triu_indices(len(ids), k=1)
            c = cos[iu, ju]
            keep = c >= tau
            ia, ib = ids[iu[keep]], ids[ju[keep]]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            out_a.append(lo)
            out_b.append(hi)
            out_c.append(round6(c[keep]))
        if not out_a:
            return pa.table(
                {
                    f"{id_col}_a": pa.array([], pa.int64()),
                    f"{id_col}_b": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                f"{id_col}_a": pa.array(np.concatenate(out_a), pa.int64()),
                f"{id_col}_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cos_sim": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()
    withpart = ds.select_columns([id_col, block_col, vec_col]).map_batches(
        _add_hash_part(block_col, n_parts), batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(withpart, ["part"], n_parts, _score)


# ---------------------------------------------------------------------------
# end-to-end fuzzy dedup: pairs → connected components → representative


def dedup_by_pairs(ds: "ray.data.Dataset", pairs: "ray.data.Dataset", id_col: str = "doc_id"):
    """Resolve a duplicate-pair edge list into per-document keep/drop
    decisions — the composition a 100 TB fuzzy-dedup run actually ships:
    near-dup pairs (from any of the pair operators here) → distributed
    connected components → one representative per component (the minimum
    id, the reference's D3 transitive-grouping rule, main_ldu_ldu.py
    group_matches analog).

    Reuses the engine's hash-partitioned star-contraction CC
    (``stages/cluster.connected_components``) — ids are zero-padded to a
    fixed width so the CC's lexicographic min-label IS the numeric min.

    Output: (``id_col``:int64, rep_id:int64, keep:bool), one row per input
    document; ``keep`` marks the representative (singletons keep
    themselves).
    """
    import pyarrow.compute as pc

    from record_linkage_ldu_ray.config import PipelineConfig
    from record_linkage_ldu_ray.stages.cluster import connected_components

    W = 20  # max uint64 digits — lexicographic order == numeric order

    def _pad(arr) -> pa.Array:
        return pc.utf8_lpad(arr.cast(pa.string()), W, padding="0")

    edges = pairs.map_batches(
        lambda t: pa.table(
            {"conv_id_a": _pad(t[f"{id_col}_a"]), "conv_id_b": _pad(t[f"{id_col}_b"])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    universe = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"conv_id": _pad(t[id_col])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    clusters, _rounds = connected_components(edges, universe, PipelineConfig())

    def _unpad(t: pa.Table) -> pa.Table:
        doc = t["conv_id"].cast(pa.int64())
        rep = t["cluster_id"].cast(pa.int64())
        return pa.table(
            {
                id_col: doc,
                "rep_id": rep,
                "keep": pc.equal(doc, rep),
            }
        )

    return clusters.map_batches(_unpad, batch_format="pyarrow", zero_copy_batch=True)


def fuzzy_dedup_documents(
    ds: "ray.data.Dataset",
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    tau: float = 0.05,
    max_block_records: int = 10_000,
    num_parts: int | None = None,
):
    """Flagship document-dedup composition over the exact n-gram Jaccard
    pair operator (SQL-oracle-checkable end to end; swap the pair stage for
    ``minhash_lsh_dup_pairs`` to get the approximate 100 TB path with the
    identical resolve step).

    Unlike the bare pair operator, this end-to-end composition defaults to
    a FINITE ``max_block_records`` (10k records → ≤ 5·10⁷ pairs per block):
    a blocking key shared by more records than that is non-discriminative
    and its quadratic cost belongs to :func:`fuzzy_dedup_documents_lsh`.
    Dropped blocks are logged with counters; the SQL oracle stays exact at
    fixture scale because no fixture block approaches the cap."""
    pairs = ngram_jaccard_dup_pairs(
        ds,
        block_col=block_col,
        id_col=id_col,
        text_col=text_col,
        n=n,
        tau=tau,
        num_parts=num_parts,
        max_block_records=max_block_records,
    )
    return dedup_by_pairs(ds, pairs, id_col=id_col)


def cross_source_overlap(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
):
    """Train/test contamination check: documents whose EXACT text also
    appears under a different ``group_col`` value (e.g. a benchmark split
    leaking into the training corpus) — the standard pre-training overlap
    audit.

    Physical plan: same 8-byte text-hash exchange as :func:`exact_dedup`
    (the shuffle key is the hash, text rides once per doc), then one
    vectorized per-partition group pass emitting members of groups spanning
    ≥ 2 distinct sources.  Output: (doc_id, ``group_col``, n_sources:int64)
    — one row per contaminated document.
    """
    ds = ds.select_columns([id_col, text_col, group_col]).map_batches(
        _add_hash_part(text_col), batch_format="pyarrow", zero_copy_batch=True
    )

    def _overlap(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [(id_col, pa.int64()), (group_col, pa.string()), ("n_sources", pa.int64())]
            ).empty_table()
        df = pl.from_arrow(t.drop_columns(["part"]))
        out = (
            df.with_columns(
                pl.col(group_col).n_unique().over(text_col).cast(pl.Int64).alias("n_sources")
            )
            .filter(pl.col("n_sources") >= 2)
            .select([id_col, group_col, "n_sources"])
            .sort(id_col)
        )
        return out.to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(ds, ["part"], _NUM_PARTS, _overlap)


def fuzzy_dedup_documents_lsh(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    tau: float = 0.5,
):
    """The 100 TB fuzzy-dedup flagship: MinHash-LSH near-dup pairs (band
    buckets only — never all-pairs, no blocking column needed) resolved by
    the same distributed connected-components → min-id-representative step
    as :func:`fuzzy_dedup_documents`.  Approximate where the exact variant
    is exact (LSH candidate recall), identical resolve semantics —
    rows-only driver check, invariants pinned by pytest
    (``TestFuzzyDedupLsh``: representative closure, exact-variant parity on
    a seeded near-dup corpus).

    Output: (``id_col``:int64, rep_id:int64, keep:bool), one row per doc.
    """
    pairs = minhash_lsh_dup_pairs(ds, tau=tau)
    return dedup_by_pairs(ds, pairs, id_col=id_col)


def semantic_dedup(
    ds: "ray.data.Dataset",
    tau: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_parts: int | None = None,
):
    """SemDeDup-style semantic dedup over an embedding column (Abbas et
    al. 2023, arXiv:2303.09540): cosine-similar pairs within embedding
    blocks → distributed connected components → one representative
    (min id) per semantic cluster.

    ``block_col`` is the SemDeDup cluster: a pre-existing label here
    (SQL-oracle-checkable end to end), or an ENGINE-trained k-means cell
    via :func:`ann.kmeans_centroids` + :func:`ann.assign_cells` — the
    100 TB path, where each cell is small by construction and the dense
    within-cell cosine stays bounded (see ``semantic_dedup_ivf`` in
    ``__ray_entry__``).

    Output: (``id_col``:int64, rep_id:int64, keep:bool), one row per
    input vector; ``keep`` marks the representative.
    """
    pairs = embedding_dup_pairs(
        ds,
        tau=tau,
        block_col=block_col,
        id_col=id_col,
        vec_col=vec_col,
        num_parts=num_parts,
    )
    return dedup_by_pairs(ds, pairs, id_col=id_col)


def dedup_increment(
    ds: "ray.data.Dataset",
    side_col: str = "is_new",
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.5,
    num_parts: int | None = None,
):
    """Incremental corpus dedup — the continuously-growing-corpus pattern
    (the document analog of ``pipelines/linkage.link_increment``): given an
    existing corpus (``side_col`` = 0) and a new batch (``side_col`` = 1)
    in ONE dataset, decide per new document whether it duplicates the
    corpus, and against which document.

    Candidate pairs come from :func:`jaccard_dup_pairs` in bipartite mode
    (corpus record always ``*_a``); per new document the match count and
    the best match (max Jaccard, ties to the smallest corpus id) are a
    two-level aggregation over the pair list, with the new-doc universe
    riding the same keyed exchange as zero-count rows.

    Output: (``id_col``:int64 — new docs only, n_corpus_matches:int64,
    best_match_id:int64|null, best_jaccard:float64|null, keep:bool).
    """
    from record_linkage_ldu_ray.functions.hashing import splitmix64
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()
    pairs = jaccard_dup_pairs(
        ds,
        block_col=block_col,
        id_col=id_col,
        text_col=text_col,
        tau=tau,
        side_col=side_col,
        num_parts=num_parts,
    )

    def _pair_partial(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .rename({f"{id_col}_a": "cid", f"{id_col}_b": "nid", "jaccard": "j"})
            .sort(["nid", "j", "cid"], descending=[False, True, False])
        )
        out = (
            df.group_by("nid", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("cid").first().alias("best_id"),
                pl.col("j").first().alias("best_j"),
            )
        )
        part = (
            splitmix64(out["nid"].to_numpy().astype(np.uint64)) % np.uint64(n_parts)
        ).astype(np.int32)
        return out.with_columns(pl.Series("part", part, pl.Int32)).to_arrow()

    def _universe(t: pa.Table) -> pa.Table:
        keep = pl.from_arrow(t).filter(pl.col(side_col) == 1)
        v = keep[id_col].to_numpy().astype(np.int64)
        part = (splitmix64(v.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int32)
        return (
            pl.DataFrame({"nid": v})
            .with_columns(
                pl.lit(0, pl.Int64).alias("n"),
                pl.lit(None, pl.Int64).alias("best_id"),
                pl.lit(None, pl.Float64).alias("best_j"),
                pl.Series("part", part, pl.Int32),
            )
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["nid", "best_j", "best_id"], descending=[False, True, False], nulls_last=True)
        )
        out = (
            df.group_by("nid", maintain_order=True)
            .agg(
                pl.col("n").sum(),
                pl.col("best_id").first(),
                pl.col("best_j").first(),
            )
            .with_columns((pl.col("n") == 0).alias("keep"))
        )
        return pa.table(
            {
                id_col: out["nid"].to_arrow().cast(pa.int64()),
                "n_corpus_matches": out["n"].to_arrow(),
                "best_match_id": out["best_id"].to_arrow().cast(pa.int64()),
                "best_jaccard": out["best_j"].to_arrow().cast(pa.float64()),
                "keep": out["keep"].to_arrow(),
            }
        )

    edges = pairs.map_batches(_pair_partial, batch_format="pyarrow", zero_copy_batch=True)
    uni = ds.select_columns([id_col, side_col]).map_batches(
        _universe, batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(edges.union(uni), ["part"], n_parts, _merge)


def embedding_neighbor_stats(
    ds: "ray.data.Dataset",
    tau: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_parts: int | None = None,
):
    """Per-vector neighborhood density within embedding blocks — the
    outlier-pruning complement of :func:`semantic_dedup` (SemDeDup prunes
    dense redundancy; density stats flag ISOLATED vectors, the
    CLIP-filtering-style noise signal): for each vector, how many
    same-block neighbors sit at cosine ≥ tau and the best neighbor
    similarity.

    Pairs come from :func:`embedding_dup_pairs` (blocked dense cosine);
    per-vector counts are a two-level aggregation over the pair edge list
    (each batch combines to ≤ 2·pairs partial rows, one exchange keyed by
    vec id), and the universe rides the SAME exchange as zero-count rows
    so isolated vectors appear with n_neighbors = 0 — no driver-side join.

    Output: (``id_col``:int64, n_neighbors:int64, max_sim:float64 |
    null for isolated vectors, is_isolated:bool), one row per vector.
    """
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()
    pairs = embedding_dup_pairs(
        ds,
        tau=tau,
        block_col=block_col,
        id_col=id_col,
        vec_col=vec_col,
        num_parts=num_parts,
    )

    def _edge_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [t[f"{id_col}_a"].to_numpy(), t[f"{id_col}_b"].to_numpy()]
        ).astype(np.int64)
        cs = np.concatenate([t["cos_sim"].to_numpy()] * 2)
        from record_linkage_ldu_ray.functions.hashing import splitmix64

        df = (
            pl.DataFrame({"v": v, "cs": cs})
            .group_by("v")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("cs").max().alias("mx"),
            )
        )
        part = (
            splitmix64(df["v"].to_numpy().astype(np.uint64)) % np.uint64(n_parts)
        ).astype(np.int32)
        return df.with_columns(pl.Series("part", part, pl.Int32)).to_arrow()

    def _universe(t: pa.Table) -> pa.Table:
        from record_linkage_ldu_ray.functions.hashing import splitmix64

        v = t[id_col].to_numpy().astype(np.int64)
        part = (splitmix64(v.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int32)
        df = pl.DataFrame({"v": v}).with_columns(
            pl.lit(0, pl.Int64).alias("n"),
            pl.lit(None, pl.Float64).alias("mx"),
            pl.Series("part", part, pl.Int32),
        )
        return df.to_arrow()

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        out = (
            df.group_by("v")
            .agg(pl.col("n").sum(), pl.col("mx").max())
            .with_columns((pl.col("n") == 0).alias("is_isolated"))
        )
        return pa.table(
            {
                id_col: out["v"].to_arrow().cast(pa.int64()),
                "n_neighbors": out["n"].to_arrow(),
                "max_sim": out["mx"].to_arrow().cast(pa.float64()),
                "is_isolated": out["is_isolated"].to_arrow(),
            }
        )

    edges = pairs.map_batches(
        _edge_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    uni = ds.select_columns([id_col]).map_batches(
        _universe, batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(edges.union(uni), ["part"], n_parts, _merge)


# ---------------------------------------------------------------------------
# duplicated-span masking: Lee et al. 2021 (arXiv:2107.06499) substring
# dedup, approximated at the token-n-gram level


def _token_grams(texts: pa.Array | pa.ChunkedArray, L: int):
    """Whitespace tokens of a whole batch as ONE flat stream plus the
    rolling L-token-gram hashes — no per-document Python loop.

    Returns (flat_tokens:pl.Series, dlen, offs, gpos, gdoc, gh) where
    ``gpos``/``gdoc`` are the flat start position and row index of every
    in-document gram and ``gh`` its 64-bit rolling polynomial hash (FNV
    prime base over per-token FNV-1a hashes; uint64 wraparound).
    """
    from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pl.from_arrow(texts).fill_null("")
    lists = s.str.split(" ")
    dlen = lists.list.len().to_numpy().astype(np.int64)
    flat = lists.explode()
    th = fnv1a_hash_strings(flat.to_arrow())
    total = len(th)
    m_flat = max(total - L + 1, 0)
    h = np.zeros(m_flat, np.uint64)
    B = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for i in range(L):
            h = h * B + th[i : i + m_flat]
    offs = np.concatenate(([0], np.cumsum(dlen)))
    m_doc = np.maximum(dlen - L + 1, 0)
    tot_g = int(m_doc.sum())
    starts = np.cumsum(m_doc) - m_doc
    gpos = np.repeat(offs[:-1], m_doc) + (
        np.arange(tot_g, dtype=np.int64) - np.repeat(starts, m_doc)
    )
    gdoc = np.repeat(np.arange(len(dlen), dtype=np.int64), m_doc)
    gh = h[gpos] if tot_g else np.empty(0, np.uint64)
    return flat, dlen, offs, gpos, gdoc, gh


def mask_duplicate_spans(
    ds: "ray.data.Dataset",
    L: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int | None = None,
    keep_first: bool = False,
):
    """Exact duplicated-span masking (Lee et al. 2021, arXiv:2107.06499,
    "Deduplicating Training Data Makes Language Models Better" — the
    suffix-array ExactSubstr step approximated at token-L-gram level, the
    form production corpora like RETRO/Dolma use): any L-token window
    whose gram occurs in ≥ ``min_df`` DISTINCT documents is a duplicated
    span; every token covered by such a window is masked out.

    Two passes, raw text shuffles NEVER:
    1. DF pass — each batch emits one partial row per distinct gram hash
       it contains (8-byte hash + count of distinct docs in the batch; a
       document lives in exactly one batch, so partial doc-counts sum to
       the exact DF).  One hash exchange keyed by gram, merge sums, filter
       ``df >= min_df``.
    2. The surviving duplicate-gram hashes broadcast once via ``ray.put``
       (sorted uint64 array; the dup set is the HEAVY tail only — orders
       of magnitude smaller than the gram stream; at 100 TB shard the
       broadcast by gram-hash range and run one pass per shard if it
       outgrows worker heap), then one map pass recomputes grams per
       batch, marks covered tokens with a vectorized difference array and
       rebuilds the cleaned text from kept tokens.

    ``keep_first=True`` switches to Lee et al.'s remove-all-but-one
    semantics: the canonical occurrence of each duplicated gram — the
    global minimum (doc_id, in-doc position), tracked as a partial min
    through the same DF exchange — stays unmasked; only the other
    occurrences are removed.

    Output: (``id_col``, n_tokens:int64, n_dup_tokens:int64,
    dup_token_frac:float64 rounded 6dp, text_clean:string), one row per
    document.  SQL-oracle-exact at fixture scale (64-bit gram hashes;
    collisions are ~n²/2⁶⁴ and would only ever mask extra tokens).
    """
    from record_linkage_ldu_ray.functions.rounding import round6
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()

    _EMPTY_PARTIAL = pa.table(
        {
            "gh": pa.array([], pa.uint64()),
            "n_docs": pa.array([], pa.int64()),
            "own_doc": pa.array([], pa.int64()),
            "own_pos": pa.array([], pa.int64()),
            "part": pa.array([], pa.int32()),
        }
    )

    def _df_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EMPTY_PARTIAL
        _, _, offs, gpos, gdoc, gh = _token_grams(t[text_col], L)
        if not len(gh):
            return _EMPTY_PARTIAL
        did = t[id_col].to_numpy()[gdoc]
        ipos = gpos - offs[gdoc]
        order = np.lexsort((ipos, did, gh))
        sg, sd, sp = gh[order], did[order], ipos[order]
        newg = np.concatenate(([True], sg[1:] != sg[:-1]))
        pairfirst = np.concatenate(([True], (sg[1:] != sg[:-1]) | (sd[1:] != sd[:-1])))
        uu, cnt = np.unique(sg[pairfirst], return_counts=True)
        # first row per gh group (sorted by (doc, pos)) == partial owner;
        # np.unique returns sorted gh, matching sg[newg] exactly
        return pa.table(
            {
                "gh": pa.array(uu, pa.uint64()),
                "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
                "own_doc": pa.array(sd[newg], pa.int64()),
                "own_pos": pa.array(sp[newg], pa.int64()),
                "part": pa.array((uu % np.uint64(n_parts)).astype(np.int32), pa.int32()),
            }
        )

    def _df_merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        out = (
            df.sort(["gh", "own_doc", "own_pos"])
            .group_by("gh", maintain_order=True)
            .agg(
                pl.col("n_docs").sum(),
                pl.col("own_doc").first(),
                pl.col("own_pos").first(),
            )
        )
        return (
            out.filter(pl.col("n_docs") >= min_df)
            .select(["gh", "own_doc", "own_pos"])
            .to_arrow()
        )

    dup_ds = partitioned_map(
        ds.select_columns([id_col, text_col]).map_batches(
            _df_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["part"],
        n_parts,
        _df_merge,
    )
    tables = [x for r in dup_ds.to_arrow_refs() if len(x := ray.get(r))]
    if tables:
        cat = pa.concat_tables(tables)
        gh_all = cat["gh"].to_numpy()
        srt = np.argsort(gh_all)
        dup = gh_all[srt]
        own_doc = cat["own_doc"].to_numpy()[srt]
        own_pos = cat["own_pos"].to_numpy()[srt]
    else:
        dup = np.empty(0, np.uint64)
        own_doc = own_pos = np.empty(0, np.int64)
    dup_ref = ray.put((dup, own_doc, own_pos))

    def _mask(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_dup_tokens": pa.array([], pa.int64()),
                    "dup_token_frac": pa.array([], pa.float64()),
                    "text_clean": pa.array([], pa.string()),
                }
            )
        dup_sorted, own_d, own_p = ray.get(dup_ref)
        flat, dlen, offs, gpos, gdoc, gh = _token_grams(t[text_col], L)
        total = int(dlen.sum())
        if len(gh) and len(dup_sorted):
            idx = np.searchsorted(dup_sorted, gh)
            found = (idx < len(dup_sorted)) & (
                dup_sorted[np.minimum(idx, len(dup_sorted) - 1)] == gh
            )
            if keep_first:
                gi = idx[found]
                did = t[id_col].to_numpy()[gdoc[found]]
                ipos = gpos[found] - offs[gdoc[found]]
                is_owner = (own_d[gi] == did) & (own_p[gi] == ipos)
                hit = gpos[found][~is_owner]
            else:
                hit = gpos[found]
        else:
            hit = np.empty(0, np.int64)
        cover = np.zeros(total + L + 1, np.int64)
        np.add.at(cover, hit, 1)
        np.add.at(cover, hit + L, -1)
        covered = np.cumsum(cover)[:total] > 0
        n_dup = (
            np.add.reduceat(covered.astype(np.int64), np.minimum(offs[:-1], total - 1))
            if total
            else np.zeros(n, np.int64)
        )
        n_dup = np.where(dlen == 0, 0, n_dup)
        keep_idx = np.nonzero(~covered)[0]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), dlen)
        kept = pl.DataFrame({"d": doc_of[keep_idx], "tok": flat.gather(keep_idx)})
        joined = kept.group_by("d", maintain_order=True).agg(
            pl.col("tok").str.join(" ").alias("text_clean")
        )
        clean = np.full(n, "", dtype=object)
        clean[joined["d"].to_numpy()] = joined["text_clean"].to_numpy()
        frac = round6(np.where(dlen > 0, n_dup / np.maximum(dlen, 1), 0.0))
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(dlen, pa.int64()),
                "n_dup_tokens": pa.array(n_dup, pa.int64()),
                "dup_token_frac": pa.array(frac, pa.float64()),
                "text_clean": pa.array(clean.tolist(), pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _mask, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# benchmark decontamination: flag corpus docs sharing an n-gram with a
# held-out benchmark/eval set


def decontaminate_ngrams(
    sf_dir: str,
    n: int = 8,
    bench_mod: int = 25,
    use_bloom: bool = False,
    bloom_bits: int = 1 << 22,
):
    """Per corpus doc: how many of its distinct word ``n``-grams appear in
    the benchmark set (docs with ``doc_id % bench_mod == 0`` stand in for
    an eval suite), plus a ``contaminated`` flag.

    The scale shape of training-data decontamination: the benchmark side
    is SMALL (eval suites are MBs even when the corpus is 100 TB), so its
    distinct n-gram hashes are collected once (per-batch unique → driver
    union) and broadcast via ``ray.put``; the corpus then streams through
    one ``map_batches`` doing a vectorized ``searchsorted`` membership
    probe per batch — no shuffle at all.  N-gram hashing is the same
    rolling-combine kernel as ``minhash_lsh_dup_pairs``
    (``_shingle_hashes``), so Ray-side hash membership equals SQL string
    membership up to 64-bit collisions (~1e-9 at any realistic eval size).

    ``use_bloom=True`` swaps the exact sorted-hash set for a Bloom filter
    (``functions/bloom.py``) — the memory-bounded path when the blocklist
    outgrows a comfortable broadcast (``bloom_bits/8`` bytes ship instead
    of 8 bytes per distinct n-gram).  Bloom flags are a SUPERSET of the
    exact flags (no false negatives; FPR = (1-e^{-kn/m})^k), so it is the
    safe direction for decontamination: nothing contaminated slips
    through, a bounded sliver of clean docs is over-flagged.

    Output: (doc_id, n_hits:int64, contaminated:bool) for every non-bench
    doc — docs shorter than ``n`` tokens have no n-grams and 0 hits.
    """
    import ray

    from record_linkage_ldu_ray.functions.bloom import bloom_build, bloom_probe

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    mod = np.int64(bench_mod)

    def _bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(ids % mod == 0))
        if len(sub) == 0:
            return pa.table({"g": pa.array([], pa.uint64())})
        flat, _ = _shingle_hashes(sub["text"], n)
        return pa.table({"g": pa.array(np.unique(flat), pa.uint64())})

    parts = [
        p["g"].to_numpy()
        for p in ray.get(
            ds.map_batches(
                _bench_grams, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if len(p) and "g" in p.schema.names
    ]
    bench = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    bench_ref = ray.put(bloom_build(bench, m_bits=bloom_bits) if use_bloom else bench)

    def _probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(ids % mod != 0))
        ids = sub["doc_id"].to_numpy()
        if len(sub) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                    "contaminated": pa.array([], pa.bool_()),
                }
            )
        bg = ray.get(bench_ref)
        flat, offs = _shingle_hashes(sub["text"], n)  # sorted-unique per doc
        if use_bloom:
            hit = bloom_probe(bg, flat)
        elif len(bg) and len(flat):
            pos = np.searchsorted(bg, flat)
            pos[pos == len(bg)] = 0
            hit = bg[pos] == flat
        else:
            hit = np.zeros(len(flat), bool)
        # per-doc segment sums via cumsum — branch-free and exact even for
        # empty segments (docs with < n tokens)
        counts = np.zeros(len(sub), np.int64)
        if len(flat):
            cs = np.concatenate(([0], np.cumsum(hit, dtype=np.int64)))
            counts = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(counts, pa.int64()),
                "contaminated": pa.array(counts > 0, pa.bool_()),
            }
        )

    return ds.map_batches(_probe, batch_format="pyarrow", zero_copy_batch=True)


def remove_boilerplate_turns(sf_dir: str, max_df: int = 2, num_parts: int = 32):
    """Cross-conversation boilerplate removal (the C4/RefinedWeb repeated-
    line filter, at turn granularity): drop every turn whose text occurs in
    MORE than ``max_df`` distinct conversations.

    Two passes, both bounded: (1) per-batch partials reduce to DISTINCT
    (turn-text hash, conv-id hash) pairs — distinct-pair emission makes
    the document frequency exact even if Ray re-slices a conversation's
    turns across batches (each partition owns a text hash exclusively
    after the exchange, so its distinct-conv count is exact) — and only
    the HEAVY hashes (df > max_df: the boilerplate set is the small tail
    of the distribution) come back to the driver; (2) the corpus streams
    through a broadcast searchsorted membership filter — the same
    probe shape as decontamination.  Raw text never shuffles.

    Reference parity: the LDU scripts drop intra-record duplicate values
    before comparison (``functions.py`` dedup helpers); this is the
    corpus-level analog.

    Output: the kept turns (conv_id, turn_idx:int32, text).
    """
    import ray

    from record_linkage_ldu_ray.pipelines.relational import transcripts_from_documents
    from record_linkage_ldu_ray.runtime import partitioned_map

    turns = transcripts_from_documents(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["text"].combine_chunks())
        c = fnv1a_hash_strings(t["conv_id"].combine_chunks())
        out = pl.DataFrame({"h": h, "c": c}).unique(["h", "c"]).to_arrow()
        return out.append_column(
            "part",
            pa.array(
                (out["h"].to_numpy() % np.uint64(num_parts)).astype(np.int32),
                pa.int32(),
            ),
        )

    def _heavy(t: pa.Table) -> pa.Table:
        agg = (
            pl.from_arrow(t.drop_columns(["part"]))
            .unique(["h", "c"])
            .group_by("h")
            .agg(pl.len().cast(pl.Int64).alias("n_convs"))
            .filter(pl.col("n_convs") > max_df)
        )
        return pa.table({"h": agg["h"].to_arrow().cast(pa.uint64())})

    partials = turns.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    heavy_parts = [
        p
        for p in ray.get(
            partitioned_map(partials, ["part"], num_parts, _heavy).to_arrow_refs()
        )
        if len(p)
    ]
    heavy = (
        np.sort(np.concatenate([p["h"].to_numpy() for p in heavy_parts]))
        if heavy_parts
        else np.empty(0, np.uint64)
    )
    heavy_ref = ray.put(heavy)

    def _filter(t: pa.Table) -> pa.Table:
        hs = ray.get(heavy_ref)
        h = fnv1a_hash_strings(t["text"].combine_chunks())
        if len(hs):
            pos = np.searchsorted(hs, h)
            pos[pos == len(hs)] = 0
            drop = hs[pos] == h
        else:
            drop = np.zeros(len(t), bool)
        return t.select(["conv_id", "turn_idx", "text"]).filter(pa.array(~drop))

    return turns.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def top_similar_pairs(sf_dir: str, k: int = 50, n: int = 2, tau: float = 0.05):
    """Global top-``k`` most similar document pairs by EXACT word n-gram
    Jaccard (the triage view a curation run starts from: what are the
    worst near-duplicates in the corpus?).

    Composition: the blocked exact-similarity operator
    (``ngram_jaccard_dup_pairs``) already emits per-partition pair scores;
    a per-block partial top-k plus a bounded driver merge (≤ blocks × k
    rows) gives the global answer WITHOUT a global sort — the same O4
    pattern as ``top_orders``.  Deterministic order: jaccard DESC, then
    (id_a, id_b) ASC on ties of the rounded score.

    Output: (doc_id_a, doc_id_b, jaccard:float64 rounded 6dp), k rows.
    """
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_dup_pairs(ds, n=n, tau=tau)

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        ja = t["jaccard"].to_numpy()
        a = t["doc_id_a"].to_numpy()
        b = t["doc_id_b"].to_numpy()
        order = np.lexsort((b, a, -ja))[: min(k, len(ja))]
        return t.take(pa.array(order))

    parts = [
        p
        for p in ray.get(
            pairs.map_batches(
                _partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if len(p)
    ]
    if not parts:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    m = pa.concat_tables(parts, promote_options="permissive")
    ja = m["jaccard"].to_numpy()
    a = m["doc_id_a"].to_numpy()
    b = m["doc_id_b"].to_numpy()
    order = np.lexsort((b, a, -ja))[:k]
    return m.take(pa.array(order))


def curate_documents(
    sf_dir: str,
    min_tokens: int = 30,
    bench_mod: int = 25,
    n: int = 8,
):
    """End-to-end corpus curation: exact dedup → length filter →
    benchmark decontamination → deterministic train/val/test split — the
    composed pipeline a pre-training data run actually executes, built
    from the engine's individual operators so every stage keeps its scale
    shape (dedup = 8-byte-hash exchange; decontamination = broadcast
    probe; filters/split = pure maps).

    Benchmark docs (``doc_id % bench_mod == 0``) are excluded from the
    corpus outright; survivors get MD5-interval splits (80/10/10).

    Output: (doc_id, n_tokens:int64, split:string) — the kept corpus.
    """
    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # stage 1: exact dedup (keep lowest doc_id per identical text)
    kept = exact_dedup(ds)

    # stage 2+3 flags come from one decontamination pass (it already
    # excludes bench docs); collect the small contaminated id set once
    dec = decontaminate_ngrams(sf_dir, n=n, bench_mod=bench_mod)
    bad_parts = [
        p
        for p in ray.get(
            dec.map_batches(
                lambda t: t.filter(t["contaminated"]).select(["doc_id"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).to_arrow_refs()
        )
        if len(p) and "doc_id" in p.schema.names
    ]
    contaminated = (
        np.sort(np.concatenate([p["doc_id"].to_numpy() for p in bad_parts]))
        if bad_parts
        else np.empty(0, np.int64)
    )
    bad_ref = ray.put(contaminated)
    mod = np.int64(bench_mod)

    def _filter(t: pa.Table) -> pa.Table:
        # sequence COUNT semantics, NOT a token set: the SQL oracle counts
        # len(string_split(...)) unfiltered (see _ws_token_lists docstring)
        toks = _ws_token_lists(t["text"]).list.len().to_numpy().astype(np.int64)
        ids = t["doc_id"].to_numpy()
        bad = ray.get(bad_ref)
        is_bad = np.zeros(len(ids), bool)
        if len(bad):
            pos = np.searchsorted(bad, ids)
            pos[pos == len(bad)] = 0
            is_bad = bad[pos] == ids
        keep = (toks >= min_tokens) & (ids % mod != 0) & ~is_bad
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(toks[keep], pa.int64()),
            }
        )

    survivors = kept.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)

    # stage 4: the hash_split assignment applied inline so n_tokens rides
    # along (same MD5 intervals as pipelines.sampling.hash_split)
    def _with_split(t: pa.Table) -> pa.Table:
        from record_linkage_ldu_ray.pipelines.sampling import _hex_threshold, _md5_hex

        hexes = _md5_hex(t["doc_id"].combine_chunks(), "split-v1")
        uppers = np.array(
            [_hex_threshold(0.8), _hex_threshold(0.9), "g" * 32], dtype=object
        )
        labels = np.array(["train", "val", "test"], dtype=object)
        idx = np.searchsorted(uppers, hexes, side="right")
        return t.append_column("split", pa.array(labels[idx], pa.string()))

    return survivors.map_batches(_with_split, batch_format="pyarrow", zero_copy_batch=True)


def write_curated_shards(sf_dir: str, outdir: str, **curate_kwargs):
    """Materialize the curated corpus as split-partitioned Parquet
    (``outdir/split=train/…`` etc.) — the resumable-output contract: one
    directory per partition value, written as a streaming Ray sink (each
    block flushes independently; a re-run can skip or overwrite finished
    partitions rather than rewriting one giant file).

    Returns the per-split row counts (tiny table) for the run manifest.
    """
    ds = curate_documents(sf_dir, **curate_kwargs)
    ds.write_parquet(outdir, partition_cols=["split"])

    import pyarrow.dataset as pads

    d = pads.dataset(outdir, partitioning="hive")
    t = d.to_table(columns=["split"])
    return (
        pl.from_arrow(t)
        .group_by("split")
        .agg(pl.len().cast(pl.Int64).alias("n_docs"))
        .sort("split")
        .to_arrow()
    )


# ---------------------------------------------------------------------------
# sparse all-pairs TF-IDF cosine similarity (posting-list join)


def tfidf_cosine_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.9,
    max_df: int | None = None,
    max_vocab: int = 1_000_000,
    num_parts: int | None = None,
):
    """All document pairs whose TF-IDF cosine similarity ≥ ``tau`` via
    posting-list expansion — the inverted-index all-pairs similarity join
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW'07): a pair is generated once per SHARED token and its dot product
    accumulates distributively, so the corpus is never cross-joined.

    This is the sparse-vector sibling of :func:`embedding_dup_pairs` and the
    cosine analog of the reference's token-set similarity
    (compare_ldu_ldu.py:28-40), using the same smooth-IDF weighting as
    :func:`~record_linkage_ldu_ray.pipelines.textstats.tfidf_top_terms`
    (``tf * (ln((1+N)/(1+df)) + 1)``, L2-normalized per document).

    Plan (two exchanges, both on narrow rows):
      1. DF pass: per-batch partial document frequencies → one token-keyed
         hash exchange → bounded driver merge; the (token → idf) table is
         ``ray.put`` ONCE and read by every scoring task.
      2. Posting pass: one ``map_batches`` re-tokenizes, L2-normalizes
         per document (a document's text lives in one row, so its norm is
         batch-local), and emits narrow ``(token, id, weight)`` postings
         partitioned by token hash.
      3. Pair partials: within each token partition, a vectorized triangle
         enumeration per token group (``_pairs_within_groups`` — no Python
         pair loop) emits ``(id_a, id_b, Σ_local w_a·w_b)`` pre-aggregated
         rows, partitioned by pair hash.
      4. Finalize: per-pair sum → cosine, filter ≥ tau, round to 6dp.

    Scale knobs: ``max_df`` drops tokens appearing in more than that many
    documents BEFORE weighting (a df-heavy token contributes O(df²) pair
    partials but near-zero IDF weight — dropping it is both the WW'07
    prefix-filter idea and standard stopword pruning).  Default None keeps
    exact SQL-oracle parity.  ``max_vocab`` bounds the broadcast DF table.

    Output: (``{id}_a``, ``{id}_b``, cosine:double 6dp) with id_a < id_b.
    """
    import pyarrow.compute as pc

    from record_linkage_ldu_ray.pipelines.textstats import vocab_top_tokens
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = num_parts if num_parts is not None else default_num_parts()
    n_total = ds.count()
    df_tbl = vocab_top_tokens(ds, id_col=id_col, text_col=text_col, k=max_vocab)
    if max_df is not None:
        df_tbl = df_tbl.filter(pc.less_equal(df_tbl["n_docs"], pa.scalar(max_df)))
    idf = (
        np.log((1.0 + n_total) / (1.0 + df_tbl["n_docs"].to_numpy().astype(np.float64)))
        + 1.0
    )
    idf_ref = ray.put(
        pl.DataFrame(
            {
                "token": pl.from_arrow(df_tbl["token"].combine_chunks()),
                "idf": pl.Series(idf, dtype=pl.Float64),
            }
        )
    )

    posting_schema = pa.schema(
        [(id_col, pa.int64()), ("token", pa.string()), ("wn", pa.float64()), ("part", pa.int32())]
    )

    def _postings(t: pa.Table) -> pa.Table:
        idfmap: pl.DataFrame = ray.get(idf_ref)
        toks = (
            pl.DataFrame(
                {
                    id_col: pl.from_arrow(t[id_col].combine_chunks()),
                    "token": pl.from_arrow(t[text_col].combine_chunks()).str.extract_all(
                        r"\S+"
                    ),
                }
            )
            .explode("token")
            .drop_nulls("token")
        )
        tf = toks.group_by([id_col, "token"]).agg(tf=pl.len().cast(pl.Float64))
        j = tf.join(idfmap, on="token", how="inner")
        if len(j) == 0:
            return posting_schema.empty_table()
        j = j.with_columns((pl.col("tf") * pl.col("idf")).alias("w"))
        j = j.with_columns(
            (pl.col("w") / pl.col("w").pow(2).sum().sqrt().over(id_col)).alias("wn")
        )
        out = pa.table(
            {
                id_col: j[id_col].cast(pl.Int64).to_arrow(),
                "token": j["token"].to_arrow().cast(pa.string()),
                "wn": j["wn"].to_arrow().cast(pa.float64()),
            }
        )
        h = fnv1a_hash_strings(out["token"].combine_chunks())
        return out.append_column(
            "part", pa.array((h % np.uint64(P)).astype(np.int32), pa.int32())
        )

    postings = ds.select_columns([id_col, text_col]).map_batches(
        _postings, batch_format="pyarrow", zero_copy_batch=True
    )

    partial_schema = pa.schema(
        [
            (f"{id_col}_a", pa.int64()),
            (f"{id_col}_b", pa.int64()),
            ("dot", pa.float64()),
            ("part", pa.int32()),
        ]
    )

    def _pair_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return partial_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"]))
        pairs = _pairs_within_groups(df, "token", id_col)
        if len(pairs) == 0:
            return partial_schema.empty_table()
        ii, jj = pairs[:, 0], pairs[:, 1]
        ids = df[id_col].to_numpy()
        wn = df["wn"].to_numpy()
        # within a token group ids are unique and the triangle is oriented
        # by id order, so id_a < id_b holds without a re-orient pass
        pp = (
            pl.DataFrame(
                {
                    f"{id_col}_a": ids[ii],
                    f"{id_col}_b": ids[jj],
                    "dot": wn[ii] * wn[jj],
                }
            )
            .group_by([f"{id_col}_a", f"{id_col}_b"])
            .agg(pl.col("dot").sum())
        )
        a = pp[f"{id_col}_a"].to_numpy().astype(np.uint64)
        b = pp[f"{id_col}_b"].to_numpy().astype(np.uint64)
        part2 = (splitmix64(splitmix64(a) ^ b) % np.uint64(P)).astype(np.int32)
        out = pp.to_arrow().cast(partial_schema.remove(3))
        return out.append_column("part", pa.array(part2, pa.int32()))

    partials = partitioned_map(postings, ["part"], P, _pair_partials)

    out_schema = pa.schema(
        [(f"{id_col}_a", pa.int64()), (f"{id_col}_b", pa.int64()), ("cosine", pa.float64())]
    )

    def _finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by([f"{id_col}_a", f"{id_col}_b"])
            .agg(pl.col("dot").sum())
        )
        cos = df["dot"].to_numpy()
        keep = cos >= tau
        return pa.table(
            {
                f"{id_col}_a": df[f"{id_col}_a"].to_numpy()[keep],
                f"{id_col}_b": df[f"{id_col}_b"].to_numpy()[keep],
                "cosine": round6(cos[keep]),
            },
            schema=out_schema,
        )

    return partitioned_map(partials, ["part"], P, _finalize)


# ---------------------------------------------------------------------------
# blocking-quality audit (reduction ratio / pairs completeness)


def blocking_quality(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    key_len: int = 4,
    tau: float = 0.5,
    pair_chunk: int = 512,
):
    """Audit a blocking scheme against exact ground truth: the two standard
    record-linkage blocking metrics (Christen, "Data Matching", Springer
    2012, §7.5 — public textbook material):

      reduction_ratio    = 1 − |candidate pairs| / |all pairs|
      pairs_completeness = |true pairs with equal block key| / |true pairs|

    Blocking key: first ``key_len`` characters of the lower-cased,
    whitespace-stripped text (the engine's prefix-blocking motif,
    README.md:245 "check only those with matching countries" analog).
    Ground truth: unique-token-set Jaccard ≥ ``tau`` over ALL pairs — the
    exact quadratic comparison the reference runs outright
    (compare_ldu_ldu.py full pairwise index).

    Ground truth is inherently O(n²): this is an AUDIT operator, meant to
    run over a bounded sample (compose with ``hash_sample`` — deterministic
    and self-consistent across runs) whose metrics estimate the full-corpus
    ratios.  The pair loop is chunked (``pair_chunk`` anchor rows per
    vectorized kernel call) so memory stays flat; candidate counting is
    closed-form Σ C(m_key, 2) — candidates are COUNTED from key-group
    sizes, never enumerated.

    Output: ONE row — (n_docs, n_candidate_pairs, n_true_pairs,
    n_covered_true_pairs, reduction_ratio, pairs_completeness), ratios
    rounded to 6dp; completeness defined as 1.0 when there are no true
    pairs, reduction_ratio 1.0 when n < 2.
    """
    out_schema = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("n_candidate_pairs", pa.int64()),
            ("n_true_pairs", pa.int64()),
            ("n_covered_true_pairs", pa.int64()),
            ("reduction_ratio", pa.float64()),
            ("pairs_completeness", pa.float64()),
        ]
    )

    def _prep(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        bkey = (
            s.str.to_lowercase()
            .str.replace_all(r"\s+", "")
            .str.slice(0, key_len)
        )
        toks = _prep_tokens(t[text_col])
        tok_arr = toks.to_arrow()
        if pa.types.is_large_list(tok_arr.type):
            tok_arr = tok_arr.cast(pa.list_(pa.string()))
        offsets = tok_arr.offsets.to_numpy().astype(np.int64)
        flat = fnv1a_hash_strings(tok_arr.flatten())
        lens = offsets[1:] - offsets[:-1]
        parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        flat = flat[np.lexsort((flat, parents))]
        hashes = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat, pa.uint64())
        )
        return pa.table(
            {
                id_col: t[id_col],
                "bkey": bkey.to_arrow().cast(pa.string()),
                "hashes": hashes,
                "part": pa.array(np.zeros(len(t), np.int32), pa.int32()),
            }
        )

    prepped = ds.select_columns([id_col, text_col]).map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True
    )

    def _audit(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return out_schema.empty_table()
        bkeys = np.asarray(t["bkey"].to_pylist(), dtype=object)
        # candidate count: closed-form over key-group sizes
        _, counts = np.unique(bkeys, return_counts=True)
        m = counts.astype(np.int64)
        n_cand = int((m * (m - 1) // 2).sum())
        # ground truth: chunked exact Jaccard over the full triangle
        harr = t["hashes"].combine_chunks()
        offsets = harr.offsets.to_numpy().astype(np.int64)
        flat = harr.values.to_numpy().astype(np.uint64)
        n_true = 0
        n_cov = 0
        for i0 in range(0, n - 1, pair_chunk):
            i1 = min(i0 + pair_chunk, n - 1)
            anchors = np.arange(i0, i1, dtype=np.int64)
            reps = (n - 1) - anchors  # partners per anchor: i+1 .. n-1
            ii = np.repeat(anchors, reps)
            jj = np.concatenate(
                [np.arange(a + 1, n, dtype=np.int64) for a in anchors]
            ) if len(anchors) else np.empty(0, np.int64)
            ja = _pair_jaccard_f64(flat, offsets, ii, jj)
            hit = ja >= tau
            n_true += int(hit.sum())
            n_cov += int((bkeys[ii[hit]] == bkeys[jj[hit]]).sum())
        total_pairs = n * (n - 1) // 2
        rr = 1.0 - n_cand / total_pairs if total_pairs else 1.0
        pc_ = n_cov / n_true if n_true else 1.0
        return pa.table(
            {
                "n_docs": pa.array([n], pa.int64()),
                "n_candidate_pairs": pa.array([n_cand], pa.int64()),
                "n_true_pairs": pa.array([n_true], pa.int64()),
                "n_covered_true_pairs": pa.array([n_cov], pa.int64()),
                "reduction_ratio": pa.array(round6(np.array([rr])), pa.float64()),
                "pairs_completeness": pa.array(round6(np.array([pc_])), pa.float64()),
            },
            schema=out_schema,
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(prepped, ["part"], 1, _audit)


# ---------------------------------------------------------------------------
# cluster cohesion audit


def cluster_cohesion_report(
    ds: "ray.data.Dataset",
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    tau: float = 0.05,
    num_parts: int | None = None,
):
    """Intra-cluster cohesion audit of the fuzzy-dedup clustering: for
    every non-singleton cluster, the member count and the min / avg exact
    token-set Jaccard over ALL intra-cluster pairs.

    The ER analog of the reference's group-length stats sheets
    (analyze.py group stats, README.md:258 review workflow): after
    transitive clustering, min_jaccard ≪ avg_jaccard flags groups glued
    together by one weak edge — exactly the clusters a reviewer should
    open first.

    Scale shape: clusters come from :func:`fuzzy_dedup_documents`
    (pairs → distributed CC); the doc texts ride a ``hash_join`` on the
    id; ONE exchange keyed by ``rep_id`` co-locates each cluster; the
    per-partition kernel enumerates each cluster's triangle vectorized
    and scores it with the shared float64 Jaccard merge kernel.
    O(cluster²) per cluster — dedup clusters are near-clique by
    construction, so sizes track true duplicate multiplicity, not corpus
    size.

    Output: (rep_id, n_members, n_pairs, min_jaccard, avg_jaccard) for
    clusters with >= 2 members, ratios 6dp.
    """
    from record_linkage_ldu_ray.pipelines.relational import hash_join
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts
    clusters = fuzzy_dedup_documents(
        ds, block_col=block_col, id_col=id_col, text_col=text_col,
        n=n, tau=tau, num_parts=num_parts,
    ).select_columns([id_col, "rep_id"])
    docs = ds.select_columns([id_col, text_col])
    joined = hash_join(clusters, docs, on=id_col)

    out_schema = pa.schema(
        [
            ("rep_id", pa.int64()),
            ("n_members", pa.int64()),
            ("n_pairs", pa.int64()),
            ("min_jaccard", pa.float64()),
            ("avg_jaccard", pa.float64()),
        ]
    )

    def _audit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t.select([id_col, "rep_id", text_col]))
        toks = _prep_tokens(t[text_col])
        df = df.with_columns(toks.alias("_toks"))
        pairs = _pairs_within_groups(df, "rep_id", id_col)
        if len(pairs) == 0:
            return out_schema.empty_table()
        ii, jj = pairs[:, 0], pairs[:, 1]
        tok_arr = df["_toks"].to_arrow()
        if pa.types.is_large_list(tok_arr.type):
            tok_arr = tok_arr.cast(pa.list_(pa.string()))
        offsets = tok_arr.offsets.to_numpy().astype(np.int64)
        flat = fnv1a_hash_strings(tok_arr.flatten())
        lens = offsets[1:] - offsets[:-1]
        parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        flat = flat[np.lexsort((flat, parents))]
        ja = _pair_jaccard_f64(flat, offsets, ii, jj)
        reps = df["rep_id"].to_numpy()
        pair_df = pl.DataFrame(
            {"rep_id": reps[ii], "j": ja}
        ).group_by("rep_id").agg(
            n_pairs=pl.len().cast(pl.Int64),
            min_j=pl.col("j").min(),
            avg_j=pl.col("j").mean(),
        )
        memb = df.group_by("rep_id").len(name="n_members")
        g = pair_df.join(memb, on="rep_id").sort("rep_id")
        return pa.table(
            {
                "rep_id": pa.array(g["rep_id"].to_numpy().astype(np.int64), pa.int64()),
                "n_members": pa.array(g["n_members"].to_numpy().astype(np.int64), pa.int64()),
                "n_pairs": pa.array(g["n_pairs"].to_numpy().astype(np.int64), pa.int64()),
                "min_jaccard": pa.array(round6(g["min_j"].to_numpy().astype(np.float64)), pa.float64()),
                "avg_jaccard": pa.array(round6(g["avg_j"].to_numpy().astype(np.float64)), pa.float64()),
            },
            schema=out_schema,
        )

    return partitioned_map(joined, ["rep_id"], P, _audit)


# ---------------------------------------------------------------------------
# exact corpus-wide set-similarity self-join (no blocking key)


def _first_common_position_hash(
    pflat: np.ndarray, poff: np.ndarray, ii: np.ndarray, jj: np.ndarray
) -> np.ndarray:
    """For each candidate pair (ii[k], jj[k]) over rows of a (flat,
    offsets) list layout: the element of side ii's list at the LOWEST
    position that also occurs in side jj's list (0 if none).  Side ii's
    lists are rarity-ordered, so this is the pair's first common prefix
    token under the global order — one lexsort over the gathered
    segments, no per-pair Python."""
    from record_linkage_ldu_ray.functions.sim import gather_list_segments

    m = len(ii)
    out = np.zeros(m, dtype=np.uint64)
    if m == 0:
        return out
    va, oa = gather_list_segments(pflat, poff, ii)
    vb, ob = gather_list_segments(pflat, poff, jj)
    la = oa[1:] - oa[:-1]
    lb = ob[1:] - ob[:-1]
    pid = np.concatenate(
        [
            np.repeat(np.arange(m, dtype=np.int64), la),
            np.repeat(np.arange(m, dtype=np.int64), lb),
        ]
    )
    vals = np.concatenate([va, vb])
    # position within side-a's segment; b-side gets a sentinel
    pos_a = np.arange(len(va), dtype=np.int64) - np.repeat(
        np.cumsum(la) - la, la
    )
    pos = np.concatenate([pos_a, np.full(len(vb), -1, np.int64)])
    tag = np.concatenate(
        [np.zeros(len(va), np.int8), np.ones(len(vb), np.int8)]
    )
    order = np.lexsort((tag, vals, pid))
    sv, sp, st, spos = vals[order], pid[order], tag[order], pos[order]
    # common: adjacent rows with equal (pair, value) and tags (a, b)
    com = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1]) & (st[:-1] == 0) & (st[1:] == 1)
    if not com.any():
        return out
    c_pid = sp[:-1][com]
    c_pos = spos[:-1][com]
    c_val = sv[:-1][com]
    # first (lowest a-position) common element per pair
    o2 = np.lexsort((c_pos, c_pid))
    c_pid, c_pos, c_val = c_pid[o2], c_pos[o2], c_val[o2]
    first = np.r_[True, c_pid[1:] != c_pid[:-1]]
    out[c_pid[first]] = c_val[first]
    return out


def jaccard_join_all(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.5,
    num_parts: int | None = None,
    metrics: dict | None = None,
):
    """Exact token-set Jaccard self-join over the WHOLE corpus — no
    blocking key, no candidate loss — via AllPairs prefix filtering
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW 2007 — public).

    Where :func:`jaccard_dup_pairs` is exact only WITHIN a user-chosen
    blocking key, this operator is exact corpus-wide: a pair with
    ``J >= tau`` is guaranteed a shared *prefix token*, where each
    record's prefix is its ``len - ceil(tau*len) + 1`` rarest tokens
    under one global (df, hash) order.  Rare-first ordering makes
    prefix buckets small: a token shared by f records costs O(f²)
    candidates only if it survives into prefixes, and the globally
    frequent tokens never do.

    Scale shape — the driver never sees the vocabulary (O(1) driver
    memory; no broadcast at all): (1) DF-join exchange — the distinct
    (record, token-hash) occurrence stream is hash-exchanged on the
    token; each partition owns every occurrence of its hash range, so
    the GLOBAL df of each token is just its group size there, and the
    df rides back attached to each occurrence row.  (2) record
    rebuild — ONE exchange of the (rid, h, df) stream on the record id
    co-locates each record's occurrences; per-record token lists and
    rarity ranks are rebuilt vectorized in-partition.  df=1 hapax
    pruning stays exact and partition-local: a df=1 token occurs in
    exactly one document corpus-wide, so it can never be shared by a
    pair — never a candidate generator, never a pair's first-common
    prefix token — and it is dropped from prefix emission (tokens keep
    their df for the rarity ORDER, identical to the unpruned
    computation).  ``metrics["df_vocab_tokens"]`` /
    ``["df_vocab_bytes"]`` record the df>=2 vocabulary size, summed
    from per-partition counts (an O(partitions) driver aggregate, not
    a fold of the vocabulary).  (3) prefix emission — per-row rarity
    sort is one lexsort over the partition, each record emits only its
    df>=2 prefix tokens (payload = the record's hash list; df=1 prefix
    tokens would land in singleton buckets, so skipping them also cuts
    the exchange volume by the hapax share of every prefix);
    (4) ONE exchange on the prefix token co-locates candidate
    buckets; within a bucket the triangle is enumerated vectorized and
    verified with the exact float64 Jaccard merge kernel; ownership by
    the pair's first common prefix token makes each pair verified
    exactly once.  The float ceil is epsilon-guarded so e.g.
    ``0.4 * 5 = 2.0000000000000004`` still yields the mathematically
    correct overlap bound (a too-large bound would DROP true pairs).

    A candidate pair is verified exactly ONCE: every pair shares one or
    more prefix tokens, and only the bucket of its FIRST common prefix
    token (rarity order, computed vectorized from the carried prefix
    lists) owns it — so no global pair-dedup exchange is needed.

    NOTE the synthetic bench corpus (~31-token vocabulary) is the
    adversarial worst case for prefix filtering — every token is
    frequent, so candidate counts approach all-pairs and the operator
    degrades gracefully toward the brute-force cost.  Real corpora are
    rare-token-rich, which is exactly where the prefix filter wins.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard 6dp.
    """
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts

    def _prep_occ(t: pa.Table) -> pa.Table:
        """Distinct (rid, token-hash) occurrence stream — the only thing
        that leaves the tokenize stage; raw text never shuffles."""
        toks = _prep_tokens(t[text_col])
        tok_arr = toks.to_arrow()
        if pa.types.is_large_list(tok_arr.type):
            tok_arr = tok_arr.cast(pa.list_(pa.string()))
        offsets = tok_arr.offsets.to_numpy().astype(np.int64)
        flat = fnv1a_hash_strings(tok_arr.flatten())
        lens = offsets[1:] - offsets[:-1]
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rid": pa.array(np.repeat(ids, lens), pa.int64()),
                "h": pa.array(flat, pa.uint64()),
            }
        )

    occ = ds.select_columns([id_col, text_col]).map_batches(
        _prep_occ, batch_format="pyarrow", zero_copy_batch=True
    )

    # ---- pass 1: global df joined onto each occurrence, in-partition ------
    def _df_join(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "rid": pa.array([], pa.int64()),
                "h": pa.array([], pa.uint64()),
                "df": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        h = t["h"].combine_chunks().to_numpy()
        rid = t["rid"].combine_chunks().to_numpy()
        # this partition owns every occurrence of its hash range, so a
        # token's group size IS its global df (occurrences are per-doc
        # distinct) — the "rank join" happens here, never on the driver
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        counts = np.diff(np.r_[starts, len(hs)])
        df = np.empty(len(hs), np.int64)
        df[order] = np.repeat(counts, counts)
        return pa.table(
            {
                "rid": pa.array(rid, pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "df": pa.array(df, pa.int64()),
            }
        )

    # materialized: consumed by the per-partition vocab counters AND the
    # record-rebuild exchange; blocks live in the (spillable) object
    # store, the driver holds only references
    rank = partitioned_map(occ, ["h"], P, _df_join).materialize()

    if metrics is not None:
        # df>=2 vocabulary size, counted per partition (each token hash
        # lives wholly in one partition block) and summed — an
        # O(partitions) driver aggregate; the vocabulary itself never
        # reaches the driver and is never broadcast
        def _vocab_stats(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                n_tok = 0
            else:
                hh = t["h"].combine_chunks().to_numpy()
                dd = t["df"].combine_chunks().to_numpy()
                n_tok = int(len(np.unique(hh[dd >= 2])))
            return pa.table(
                {
                    "tokens": pa.array([n_tok], pa.int64()),
                    "bytes": pa.array([n_tok * 16], pa.int64()),
                }
            )

        stats = rank.map_batches(
            _vocab_stats, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        ).sum(["tokens", "bytes"])
        stats = stats or {"sum(tokens)": 0, "sum(bytes)": 0}
        metrics["df_vocab_tokens"] = int(stats["sum(tokens)"])
        metrics["df_vocab_bytes"] = int(stats["sum(bytes)"])

    # ---- pass 2: rebuild records, emit prefix tokens ----------------------
    def _emit(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ph": pa.array([], pa.uint64()),
                "rid": pa.array([], pa.int64()),
                "hashes": pa.array([], pa.large_list(pa.uint64())),
                "pfx": pa.array([], pa.large_list(pa.uint64())),
            }
        )
        if len(t) == 0:
            return empty
        rid_all = t["rid"].combine_chunks().to_numpy()
        h_all = t["h"].combine_chunks().to_numpy()
        df_all = t["df"].combine_chunks().to_numpy()
        # this partition owns every occurrence of its record-id range:
        # rebuild each record's sorted token-hash list + df vector
        order0 = np.lexsort((h_all, rid_all))
        flat = h_all[order0]
        tok_df = df_all[order0]
        rid_sorted = rid_all[order0]
        new_rec = np.r_[True, rid_sorted[1:] != rid_sorted[:-1]]
        ids = rid_sorted[new_rec]
        n = len(ids)
        rec_starts = np.flatnonzero(new_rec)
        lens = np.diff(np.r_[rec_starts, len(rid_sorted)])
        off = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        parents = np.repeat(np.arange(n, dtype=np.int64), lens)
        arr = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array(flat, pa.uint64())
        )
        found = tok_df >= 2
        # rarity order within each row: (parent, df asc, hash asc)
        order = np.lexsort((flat, tok_df, parents))
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(lens)[:-1]], lens
        )
        alpha = np.ceil(tau * lens - 1e-9).astype(np.int64)
        p_len = np.maximum(lens - alpha + 1, 0)
        # `pos` indexes the SORTED layout (lexsort is parent-primary, so
        # rows are contiguous in parent order with unchanged lengths).
        # df=1 prefix tokens are dropped from the emission AND the carried
        # prefix lists: they occur in one document, so they can't be the
        # shared prefix token the AllPairs guarantee needs, can't be a
        # pair's first-COMMON prefix token (common => df>=2), and their
        # buckets are singletons — pruning them changes no answer and cuts
        # the exchange by the hapax share of every prefix.
        keep_sorted = (pos < p_len[parents[order]]) & found[order]
        sel = order[keep_sorted]
        sel_parents = parents[sel]
        # each record's df>=2 prefix list in rarity order (the ownership
        # filter in the bucket stage needs it to find the FIRST common
        # prefix token of a candidate pair)
        p_counts = np.bincount(sel_parents, minlength=n).astype(np.int64)
        pfx_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(p_counts, out=pfx_offsets[1:])
        pfx_list = pa.LargeListArray.from_arrays(
            pa.array(pfx_offsets, pa.int64()), pa.array(flat[sel], pa.uint64())
        )
        return pa.table(
            {
                "ph": pa.array(flat[sel], pa.uint64()),
                "rid": pa.array(ids[sel_parents], pa.int64()),
                "hashes": arr.take(pa.array(sel_parents)),
                "pfx": pfx_list.take(pa.array(sel_parents)),
            }
        )

    keyed = partitioned_map(rank, ["rid"], P, _emit)

    # ---- pass 3: bucket verification --------------------------------------
    pair_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
    )

    def _bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pair_schema.empty_table()
        ph = t["ph"].combine_chunks().to_numpy()
        order = np.argsort(ph, kind="stable")
        ph = ph[order]
        rid = t["rid"].combine_chunks().to_numpy()[order]
        arr = t["hashes"].combine_chunks().take(pa.array(order))
        off = arr.offsets.to_numpy().astype(np.int64)
        flat = arr.values.to_numpy().astype(np.uint64)[off[0]: off[-1]]
        off = off - off[0]
        pfx = t["pfx"].combine_chunks().take(pa.array(order))
        poff = pfx.offsets.to_numpy().astype(np.int64)
        pflat = pfx.values.to_numpy().astype(np.uint64)[poff[0]: poff[-1]]
        poff = poff - poff[0]
        n = len(ph)
        starts = np.flatnonzero(np.r_[True, ph[1:] != ph[:-1]])
        counts = np.diff(np.r_[starts, n])
        ends = np.repeat(starts + counts, counts)
        reps = ends - 1 - np.arange(n, dtype=np.int64)
        total = int(reps.sum())
        if total == 0:
            return pair_schema.empty_table()
        ii = np.repeat(np.arange(n, dtype=np.int64), reps)
        seg_off = np.cumsum(reps) - reps
        jj = ii + 1 + (np.arange(total, dtype=np.int64) - seg_off[ii])
        keep = rid[ii] != rid[jj]
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return pair_schema.empty_table()
        # ownership: a candidate pair appears in the bucket of EVERY
        # shared prefix token; verify it only where the bucket token is
        # the pair's FIRST common prefix token in rarity order, so each
        # pair is verified exactly once across the whole cluster (no
        # global pair-dedup exchange needed).  The first-common token is
        # the min-POSITION common element of side a's rarity-ordered
        # prefix list (that list is sorted by the global order).
        own = _first_common_position_hash(pflat, poff, ii, jj) == ph[ii]
        ii, jj = ii[own], jj[own]
        if len(ii) == 0:
            return pair_schema.empty_table()
        ja = _pair_jaccard_f64(flat, off, ii, jj)
        hit = ja >= tau
        ii, jj, ja = ii[hit], jj[hit], ja[hit]
        a = np.minimum(rid[ii], rid[jj])
        b = np.maximum(rid[ii], rid[jj])
        key = np.stack([a, b], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        return pa.table(
            {
                "id_a": pa.array(a[first], pa.int64()),
                "id_b": pa.array(b[first], pa.int64()),
                "jaccard": pa.array(round6(ja[first]), pa.float64()),
            },
            schema=pair_schema,
        )

    return partitioned_map(keyed, ["ph"], P, _bucket)
