"""Exact edit-distance self-join: every pair of records whose field is
within Levenshtein distance ``k``.

The reference engine compares name/address fields with per-pair string
distances over a blocked candidate index (compare_ldu_hw.py:72 uses
``td.levenshtein.normalized_similarity`` on short fields; README.md:245
"check only those with matching countries" is its blocking).  This module
gives the same capability as a LOSSLESS distributed join: no candidate
within distance ``k`` is ever missed, unlike LSH-style blocking.

Blocking scheme — symmetric-delete neighborhood (FastSS, Bocek et al.,
"Fast Similarity Search in Large Dictionaries", TR 2007; popularised as
SymSpell — both public):

  every record emits its deletion neighborhood D_k(s) = all strings
  obtained from s by deleting at most k code points.  If lev(a, b) <= k,
  an optimal alignment with i insertions, d deletions, s substitutions
  (i+d+s <= k) yields a common string by deleting the (d+s) deleted or
  substituted positions from a and the (i+s) inserted or substituted
  positions from b — so D_k(a) ∩ D_k(b) != ∅ and the pair shares a
  bucket.  The converse does NOT hold, so every candidate is verified
  with the exact bit-parallel Myers/Hyyrö distance kernel
  (:func:`~record_linkage_ldu_ray.functions.sim.levenshtein_distance_batch_arrow`)
  before it is emitted.

Scale shape (the part that must hold at 100 TB):

- variant generation is vectorized: k=1 neighborhoods come from
  ``max_len`` polars slice+concat column ops (NOT a per-row loop); k=2
  re-applies the same pass to the (exploded) k=1 variants.  Key blowup is
  len+1 keys/record at k=1 and O(len²/2) at k=2 — k=2 is for SHORT keying
  fields (names, codes), which is exactly where edit distance is used.
- variants travel as 8-byte FNV-1a hashes, never strings; a hash
  collision can only create a spurious CANDIDATE, which exact
  verification then rejects — correctness is collision-proof.
- candidate verification is bucket-local: one hash exchange on the
  variant key co-locates each bucket, pairs are enumerated vectorized,
  length-filtered (|len_a − len_b| <= k) and verified in one batch kernel
  call per partition.  Only narrow (id_a, id_b, dist) rows leave.
- a second narrow exchange on the pair key dedupes pairs that share
  several variants (with k=1 pair multiplicity is <= len+1; rows are 24
  bytes, so this exchange is tiny relative to the input).
- uniform-prefix keys (e.g. ``Customer#00000…``) produce run-compressed
  neighborhoods: deleting any position of an m-run yields the same
  variant, which the per-record ``unique`` collapses — bucket sizes stay
  bounded by true neighborhood density, not string length.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings
from record_linkage_ldu_ray.functions.sim import levenshtein_distance_batch_arrow
from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

_PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("dist", pa.int64())]
)


def _delete_one(texts: pl.Series, max_len: int) -> pl.DataFrame:
    """All single-deletion variants of each string, vectorized: variant d
    is ``s[:d] + s[d+1:]`` — one slice+concat column op per position, so
    the loop is over ``max_len`` POSITIONS, not over rows.  Returns a
    two-column frame (row index ``i``, variant string ``v``) with only
    valid positions (d < len) kept."""
    n = len(texts)
    lens = texts.str.len_chars().to_numpy().astype(np.int64)
    top = int(min(max_len, lens.max() if n else 0))
    frames = []
    idx = pl.Series("i", np.arange(n, dtype=np.int64))
    for d in range(top):
        alive = lens > d
        if not alive.any():
            break
        sub = texts.filter(pl.Series(alive))
        var = sub.str.slice(0, d) + sub.str.slice(d + 1)
        frames.append(
            pl.DataFrame({"i": idx.filter(pl.Series(alive)), "v": var.alias("v")})
        )
    if not frames:
        return pl.DataFrame(
            {"i": pl.Series("i", [], pl.Int64), "v": pl.Series("v", [], pl.String)}
        )
    return pl.concat(frames)


def _neighborhood(texts: pl.Series, k: int, max_len: int) -> pl.DataFrame:
    """D_k neighborhood as an (i, v) frame, deduped per record.  Includes
    the 0-deletion variant (the string itself) — required so that pure
    insertion/deletion pairs and exact duplicates share a bucket."""
    clipped = texts.str.slice(0, max_len)
    out = pl.DataFrame(
        {"i": pl.Series("i", np.arange(len(texts), dtype=np.int64)), "v": clipped}
    )
    frontier = out
    for _ in range(k):
        dels = _delete_one(frontier["v"], max_len)
        if dels.height == 0:
            break
        frontier = pl.DataFrame(
            {"i": frontier["i"].gather(dels["i"]), "v": dels["v"]}
        ).unique()
        out = pl.concat([out, frontier]).unique()
    return out.sort("i")


def edit_distance_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    k: int = 1,
    max_len: int = 64,
    num_parts: int | None = None,
):
    """All unordered record pairs with ``levenshtein(text_a, text_b) <= k``
    — exact (lossless blocking + exact verification), distributed.

    Output: one row per pair — ``(id_a, id_b, dist)`` with
    ``id_a < id_b`` and ``dist`` the integer edit distance.  Strings are
    clamped to ``max_len`` (<= 64) code points like every batch kernel in
    this engine; feed pre-sliced fields when parity beyond 64 matters.
    """
    if k < 1:
        raise ValueError("k must be >= 1 (use exact_dedup for k = 0)")
    if k > 2:
        raise ValueError(
            "k > 2 explodes the deletion neighborhood; pre-chunk the field "
            "or use a q-gram filter pipeline instead"
        )
    P = default_num_parts() if num_parts is None else num_parts

    def _emit(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t[text_col].combine_chunks()).fill_null("")
        nb = _neighborhood(texts, k, max_len)
        gi = nb["i"].to_numpy()
        kh = fnv1a_hash_strings(nb["v"].to_arrow())
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)[gi]
        return pa.table(
            {
                "kh": pa.array(kh, pa.uint64()),
                "rid": pa.array(ids, pa.int64()),
                "txt": pa.array(texts.gather(gi).to_arrow().cast(pa.string())),
            }
        )

    keyed = ds.select_columns([id_col, text_col]).map_batches(
        _emit, batch_format="pyarrow", zero_copy_batch=True
    )

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PAIR_SCHEMA.empty_table()
        kh = t["kh"].combine_chunks().to_numpy()
        order = np.argsort(kh, kind="stable")
        kh = kh[order]
        rid = t["rid"].combine_chunks().to_numpy()[order]
        txt = t["txt"].combine_chunks().take(pa.array(order))
        # clamp to max_len: blocking keys and the DP kernel both operate on
        # the first max_len code points, so the length-gap filter must too —
        # unclamped lengths would drop a pair whose clamped distance <= k
        lens = np.minimum(
            pc.utf8_length(txt).to_numpy().astype(np.int64), max_len
        )
        # bucket boundaries over the sorted key column
        n = len(kh)
        starts = np.flatnonzero(np.r_[True, kh[1:] != kh[:-1]])
        counts = np.diff(np.r_[starts, n])
        # enumerate the triangle of every bucket, fully vectorized: each
        # row r anchors (bucket_end - 1 - r) pairs; partner offsets come
        # from a segment-local arange (cumsum offset trick) — no Python
        # loop over buckets
        ends = np.repeat(starts + counts, counts)  # bucket end per row
        reps = ends - 1 - np.arange(n, dtype=np.int64)
        total = int(reps.sum())
        if total == 0:
            return _PAIR_SCHEMA.empty_table()
        ii = np.repeat(np.arange(n, dtype=np.int64), reps)
        seg_off = np.cumsum(reps) - reps  # first output slot of each anchor
        jj = ii + 1 + (np.arange(total, dtype=np.int64) - seg_off[ii])
        # cheap exact filters before the DP kernel: identical ids (a
        # record meets itself through several variants) and length gap
        keep = (rid[ii] != rid[jj]) & (np.abs(lens[ii] - lens[jj]) <= k)
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return _PAIR_SCHEMA.empty_table()
        dist = levenshtein_distance_batch_arrow(
            txt.take(pa.array(ii)), txt.take(pa.array(jj)), max_len=max_len
        )
        hit = dist <= k
        ii, jj, dist = ii[hit], jj[hit], dist[hit]
        a = np.minimum(rid[ii], rid[jj])
        b = np.maximum(rid[ii], rid[jj])
        # local dedup (same pair via several variants in this partition)
        key = np.stack([a, b], axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        return pa.table(
            {
                "id_a": pa.array(a[first], pa.int64()),
                "id_b": pa.array(b[first], pa.int64()),
                "dist": pa.array(dist[first], pa.int64()),
            },
            schema=_PAIR_SCHEMA,
        )

    pairs = partitioned_map(keyed, ["kh"], P, _bucket_pairs)

    def _dedup(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PAIR_SCHEMA.empty_table()
        a = t["id_a"].combine_chunks().to_numpy()
        b = t["id_b"].combine_chunks().to_numpy()
        d = t["dist"].combine_chunks().to_numpy()
        _, first = np.unique(np.stack([a, b], axis=1), axis=0, return_index=True)
        return pa.table(
            {
                "id_a": pa.array(a[first], pa.int64()),
                "id_b": pa.array(b[first], pa.int64()),
                "dist": pa.array(d[first], pa.int64()),
            },
            schema=_PAIR_SCHEMA,
        )

    return partitioned_map(pairs, ["id_a", "id_b"], P, _dedup)
