"""Approximate-nearest-neighbor search over an embedding column.

Scale pattern: the query matrix is SMALL (broadcast once via ``ray.put``,
read inside every batch task — never re-shipped per batch, SURVEY §2.3 T3
anti-pattern); the corpus STREAMS through ``map_batches`` with a per-batch
partial top-k, then a tiny driver-side merge of ≤ num_blocks × Q × k
candidate rows.  The LSH variant buckets both sides by random-hyperplane
sign keys so each task only scores its bucket (the 100 TB path).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_linkage_ldu_ray.functions.rounding import round6_scalar


def _as_matrix(col: pa.ChunkedArray, n: int) -> np.ndarray:
    vals = col.combine_chunks()
    return np.asarray(vals.values).reshape(n, -1).astype(np.float64)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


_GRID = 1048576.0  # 2^20


def _quant_grid(mat: np.ndarray) -> np.ndarray:
    """Snap to the 2^-20 dyadic grid via floor — both the ×2^20 scaling and
    the ÷2^20 are exact powers-of-two, and floor is identical in numpy and
    SQL, so quantization is bit-exact everywhere given identical input."""
    return np.floor(mat * _GRID) / _GRID


def _empty_candidates(id_col: str) -> pa.Table:
    return pa.table(
        {
            "qidx": pa.array([], pa.int32()),
            id_col: pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )


def brute_force_topk(
    ds: "ray.data.Dataset",
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k per query via streaming partial top-k.

    Returns a small pyarrow Table (query_id, vec_id, cos_sim, rank) with
    rank 1..k per query, ties broken by ascending vec_id (deterministic).
    """
    qt = _unit_rows(np.asarray(query_vectors, np.float64))
    q_ref = ray.put(qt)  # broadcast once

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # Ray Data can emit empty blocks — reshape(0,-1)
            return _empty_candidates(id_col)  # and argpartition(kth=-1) choke
        q = ray.get(q_ref)
        ids = t[id_col].to_numpy()
        mat = _unit_rows(_as_matrix(t[vec_col], len(t)))
        cos = mat @ q.T  # (n, Q)
        nq = q.shape[0]
        kk = min(k, len(ids))
        # per-query partial top-k within this batch
        part = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, Q)
        rows, qcols = part.reshape(-1), np.repeat(np.arange(nq)[None, :], kk, axis=0).reshape(-1)
        return pa.table(
            {
                "qidx": pa.array(qcols, pa.int32()),
                id_col: pa.array(ids[rows], pa.int64()),
                "cos_sim": pa.array(cos[rows, qcols], pa.float64()),
            }
        )

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    # driver-side merge of the small candidate set (≤ blocks × Q × k rows)
    tables = [t for r in cand if len(t := ray.get(r))]
    merged = pa.concat_tables(tables) if tables else _empty_candidates(id_col)
    qi = merged["qidx"].to_numpy()
    vid = merged[id_col].to_numpy()
    cs = merged["cos_sim"].to_numpy()
    out_q, out_v, out_c, out_r = [], [], [], []
    for j in range(len(query_ids)):
        m = qi == j
        best = heapq.nsmallest(k, zip(-cs[m], vid[m]))
        for rank, (negc, v) in enumerate(best, 1):
            out_q.append(int(query_ids[j]))
            out_v.append(int(v))
            out_c.append(round6_scalar(-negc))
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_v, pa.int64()),
            "cos_sim": pa.array(out_c, pa.float64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )


def load_queries(
    ds: "ray.data.Dataset",
    num_queries: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """First ``num_queries`` vectors by id — a tiny filtered read, the only
    full-row materialization (bounded by num_queries)."""
    import pyarrow.compute as pc  # noqa: F401

    t = (
        ds.filter(expr=f"{id_col} < {num_queries}")
        .select_columns([id_col, vec_col])
        .to_arrow_refs()
    )
    tbl = pa.concat_tables([x for r in t if len(x := ray.get(r))])
    order = np.argsort(tbl[id_col].to_numpy())
    ids = tbl[id_col].to_numpy()[order]
    mat = _as_matrix(tbl[vec_col], len(tbl))[order]
    return mat, ids


def kmeans_centroids(
    ds: "ray.data.Dataset",
    n_cells: int = 16,
    sample_size: int = 2048,
    n_iter: int = 10,
    seed: int = 0xC0FFEE,
    n_restarts: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Trained coarse quantizer: grid-quantized spherical k-means, best of
    ``n_restarts`` splitmix64-seeded uniform inits by within-cell cosine
    objective, on a deterministic UNBIASED sample — the ``sample_size``
    records with the smallest ``hash(salt + str(id))`` (the engine's own
    splitmix64 id hash, the same membership primitive as ``hash_sample``)
    — so centroids are byte-identical at any parallelism and row order,
    AND bit-identical to the SQL oracle's recursive-CTE replay (see
    ``__ray_entry__`` ``_KMEANS_CENTS_SQL``): every sum in the iteration
    is exact on the 2^-20 grid, so no float-accumulation-order hazard
    exists anywhere in the chain.  Min-k over a uniform hash is a uniform
    sample of exactly ``sample_size`` records; an ``id < sample_size``
    filter would instead train on whatever source shard owns the low
    ids (sharded corpora assign id ranges per source).  Each batch
    contributes at most ``sample_size`` partial winners and the driver
    folds them stream-wise, so driver memory stays
    O(sample_size × dim), not O(corpus).  Lloyd iterations run
    driver-side on (S, d) numpy."""
    from record_linkage_ldu_ray.pipelines.sampling import _u64_hash

    salt = f"kmeans-sample-{seed}"

    def _partial(t: pa.Table) -> pa.Table:
        t = t.select([id_col, vec_col])
        if len(t) == 0:
            return t.append_column("_h", pa.array([], pa.uint64()))
        h = _u64_hash(t[id_col].combine_chunks(), salt)
        if len(h) > sample_size:
            keep = np.sort(np.argpartition(h, sample_size)[:sample_size])
            t = t.take(pa.array(keep))
            h = h[keep]
        return t.append_column("_h", pa.array(h, pa.uint64()))

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # streaming driver fold: keep the global sample_size smallest (hash, id)
    ids = np.empty(0, np.int64)
    hsh = np.empty(0, np.uint64)
    mat = None
    for b in parts.iter_batches(batch_format="pyarrow"):
        if len(b) == 0:
            continue
        bm = _as_matrix(b[vec_col], len(b))
        ids = np.concatenate([ids, b[id_col].to_numpy(zero_copy_only=False)])
        hsh = np.concatenate([hsh, b["_h"].to_numpy(zero_copy_only=False)])
        mat = bm if mat is None else np.concatenate([mat, bm])
        if len(ids) > 2 * sample_size:
            keep = np.lexsort((ids, hsh))[:sample_size]
            ids, hsh, mat = ids[keep], hsh[keep], mat[keep]
    if mat is None or len(ids) == 0:
        raise ValueError("kmeans_centroids: no sample rows matched")
    keep = np.lexsort((ids, hsh))[:sample_size]
    ids, mat = ids[keep], mat[keep]
    order = np.argsort(ids)  # canonical id-order layout for the seeded init
    # Grid-quantized spherical Lloyd: unit rows snapped to the 2^-20 grid
    # (floor), so every value in the iteration is a dyadic rational with
    # ≤20 fractional bits and |x| ≤ 1.  Consequences, by construction:
    #   * dot products (products are multiples of 2^-40, partial sums
    #     bounded by dim) and member sums (bounded by sample_size) are
    #     EXACT in float64 under ANY summation order — assignments and
    #     centroid updates are bit-identical across numpy, BLAS, and the
    #     DuckDB SQL oracle's parallel aggregation;
    #   * the only rounding steps left (mean division, norm sqrt, renorm
    #     division) are single correctly-rounded IEEE ops, identical
    #     everywhere.
    # The 1e-6 grid perturbs centroids far below the recall gates'
    # sensitivity (tests/test_recall.py) and buys an exactly-replayable
    # quantizer: the SQL oracle runs the same 10 Lloyd iterations.
    mat = _quant_grid(_unit_rows(mat))[order]
    ids_sorted = ids[order].astype(np.uint64)
    k_eff = min(n_cells, len(mat))
    # best-of-R restarts (sklearn-style n_init): each restart draws a
    # uniform k-subset by ranking ids on splitmix64(id + seed + r) — the
    # exact analogue of a seeded rng.choice, but expressible in SQL — runs
    # the quantized Lloyd, and the restart with the highest within-cell
    # cosine objective wins.  The objective is a sum of exact dyadics, so
    # the selection (ties → lowest r, which never fires in practice) is
    # bit-identical in the SQL oracle too.
    from record_linkage_ldu_ray.functions.hashing import splitmix64

    best, best_obj = None, -np.inf
    for r in range(n_restarts):
        perm = np.lexsort(
            (ids_sorted, splitmix64(ids_sorted + np.uint64(seed + r)))
        )
        cents = mat[np.sort(perm[:k_eff])].copy()
        for _ in range(n_iter):
            assign = (mat @ cents.T).argmax(axis=1)
            for c in range(k_eff):
                members = mat[assign == c]
                if len(members):
                    v = _quant_grid(members.sum(axis=0) / len(members))
                    n = np.sqrt((v * v).sum())
                    if n > 0:
                        cents[c] = _quant_grid(v / n)
        obj = float((mat @ cents.T).max(axis=1).sum())  # exact dyadic sum
        if obj > best_obj:
            best, best_obj = cents, obj
    return best


def assign_cells(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> "ray.data.Dataset":
    """Append the IVF cell id (nearest centroid by cosine) — the engine-made
    blocking column for ``embedding_dup_pairs`` / IVF search.  Centroids
    broadcast once via ``ray.put``."""
    ref = ray.put(np.asarray(centroids, np.float64))

    def _f(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(cell_col, pa.array([], pa.int32()))
        cents = ray.get(ref)
        mat = _unit_rows(_as_matrix(t[vec_col], len(t)))
        cell = (mat @ cents.T).argmax(axis=1).astype(np.int32)
        return t.append_column(cell_col, pa.array(cell, pa.int32()))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def ivf_topk(
    ds: "ray.data.Dataset",
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF approximate top-k: each query probes its ``nprobe`` nearest
    cells; every corpus batch scores only rows whose cell is probed by some
    query.  Same output shape as ``brute_force_topk`` (approximate)."""
    qmat = _unit_rows(np.asarray(query_vectors, np.float64))
    cents = np.asarray(centroids, np.float64)
    np_eff = min(nprobe, len(cents))
    # (Q, nprobe) probed cell ids per query
    qsim = qmat @ cents.T
    probed = np.argsort(-qsim, axis=1)[:, :np_eff]
    state = ray.put((qmat, probed, cents))

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_candidates(id_col)
        q, prb, C = ray.get(state)
        ids = t[id_col].to_numpy()
        mat = _unit_rows(_as_matrix(t[vec_col], len(t)))
        cells = (mat @ C.T).argmax(axis=1)
        any_probed = np.isin(cells, prb.ravel())
        if not any_probed.any():
            return _empty_candidates(id_col)
        sub, sids, scells = mat[any_probed], ids[any_probed], cells[any_probed]
        out_q, out_v, out_c = [], [], []
        for j in range(q.shape[0]):
            bm = np.isin(scells, prb[j])
            if not bm.any():
                continue
            cos = sub[bm] @ q[j]
            vids = sids[bm]
            kk = min(k, len(cos))
            top = np.argpartition(-cos, kk - 1)[:kk] if kk < len(cos) else np.arange(len(cos))
            out_q.extend([j] * len(top))
            out_v.extend(vids[top].tolist())
            out_c.extend(cos[top].tolist())
        return pa.table(
            {
                "qidx": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_c, pa.float64()),
            }
        )

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    tables = [x for r in cand if len(x := ray.get(r))]
    out_q, out_v, out_c, out_r = [], [], [], []
    if tables:
        merged = pa.concat_tables(tables)
        qi = merged["qidx"].to_numpy()
        vid = merged[id_col].to_numpy()
        cs = merged["cos_sim"].to_numpy()
        for j in range(len(query_ids)):
            m = qi == j
            best = heapq.nsmallest(k, zip(-cs[m], vid[m]))
            for rank, (negc, v) in enumerate(best, 1):
                out_q.append(int(query_ids[j]))
                out_v.append(int(v))
                out_c.append(round6_scalar(-negc))
                out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_v, pa.int64()),
            "cos_sim": pa.array(out_c, pa.float64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Rademacher (±1) sign-projection planes, entry (j, d) derived from
    ``splitmix64(seed + j*dim + d)``'s top bit.

    ±1 random projections are a published, JL-property-preserving
    replacement for Gaussian planes (Achlioptas 2003, "Database-friendly
    random projections"; Li/Hastie/Church 2006) with equivalent sign-LSH
    behaviour.  Chosen over ``np.random.standard_normal`` because the
    entries are pure integer arithmetic — the SQL oracle replays them
    exactly (splitmix64 in UHUGEINT), where a PCG64/ziggurat float stream
    could not be expressed in SQL at all."""
    from record_linkage_ldu_ray.functions.hashing import splitmix64

    idx = np.uint64(seed) + np.arange(n_bits * dim, dtype=np.uint64)
    top = (splitmix64(idx) >> np.uint64(63)).astype(bool)
    return np.where(top, 1.0, -1.0).reshape(n_bits, dim)


def _sign_keys(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0  # (n, n_bits)
    keys = np.zeros(len(mat), np.uint64)
    for j in range(planes.shape[0]):
        keys |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return keys


def lsh_topk(
    ds: "ray.data.Dataset",
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    probe_hamming: int = 1,
    seed: int = 0xA11CE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets with MULTIPROBE —
    each corpus batch scores rows whose sign-key is within ``probe_hamming``
    bits of some query's key (a near-boundary vector flips a plane sign;
    exact-bucket matching alone loses it).  Same output shape as
    ``brute_force_topk`` (may differ in members — approximate)."""
    raw_q = np.asarray(query_vectors, np.float64)
    qmat = _unit_rows(raw_q)
    planes = _hyperplanes(qmat.shape[1], n_bits, seed)
    # sign keys on the RAW doubles: sign(x·p) is invariant under the
    # positive per-row scaling of _unit_rows, and skipping the divide keeps
    # the float expression identical to the SQL oracle's (dot of the
    # widened float32 column against the ±1 plane)
    qkeys = _sign_keys(raw_q, planes)
    state = ray.put((qmat, qkeys, planes))

    def _popcount(x: np.ndarray) -> np.ndarray:
        out = np.zeros(x.shape, np.int32)
        for b in range(n_bits):
            out += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
        return out

    def _partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _empty_candidates(id_col)
        q, qk, pl_ = ray.get(state)
        ids = t[id_col].to_numpy()
        raw = _as_matrix(t[vec_col], len(t))
        mat = _unit_rows(raw)
        keys = _sign_keys(raw, pl_)  # raw doubles — see qkeys comment
        # (n, Q) probe matrix: key within probe_hamming of the query key
        ham = _popcount(keys[:, None] ^ qk[None, :])
        probe = ham <= probe_hamming
        mask = probe.any(axis=1)
        empty = _empty_candidates(id_col)
        if not mask.any():
            return empty
        sub, sids, sprobe = mat[mask], ids[mask], probe[mask]
        out_q, out_v, out_c = [], [], []
        for j in range(q.shape[0]):
            bm = sprobe[:, j]
            if not bm.any():
                continue
            cos = sub[bm] @ q[j]
            vids = sids[bm]
            kk = min(k, len(cos))
            top = np.argpartition(-cos, kk - 1)[:kk]
            out_q.extend([j] * kk)
            out_v.extend(vids[top].tolist())
            out_c.extend(cos[top].tolist())
        return pa.table(
            {
                "qidx": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_v, pa.int64()),
                "cos_sim": pa.array(out_c, pa.float64()),
            }
        )

    cand = ds.select_columns([id_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    tables = [x for r in cand if len(x := ray.get(r))]
    out_q, out_v, out_c, out_r = [], [], [], []
    if tables:
        merged = pa.concat_tables(tables)
        qi = merged["qidx"].to_numpy()
        vid = merged[id_col].to_numpy()
        cs = merged["cos_sim"].to_numpy()
        for j in range(len(query_ids)):
            m = qi == j
            best = heapq.nsmallest(k, zip(-cs[m], vid[m]))
            for rank, (negc, v) in enumerate(best, 1):
                out_q.append(int(query_ids[j]))
                out_v.append(int(v))
                out_c.append(round6_scalar(-negc))
                out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_v, pa.int64()),
            "cos_sim": pa.array(out_c, pa.float64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )
