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


def _as_matrix(col: pa.ChunkedArray, n: int) -> np.ndarray:
    vals = col.combine_chunks()
    return np.asarray(vals.values).reshape(n, -1).astype(np.float64)


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


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
            out_c.append(round(-negc, 6))
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


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


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
    seed: int = 0xA11CE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets; each corpus batch
    scores only rows whose sign-key matches some query's key.  Same output
    shape as ``brute_force_topk`` (may differ in members — approximate)."""
    qmat = _unit_rows(np.asarray(query_vectors, np.float64))
    planes = _hyperplanes(qmat.shape[1], n_bits, seed)
    qkeys = _sign_keys(qmat, planes)
    state = ray.put((qmat, qkeys, planes))

    def _partial(t: pa.Table) -> pa.Table:
        q, qk, pl_ = ray.get(state)
        ids = t[id_col].to_numpy()
        mat = _unit_rows(_as_matrix(t[vec_col], len(t)))
        keys = _sign_keys(mat, pl_)
        mask = np.isin(keys, qk)
        empty = pa.table(
            {
                "qidx": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        if not mask.any():
            return empty
        sub, sids, skeys = mat[mask], ids[mask], keys[mask]
        out_q, out_v, out_c = [], [], []
        for j in range(q.shape[0]):
            bm = skeys == qk[j]
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
                out_c.append(round(-negc, 6))
                out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_v, pa.int64()),
            "cos_sim": pa.array(out_c, pa.float64()),
            "rank": pa.array(out_r, pa.int32()),
        }
    )
