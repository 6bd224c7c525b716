"""Sorted-Neighborhood blocking (SNM) — the classic record-linkage blocking
family the LSH/prefix blockers don't cover: sort the corpus by a sorting key
and compare every record with its ``window - 1`` successors in that order.

Reference parity: the reference reaches candidate pairs by full cross join /
per-field index blocking (SURVEY §2.5 J1/J2); SNM is the standard
complementary blocker (Hernández & Stolfo, SIGMOD '95) for typo-heavy keys
where equality blocking misses neighbors.  It is the windowed self-join an
engine must express carefully at scale:

1. range-exchange sort by (key, id) — the same distributed-sort cost
   ``global_rank`` pays (one all-to-all);
2. per sorted block: ONE tiny summary row (first key, row count); the
   driver prefix-sums block offsets (O(#blocks) driver state) and
   broadcasts them once via ``ray.put``;
3. each row gets its global rank ``rn = offset + arange`` and a partition
   key ``part = rn // block_budget``; rows whose rank sits within
   ``window - 1`` of a partition's lower edge are REPLICATED to the
   previous partition — the textbook boundary-overlap trick, so every
   window pair exists in exactly one partition;
4. one hash exchange on ``part``; per partition the pair list is a
   vectorized shifted-index zip (no per-row Python), with ownership
   ``rn // block_budget == part`` making each pair emitted exactly once.

The replication factor is ``(window - 1) / block_budget`` — thousands of
rows per multi-million-row partition at 100 TB, i.e. negligible; no stage
materializes more than the sorted run (spilled by the object store) and
slim (rn, id, payload) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from record_linkage_ldu_ray.runtime import (
    configure_exchange,
    default_num_parts,
    partitioned_map,
)


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    payload_col: str | None = None,
    window: int = 4,
    num_parts: int | None = None,
):
    """Emit every (a, b) pair whose ranks in the global (``key_col``,
    ``id_col``) sort order differ by at most ``window - 1`` (a strictly
    lower rank than b).  Output columns: (``id_a``, ``id_b``) plus, when
    ``payload_col`` is given, (``<payload>_a``, ``<payload>_b``) carrying
    that column's values for downstream comparison — so the scorer never
    re-joins the corpus.

    The sort key need not be unique; ``id_col`` (unique) tie-breaks, making
    the total order — and therefore the pair set — deterministic at any
    parallelism.
    """
    assert window >= 2, "window must be >= 2 (w-1 neighbors per record)"
    configure_exchange()
    n_parts = num_parts if num_parts is not None else default_num_parts()

    cols = [key_col, id_col] + ([payload_col] if payload_col else [])
    sorted_ds = ds.select_columns(cols).sort([key_col, id_col]).materialize()

    def _summary(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "first_key": pa.array([], pa.string()),
                    "first_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "first_key": pa.array([t[key_col][0].as_py()], pa.string()),
                "first_id": pa.array([t[id_col][0].as_py()], pa.int64()),
                "n": pa.array([len(t)], pa.int64()),
            }
        )

    summ_parts = [
        p
        for p in ray.get(
            sorted_ds.map_batches(
                _summary, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        # a 0-row input never runs the UDF: blocks keep the SOURCE schema
        if "first_key" in p.schema.names
    ]
    out_fields = {
        "id_a": pa.int64(),
        "id_b": pa.int64(),
        **(
            {f"{payload_col}_a": pa.string(), f"{payload_col}_b": pa.string()}
            if payload_col
            else {}
        ),
    }
    empty = pa.table({k: pa.array([], t) for k, t in out_fields.items()})
    if not summ_parts:
        return ray.data.from_arrow(empty)
    summ = pa.concat_tables(summ_parts)
    first_key = summ["first_key"].to_pylist()
    first_id = summ["first_id"].to_numpy()
    ns = summ["n"].to_numpy()
    # blocks are disjoint sorted runs → ordering by each block's FIRST row
    # under (key ASC, id ASC) orders the blocks; O(#blocks) driver work
    order = sorted(range(len(ns)), key=lambda i: (first_key[i], int(first_id[i])))
    offs = np.zeros(len(ns) + 1, np.int64)
    np.cumsum(ns[order], out=offs[1:])
    total = int(offs[-1])
    # partition budget: ≥ window so the one-partition replication reach
    # covers the whole window; ceil-div spreads ranks evenly over n_parts
    budget = max(int(window), -(-total // max(n_parts, 1)))
    offset_by_block = {
        (first_key[b], int(first_id[b])): int(offs[i]) for i, b in enumerate(order)
    }
    bcast = ray.put(offset_by_block)

    w = int(window)

    def _emit(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "rn": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                    "id": pa.array([], pa.int64()),
                    **({"pl": pa.array([], pa.string())} if payload_col else {}),
                }
            )
        offsets = ray.get(bcast)
        rn0 = offsets[(t[key_col][0].as_py(), t[id_col][0].as_py())]
        rn = rn0 + np.arange(len(t), dtype=np.int64)
        part = (rn // budget).astype(np.int32)
        ids = t[id_col].to_numpy()
        cols_out = {
            "rn": pa.array(rn, pa.int64()),
            "part": pa.array(part, pa.int32()),
            "id": pa.array(ids, pa.int64()),
        }
        if payload_col:
            cols_out["pl"] = t[payload_col]
        base = pa.table(cols_out)
        # boundary replicas: ranks within window-1 of a partition's lower
        # edge also serve the previous partition's tail pairs
        rep = (rn % budget < w - 1) & (part > 0)
        if rep.any():
            idx = np.nonzero(rep)[0]
            reptab = base.take(idx).set_column(
                1, "part", pa.array(part[idx] - 1, pa.int32())
            )
            base = pa.concat_tables([base, reptab])
        return base

    emitted = sorted_ds.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)

    def _pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        rn = t["rn"].to_numpy()
        part = t["part"].to_numpy().astype(np.int64)
        order = np.lexsort((rn, part))
        rn = rn[order]
        part = part[order]
        ids = t["id"].to_numpy()[order]
        own = (rn // budget) == part  # replicas never own pairs
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        n = len(rn)
        for d in range(1, w):
            if n <= d:
                break
            ia = np.arange(n - d)
            # within a part, ranks are contiguous & unique (owners +
            # replicas of the NEXT part only), so same-part adjacency at
            # distance d means rank distance exactly d
            ok = own[ia] & (part[ia + d] == part[ia])
            ia = ia[ok]
            if len(ia):
                a_parts.append(ia)
                b_parts.append(ia + d)
        if not a_parts:
            return empty
        ia_all = np.concatenate(a_parts)
        ib_all = np.concatenate(b_parts)
        out_cols: dict[str, pa.Array] = {
            "id_a": pa.array(ids[ia_all], pa.int64()),
            "id_b": pa.array(ids[ib_all], pa.int64()),
        }
        if payload_col:
            pl = t["pl"].combine_chunks().take(pa.array(order, pa.int64()))
            out_cols[f"{payload_col}_a"] = pl.take(pa.array(ia_all, pa.int64()))
            out_cols[f"{payload_col}_b"] = pl.take(pa.array(ib_all, pa.int64()))
        return pa.table(out_cols)

    return partitioned_map(emitted, ["part"], n_parts, _pairs)


def snm_multi_pass(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    id_col: str,
    window: int = 4,
    num_parts: int | None = None,
):
    """Multi-pass sorted neighborhood (the full Hernández & Stolfo
    merge/purge, SIGMOD '95): one SNM pass per sorting key, candidate
    sets unioned and deduplicated.  A single sort key misses pairs whose
    typo hits the key's leading characters; each extra pass sorts the
    corpus a DIFFERENT way, and the union recovers neighbors any single
    order separates — the reason the multi-pass variant is the
    production form of SNM.

    Each pass is the scale-correct windowed self-join of
    :func:`sorted_neighborhood_pairs` (range sort → O(#blocks) driver
    offsets → boundary-replicated partitions); the union is streamed and
    deduplicated by ONE narrow canonical-pair exchange that also counts
    how many passes found each pair.

    Output: (id_a, id_b, n_passes) with id_a < id_b.
    """
    if not key_cols:
        raise ValueError("need at least one sorting key")
    P = default_num_parts() if num_parts is None else num_parts
    passes = [
        sorted_neighborhood_pairs(ds, k, id_col, None, window, num_parts)
        for k in key_cols
    ]
    u = passes[0].union(*passes[1:]) if len(passes) > 1 else passes[0]

    out_schema = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("n_passes", pa.int64())]
    )

    def _canon(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        a = t["id_a"].combine_chunks().to_numpy()
        b = t["id_b"].combine_chunks().to_numpy()
        return pa.table(
            {
                "id_a": pa.array(np.minimum(a, b), pa.int64()),
                "id_b": pa.array(np.maximum(a, b), pa.int64()),
                "n_passes": pa.array(np.ones(len(t), np.int64), pa.int64()),
            },
            schema=out_schema,
        )

    canon = u.map_batches(_canon, batch_format="pyarrow", zero_copy_batch=True)

    def _dedup(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        a = t["id_a"].combine_chunks().to_numpy()
        b = t["id_b"].combine_chunks().to_numpy()
        key = np.stack([a, b], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        cnt = np.bincount(inv, weights=t["n_passes"].combine_chunks().to_numpy())
        return pa.table(
            {
                "id_a": pa.array(uniq[:, 0], pa.int64()),
                "id_b": pa.array(uniq[:, 1], pa.int64()),
                "n_passes": pa.array(cnt.astype(np.int64), pa.int64()),
            },
            schema=out_schema,
        )

    return partitioned_map(canon, ["id_a", "id_b"], P, _dedup)
