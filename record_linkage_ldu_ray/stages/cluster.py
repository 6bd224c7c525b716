"""S7 — transitive clustering: distributed union-find (shuffle #4, iterated).

The reference's ``group_matches`` (main_ldu_hw.py:24-61, main_ldu_ldu.py:25-62)
is a greedy single-pass closure over the edge list in driver memory; it can
emit overlapping groups (the very thing its ``validate_groups`` checks for,
main_ldu_hw.py:64-94).  The intended semantics is true connected components
("A==B and B==C ⇒ [A,B,C] same client", main_ldu_hw.py:27) — implemented
here as iterated LOCAL union-find + hash-partitioned exchange (the
"hash-to-min on partitions" scheme of the map-reduce CC literature,
ICDE'13 "Finding connected components in map-reduce in logarithmic
rounds"):

  - pre-contraction: every edge batch collapses to a spanning star
    (node → local min root) via a vectorized numpy union-find — a dense
    component of E edges shrinks to ≤ |nodes| edges BEFORE any shuffle;
  - round: symmetrize, hash-partition by node, full local union-find per
    partition, re-emit (node → root) stars; labels only decrease, fixpoint
    (checksum-stable edge multiset) = exact global components in
    O(log diameter) rounds of the contracted graph;
  - partition count adapts to the shrinking edge list so late rounds don't
    pay 64-task scheduling overhead for a few thousand edges.

Final labels: cluster_id = min conv_id of the component; singletons (convs
with no matched edge) are their own cluster.  The D4 invariant — every
conv_id appears in exactly one cluster — holds by construction and is
asserted cheaply in tests.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings, pair_hash
from record_linkage_ldu_ray.runtime import partitioned_map


def _add_upart(batch: pa.Table, num_parts: int) -> pa.Table:
    part = (fnv1a_hash_strings(batch["u"]) % np.uint64(num_parts)).astype(np.int32)
    return batch.append_column("upart", pa.array(part, pa.int32()))


def union_find_codes(us: np.ndarray, vs: np.ndarray, n: int) -> np.ndarray:
    """Exact connected components over integer-coded edges — vectorized
    hooking (min-label) + pointer jumping; O(E · α)-ish in numpy passes.
    Returns the root (component min) for each of the n nodes."""
    parent = np.arange(n, dtype=np.int64)
    while True:
        pu = parent[us]
        pv = parent[vs]
        lo = np.minimum(pu, pv)
        hi = np.maximum(pu, pv)
        before = parent.copy()
        np.minimum.at(parent, hi, lo)
        # pointer jumping to full compression
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        if np.array_equal(parent, before):
            return parent


def _contract(tbl: pa.Table) -> pa.Table:
    """Edge table (u, v strings) → spanning-star edges (node, root) of its
    LOCAL components, root = min node string; self-loops dropped."""
    if "upart" in tbl.column_names:
        tbl = tbl.drop_columns(["upart"])
    if len(tbl) == 0:
        return pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})
    import pyarrow.compute as pc

    u = tbl["u"].cast(pa.string()).combine_chunks() if isinstance(tbl["u"], pa.ChunkedArray) else tbl["u"].cast(pa.string())
    v = tbl["v"].cast(pa.string()).combine_chunks() if isinstance(tbl["v"], pa.ChunkedArray) else tbl["v"].cast(pa.string())
    # np.unique-equivalent without materializing Python strings: dictionary
    # encode (Arrow C++), then rank the vocabulary by byte order (== code
    # point order for UTF-8, matching Python str comparison) so "min root"
    # still means "min node string".
    m = len(u)
    enc = pa.concat_arrays([u, v]).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    vocab = enc.dictionary
    order = pc.sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    rank = np.empty(len(vocab), dtype=np.int64)
    rank[order] = np.arange(len(vocab), dtype=np.int64)
    rcodes = rank[codes]
    roots = union_find_codes(rcodes[:m], rcodes[m:], len(vocab))
    node = np.arange(len(vocab), dtype=np.int64)
    keep = roots != node
    vocab_sorted = vocab.take(pa.array(order))
    return pa.table(
        {
            "u": vocab_sorted.take(pa.array(node[keep])),
            "v": vocab_sorted.take(pa.array(roots[keep])),
        }
    )


def _symmetrize(batch: pa.Table) -> pa.Table:
    rev = pa.table({"u": batch["v"], "v": batch["u"]})
    return pa.concat_tables([batch.select(["u", "v"]), rev])


def _edge_checksum(ds) -> tuple[int, int]:
    """(count, sum of pair hashes) — cheap fixpoint detector."""

    def _part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([0], pa.int64()), "s": pa.array([0], pa.int64())})
        h = pair_hash(t["u"], t["v"]).astype(np.int64)
        return pa.table({"n": pa.array([len(t)], pa.int64()), "s": pa.array([int(h.sum())], pa.int64())})

    parts = ds.map_batches(_part, batch_format="pyarrow").to_pandas()
    if "n" not in parts.columns:  # zero blocks (empty edge set)
        return 0, 0
    return int(parts["n"].sum()), int(parts["s"].sum())


def _label_via_driver(edges, all_ids_ds, cfg: PipelineConfig):
    """CC fast path for a contracted star set that fits the driver: one
    exact union-find over the collected stars, then the (node → root) map
    — only non-singleton members, small by construction — broadcasts ONCE
    via ``ray.put`` and every universe batch left-joins it (vectorized
    polars hash join; missing → self-label), streaming over ``all_ids_ds``
    of any size."""
    import ray

    tbl = pa.concat_tables(
        [pa.table({"u": t["u"], "v": t["v"]}) for t in edges.iter_batches(batch_format="pyarrow")]
        or [pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})]
    )
    star = _contract(tbl)  # global union-find over all collected stars
    labels = ray.put(
        pa.table({"conv_id": star["u"].cast(pa.string()), "cluster_id": star["v"].cast(pa.string())})
    )

    def _join(batch: pa.Table, labels_ref=labels) -> pa.Table:
        lab = pl.from_arrow(ray.get(labels_ref))
        ids = pl.from_arrow(batch.select(["conv_id"]))
        out = (
            ids.join(lab, on="conv_id", how="left")
            .with_columns(pl.col("cluster_id").fill_null(pl.col("conv_id")))
            .sort("conv_id")
        )
        return out.to_arrow()

    clusters = all_ids_ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)
    return clusters


def connected_components(edges_ds, all_ids_ds, cfg: PipelineConfig):
    """Edge list (conv_id_a, conv_id_b) + universe of conv_ids →
    (conv_id, cluster_id) with every conv_id exactly once.

    Each round is a hash-partitioned groupby + local union-find — never a
    driver-side closure; the edge list shrinks to ≤ one star edge per
    non-root node after the first pass.
    """
    edges = (
        edges_ds.map_batches(
            lambda t: pa.table({"u": t["conv_id_a"], "v": t["conv_id_b"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .map_batches(_contract, batch_format="pyarrow")  # local pre-contraction
        .materialize()
    )

    # Driver fast path: the pre-contraction leaves ≤ one star edge per
    # non-root node, so a match graph whose contracted stars fit the driver
    # (cc_driver_max_edges) finishes with ONE exact union-find here plus a
    # broadcast label join over the universe — same labels as the iterated
    # rounds (contraction preserves connectivity; root = min conv_id), but
    # ~3 fewer all-to-all exchanges and no per-round checksum scans.  At
    # 10^12-record scale the star set can exceed the bound, and the
    # distributed fixpoint below takes over unchanged.
    n_star = edges.count()
    if n_star <= cfg.cc_driver_max_edges:
        return _label_via_driver(edges, all_ids_ds, cfg), 0

    prev = None
    rounds = 0
    converged = False
    for rounds in range(1, cfg.max_unionfind_rounds + 1):
        n_edges = edges.count()
        if n_edges == 0:
            converged = True
            break
        # ≥ ~100k edges per partition-task; small graphs run in few tasks
        num_parts = int(min(cfg.pair_partitions, max(1, n_edges // 100_000 + 1)))
        sym = edges.map_batches(_symmetrize, batch_format="pyarrow", zero_copy_batch=True)
        sym = sym.map_batches(
            _add_upart,
            batch_format="pyarrow",
            fn_kwargs={"num_parts": num_parts},
        )
        edges = partitioned_map(sym, ["upart"], num_parts, _contract).materialize()
        cur = _edge_checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur

    if not converged:
        # a truncated clustering must NEVER be silently checkpointed as
        # complete (the round cap is a physical knob excluded from the
        # config hash, so two caps share checkpoints — only valid if both
        # actually reached the fixpoint)
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"{cfg.max_unionfind_rounds} rounds ({prev[0] if prev else '?'} "
            "star edges still changing); raise PipelineConfig."
            "max_unionfind_rounds — the round count needed grows with "
            "O(log diameter) of the contracted match graph"
        )

    # labels: after convergence every edge is (node, root).  Include
    # self-edges for the whole universe so singletons label themselves.
    self_edges = all_ids_ds.map_batches(
        lambda t: pa.table({"u": t["conv_id"], "v": t["conv_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sym = edges.map_batches(_symmetrize, batch_format="pyarrow", zero_copy_batch=True)
    union = sym.union(self_edges).map_batches(
        _add_upart,
        batch_format="pyarrow",
        fn_kwargs={"num_parts": cfg.pair_partitions},
    )

    def _label(tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl.drop_columns(["upart"]))
        lab = (
            df.group_by("u")
            .agg(pl.col("v").min().alias("cluster_id"))
            .rename({"u": "conv_id"})
            .sort("conv_id")
        )
        return lab.to_arrow()

    clusters = partitioned_map(union, ["upart"], cfg.pair_partitions, _label)
    return clusters, rounds
