"""Golden-record consolidation (survivorship) — the entity-resolution step
AFTER clustering: collapse each duplicate cluster to ONE canonical record,
field by field, under explicit per-field survivorship rules.

Reference parity: the reference's ``property_merge``/grouping scripts pick a
representative row per matched group and present merged sheets
(main_ldu_hw.py group handling, README "merge" step); this generalizes that
to declarative per-field rules — the standard MDM survivorship shapes:

- ``mode``  — most frequent value, ties to the smallest (deterministic);
- ``min`` / ``max`` / ``sum`` — order/arithmetic folds.

Scale shape: two slim hash exchanges, no driver state —

1. the (id → cluster) assignment joins the record fields with ONE exchange
   keyed by ``id_col`` (same align-union-partition join as
   ``relational.asof_join``);
2. the joined rows re-key by ``cluster_col`` and each partition folds its
   clusters vectorized in polars (counts for ``mode`` are complete because
   a cluster never spans partitions).

Payloads stay narrow (ids + the consolidated fields only).  For very wide
``sum``/``min``/``max``-only specs a per-batch combiner before exchange 2
would shrink further; ``mode`` needs the raw (cluster, value) stream, which
dominates here and is already the minimal information.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings
from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map


def consolidate_clusters(
    records: "ray.data.Dataset",
    assign: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    cluster_col: str = "rep_id",
    mode_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    sum_cols: tuple[str, ...] = (),
    num_parts: int | None = None,
):
    """One golden record per cluster.

    ``records``: the entity rows (must contain ``id_col`` + every field
    named in a rule).  ``assign``: the clustering output mapping ``id_col``
    → ``cluster_col`` (e.g. ``fuzzy_dedup_documents``' (doc_id, rep_id)).
    Records without an assignment row are dropped (inner join) — a cluster
    assignment that covers the corpus maps every id.

    Output: (``cluster_col``, n_members:int64, canonical_id:int64 — the min
    member id, ``<c>_mode`` per mode col, ``<c>_min``/``<c>_max``/
    ``<c>_sum`` per fold col), one row per cluster.
    """
    n_parts = num_parts if num_parts is not None else default_num_parts()
    field_cols = list(dict.fromkeys([*mode_cols, *min_cols, *max_cols, *sum_cols]))
    r_schema = records.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))

    def _part_of(arr: pa.Array) -> pa.Array:
        h = fnv1a_hash_strings(arr.cast(pa.string()))
        return pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())

    def _align_records(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t[id_col].combine_chunks()
        cols: dict[str, pa.Array] = {
            "side": pa.array(np.zeros(n, np.int8)),
            id_col: ids,
            cluster_col: pa.nulls(n, pa.int64()),
        }
        for c in field_cols:
            cols[c] = t[c].combine_chunks()
        out = pa.table(cols)
        return out.append_column("part", _part_of(ids))

    def _align_assign(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t[id_col].combine_chunks()
        cols = {
            "side": pa.array(np.ones(n, np.int8)),
            id_col: ids,
            cluster_col: t[cluster_col].combine_chunks().cast(pa.int64()),
        }
        for c in field_cols:
            cols[c] = pa.nulls(n, r_types[c])
        out = pa.table(cols)
        return out.append_column("part", _part_of(ids))

    both = records.select_columns(
        list(dict.fromkeys([id_col] + field_cols))
    ).map_batches(_align_records, batch_format="pyarrow", zero_copy_batch=True).union(
        assign.select_columns([id_col, cluster_col]).map_batches(
            _align_assign, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def _join(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        rec = df.filter(pl.col("side") == 0).select([id_col, *field_cols])
        asg = df.filter(pl.col("side") == 1).select([id_col, cluster_col])
        out = rec.join(asg, on=id_col, how="inner")
        # re-key by cluster for the consolidation exchange, inside the same
        # task (no extra pass over the data)
        part2 = (
            fnv1a_hash_strings(
                out[cluster_col].cast(pl.Utf8).to_arrow().cast(pa.string())
            )
            % np.uint64(n_parts)
        ).astype(np.int32)
        return out.with_columns(pl.Series("part2", part2, pl.Int32)).to_arrow()

    joined = partitioned_map(both, ["part"], n_parts, _join)

    def _consolidate(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part2"]))
        base = df.group_by(cluster_col).agg(
            pl.len().cast(pl.Int64).alias("n_members"),
            pl.col(id_col).min().cast(pl.Int64).alias("canonical_id"),
            *[pl.col(c).min().alias(f"{c}_min") for c in min_cols],
            *[pl.col(c).max().alias(f"{c}_max") for c in max_cols],
            *[pl.col(c).sum().cast(pl.Int64).alias(f"{c}_sum") for c in sum_cols],
        )
        for c in mode_cols:
            # deterministic mode: highest count, ties to the smallest value
            m = (
                df.group_by([cluster_col, c])
                .agg(pl.len().alias("_n"))
                .sort([cluster_col, "_n", c], descending=[False, True, False])
                .group_by(cluster_col, maintain_order=True)
                .agg(pl.col(c).first().alias(f"{c}_mode"))
            )
            base = base.join(m, on=cluster_col, how="left")
        return base.sort(cluster_col).to_arrow()

    return partitioned_map(joined, ["part2"], n_parts, _consolidate)
