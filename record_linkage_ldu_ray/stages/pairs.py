"""S4 — within-block pair enumeration + cross-block pair dedup
(shuffles #2 and #3; SURVEY J1/J2 replacement + D7).

The reference's ``recordlinkage`` full index yields every pair exactly once
(compare_ldu_hw.py:160-162); with multi-key LSH blocking the same pair
arises in several blocks, so a dedup on the canonical pair key
(conv_id_a < conv_id_b, compare_ldu_ldu.py self-pair exclusion semantics)
is required before scoring (D7 — avoids double-scoring and double edges).

Physical plan: block rows are hash-bucketed by block_key into
``cfg.pair_partitions`` parts; inside each part ONE vectorized polars
self-join on block_key (filtered to conv_id_a < conv_id_b) enumerates all
within-block pairs, carrying both sides' features into wide pair rows.
A second hash-bucketed pass dedups on the pair hash.  No per-block Python
call, no driver-side loop.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.functions.hashing import pair_hash

_SIDE_COLS = [
    "conv_id",
    "n_turns",
    "n_tokens",
    "text_prefix",
    "role_seq",
    "tool_seq",
    "ts_min",
    "ts_max",
    "tok_hashes",
    "minhash",
]


def _add_block_part(batch: pa.Table, num_parts: int) -> pa.Table:
    bk = batch["block_key"].to_numpy(zero_copy_only=False).view(np.uint64)
    part = (bk % np.uint64(num_parts)).astype(np.int32)
    return batch.append_column("bpart", pa.array(part, pa.int32()))


def _enumerate_part(tbl: pa.Table) -> pa.Table:
    df = pl.from_arrow(tbl.drop_columns(["bpart"]))
    df = df.select(["block_key"] + _SIDE_COLS)
    left = df.rename({c: f"{c}_a" for c in _SIDE_COLS})
    right = df.rename({c: f"{c}_b" for c in _SIDE_COLS})
    pairs = (
        left.join(right, on="block_key")
        .filter(pl.col("conv_id_a") < pl.col("conv_id_b"))
        .drop("block_key")
        # same pair via two keys in this part: drop here already (cheap)
        .unique(subset=["conv_id_a", "conv_id_b"], keep="any")
    )
    out = pairs.to_arrow()
    if len(out) == 0:
        ph = np.empty(0, np.uint64)
    else:
        ph = pair_hash(out["conv_id_a"], out["conv_id_b"])
    return out.append_column("pair_hash", pa.array(ph, pa.uint64()))


def _add_pair_part(batch: pa.Table, num_parts: int) -> pa.Table:
    ph = batch["pair_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    part = (ph % np.uint64(num_parts)).astype(np.int32)
    return batch.append_column("ppart", pa.array(part, pa.int32()))


def _dedup_part(tbl: pa.Table) -> pa.Table:
    df = pl.from_arrow(tbl.drop_columns(["ppart"]))
    return df.unique(subset=["pair_hash"], keep="any").to_arrow()


def generate_pairs(block_rows_ds, cfg: PipelineConfig):
    """Block rows → deduplicated candidate pair rows (features of both
    sides inline, canonical conv_id_a < conv_id_b)."""
    ds = block_rows_ds.map_batches(
        _add_block_part,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"num_parts": cfg.pair_partitions},
    )
    pairs = ds.groupby("bpart").map_groups(_enumerate_part, batch_format="pyarrow")
    pairs = pairs.map_batches(
        _add_pair_part,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"num_parts": cfg.pair_partitions},
    )
    return pairs.groupby("ppart").map_groups(_dedup_part, batch_format="pyarrow")
