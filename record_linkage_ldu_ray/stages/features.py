"""S2 — per-conversation feature extraction (shuffle #1, key = conv_id).

The reference normalizes per-record fields; the transcript graft aggregates
turns into one feature record per conversation (SURVEY A1): globally
sorted-unique token set (M9's token sort at conversation level — absorbs
within-turn shuffles AND whole-turn reordering), role/tool sequences in
turn_idx order, ts_min/ts_max, n_turns, MinHash signature of the token set.

Physical plan: rather than ``groupby('conv_id').map_groups`` (one Python
call per conversation — millions of tiny groups at scale), we hash-bucket
conversations into ``cfg.feature_partitions`` parts and run ONE vectorized
polars/numpy aggregation per part (``groupby('part').map_groups``).  Turns
of a conversation co-locate because the part key is a pure function of
conv_id; everything inside the part function is columnar.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings
from record_linkage_ldu_ray.functions.minhash import minhash_segments, perm_params

FEATURE_COLUMNS = [
    "conv_id",
    "n_turns",
    "n_tokens",
    "text_prefix",
    "first_token",
    "role_seq",
    "tool_seq",
    "ts_min",
    "ts_max",
    "tok_hashes",
    "minhash",
]


def _add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    part = (fnv1a_hash_strings(batch["conv_id"]) % np.uint64(num_parts)).astype(np.int32)
    return batch.append_column("part", pa.array(part, pa.int32()))


class FeatureExtractor:
    """Vectorized per-part feature aggregation (runs as stateless-ish tasks
    via map_groups; permutation params are tiny and rebuilt per task)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.params = perm_params(cfg.minhash)
        # text_prefix exists ONLY for the JW kernel (capped at
        # jw_text_max_chars) — storing more would just fatten every block
        # row through the pair exchange
        self.prefix_chars = cfg.scoring.jw_text_max_chars

    def __call__(self, tbl: pa.Table) -> pa.Table:
        df = pl.from_arrow(tbl.drop_columns(["part"]))
        df = df.sort(["conv_id", "turn_idx"])
        scal = df.group_by("conv_id", maintain_order=True).agg(
            pl.len().cast(pl.Int32).alias("n_turns"),
            pl.col("role").str.slice(0, 1).str.join("").alias("role_seq"),
            pl.col("tool").drop_nulls().str.join(",").alias("tool_seq"),
            pl.col("ts").min().alias("ts_min"),
            pl.col("ts").max().alias("ts_max"),
        )
        toks = (
            df.select("conv_id", "toks")
            .explode("toks")
            .drop_nulls("toks")
            .unique(["conv_id", "toks"])
            .sort(["conv_id", "toks"])
            .group_by("conv_id", maintain_order=True)
            .agg(
                pl.col("toks").alias("tokens"),
                pl.col("toks").first().alias("first_token"),
                pl.col("toks").str.join(" ").str.slice(0, self.prefix_chars).alias("text_prefix"),
                pl.len().cast(pl.Int32).alias("n_tokens"),
            )
        )
        out = (
            scal.join(toks, on="conv_id", how="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("text_prefix").fill_null(""),
                pl.col("first_token").fill_null(""),
            )
            .sort("conv_id")
        )

        # token hashes + MinHash, vectorized over the whole part
        tokens_arr = out["tokens"].to_arrow()
        if not pa.types.is_large_list(tokens_arr.type):
            # normalize to int64 offsets — a 32-bit cast here is the
            # overflow point at 10^12-turn scale
            tokens_arr = tokens_arr.cast(pa.large_list(pa.string()))
        # null token lists (conv with no tokens at all) → empty lists
        tokens_arr = tokens_arr.fill_null([])
        flat = tokens_arr.flatten()
        offsets = tokens_arr.offsets.to_numpy().astype(np.int64)
        h = fnv1a_hash_strings(flat) if len(flat) else np.empty(0, np.uint64)
        # sort hashes within each conversation segment (token strings were
        # sorted, hashes are not) → scorer's jaccard needs sorted-unique
        parents = np.repeat(
            np.arange(len(tokens_arr), dtype=np.int64), offsets[1:] - offsets[:-1]
        )
        order = np.lexsort((h, parents))
        h_sorted = h[order]
        # int64 offsets (LargeList): a feature partition holding > 2^31
        # total token hashes — plausible at 10^12-turn scale with 64
        # partitions — would overflow 32-bit list offsets
        tok_hashes = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(h_sorted, pa.uint64())
        )

        sig = minhash_segments(h_sorted, offsets, self.params)
        k = self.cfg.minhash.num_perm
        minhash = pa.FixedSizeListArray.from_arrays(pa.array(sig.reshape(-1), pa.uint64()), k)

        res = out.drop("tokens").to_arrow()
        res = res.append_column("tok_hashes", tok_hashes)
        res = res.append_column("minhash", minhash)
        # stable column order
        return res.select(FEATURE_COLUMNS)


def extract_features(ds, cfg: PipelineConfig):
    """Transcript turns → one feature row per conv_id (Arrow schema per
    SURVEY §1.2)."""
    ds = ds.map_batches(
        _add_part,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"num_parts": cfg.feature_partitions},
    )
    extractor = FeatureExtractor(cfg)

    def _extract(tbl: pa.Table) -> pa.Table:
        return extractor(tbl)

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(ds, ["part"], cfg.feature_partitions, _extract)
