"""S1 — ingest + normalize (stateless zero-copy Arrow map_batches).

Reference semantics: the 34 per-column ``Series.apply`` normalizer passes of
``pre_processing.py:176-213`` (lower → strip punctuation → tokenize →
stopword-filter → sort → join, pre_processing.py:48-55), here as one
vectorized batch transform.  The raw ``text`` column is carried through
unchanged — the reference keeps raw copies beside processed ones
(pre_processing.py:172-173) and the per-row invariant requires per-turn
text byte-equality under stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import pyarrow as pa

from record_linkage_ldu_ray.config import NormalizerConfig, PipelineConfig
from record_linkage_ldu_ray.functions.text import normalize_tokens


def _normalize_batch(batch: pa.Table, cfg: NormalizerConfig) -> pa.Table:
    # tokens kept UNSORTED here; the conversation-level feature stage sorts
    # the union of all turns' tokens (the M9 sort made order-insensitive
    # comparison; at conv level the global sort also absorbs turn reordering)
    toks = normalize_tokens(batch["text"], cfg).to_arrow()
    if pa.types.is_large_list(toks.type):
        toks = toks.cast(pa.list_(pa.string()))
    return batch.append_column("toks", toks)


def normalize_transcripts(ds, cfg: PipelineConfig):
    """Append a ``toks: list<string>`` column of normalized turn tokens.

    All original columns (conv_id, turn_idx, role, text, tool, ts) pass
    through untouched; nulls stay null (README.md:169 missing semantics).
    """
    ncfg = cfg.normalizer
    return ds.map_batches(
        _normalize_batch,
        batch_format="pyarrow",
        batch_size=cfg.normalize_batch_size,
        zero_copy_batch=True,
        fn_kwargs={"cfg": ncfg},
    )
