"""Within-conversation duplicate-turn dedup (SURVEY §2.2 M19 graft).

The reference nulls secondary fields equal to the primary inside one record
(``pre_processing.py:231-257``: address2 == address → address2 = NaN).  The
transcript analog: repeated identical turn text inside one conversation is
redundant for linkage — keep the FIRST occurrence (stable ``turn_idx``
order), drop the rest.

Physical plan: hash-partition by conv_id (turns of a conversation
co-locate), one vectorized polars window per partition.  Deterministic at
any parallelism.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings
from record_linkage_ldu_ray.runtime import partitioned_map


def dedup_turns(ds, num_partitions: int = 64, text_col: str = "text"):
    """Drop turns whose ``text`` already appeared at a lower ``turn_idx`` of
    the same conversation.  Output schema == input schema."""

    def _part(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["conv_id"])
        return t.append_column(
            "cpart", pa.array((h % np.uint64(num_partitions)).astype(np.int32), pa.int32())
        )

    def _dedup(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["cpart"]))
        out = (
            df.sort(["conv_id", "turn_idx"])
            .with_columns(
                pl.col("turn_idx")
                .rank("ordinal")
                .over(["conv_id", text_col])
                .alias("_rn")
            )
            .filter(pl.col("_rn") == 1)
            .drop("_rn")
        )
        return out.to_arrow()

    withpart = ds.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map(withpart, ["cpart"], num_partitions, _dedup)
