"""Source readers (SURVEY §2.1 S1/S2).

The reference ingests ';'-delimited CSV (pre_processing.py:114-115) and
re-loads pickled stage outputs (compare_ldu_hw.py:8-9).  The engine's
canonical payload is Parquet (columns pruned at the read — only requested
columns leave storage), with CSV kept as an ingest-edge capability for
fixture parity; stage re-loads are ``read_parquet`` of checkpoint dirs
(state/manifest.py).
"""

from __future__ import annotations

import ray.data

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts_parquet(path: str, columns: list[str] | None = None):
    """Parquet transcripts with column pruning (M2 at the read: a 2-column
    transform must not load 6 columns)."""
    return ray.data.read_parquet(
        path,
        columns=columns or TRANSCRIPT_COLUMNS,
        file_extensions=["parquet"],
    )


def read_transcripts_csv(path: str, delimiter: str = ";", columns: list[str] | None = None):
    """CSV ingest with the reference's delimiter semantics
    (pre_processing.py:114-115: ``pd.read_csv(..., delimiter=';')``).

    Types are parsed by Arrow's CSV reader; ``turn_idx`` is cast to int32
    and ``ts`` to timestamp[us] to match the canonical transcript schema.
    """
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
    )
    if columns:
        ds = ds.select_columns(columns)

    def _cast(t):
        import pyarrow as pa

        cols = {}
        for name in t.column_names:
            col = t[name]
            if name == "turn_idx":
                col = col.cast(pa.int32())
            elif name == "ts" and not pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us"))
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def read_transcripts_jsonl(path: str, columns: list[str] | None = None):
    """JSONL ingest (the interchange format of LLM training corpora).

    Arrow's JSON reader infers types per block; the cast step pins the
    canonical transcript schema (int32 turn_idx, timestamp[us] ts) so
    downstream stages see identical batches whatever the source format.
    """
    ds = ray.data.read_json(path, file_extensions=["jsonl", "json"])
    if columns:
        ds = ds.select_columns(columns)

    def _cast(t):
        import pyarrow as pa

        cols = {}
        for name in t.column_names:
            col = t[name]
            if name == "turn_idx":
                col = col.cast(pa.int32())
            elif name == "ts" and not pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us"))
            elif pa.types.is_large_string(col.type):
                col = col.cast(pa.string())
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def read_table(path: str, **kwargs):
    """Extension-dispatch reader (parquet | csv | jsonl)."""
    if path.endswith(".csv"):
        return read_transcripts_csv(path, **kwargs)
    if path.endswith((".jsonl", ".json")):
        return read_transcripts_jsonl(path, **kwargs)
    return read_transcripts_parquet(path, **kwargs)
