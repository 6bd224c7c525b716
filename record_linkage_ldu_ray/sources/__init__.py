"""Sources / sinks (SURVEY §2.1)."""

from record_linkage_ldu_ray.sources.readers import (
    read_table,
    read_transcripts_csv,
    read_transcripts_parquet,
)

__all__ = ["read_table", "read_transcripts_csv", "read_transcripts_parquet"]
