"""record_linkage_ldu_ray — a Ray-Data-native record-linkage / dedup engine.

Rebuilt from scratch with the capabilities of the reference
``Tommer-R/Record-linkage-LDU`` (single-machine pandas scripts), re-expressed
as streaming ``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches``
for per-record transforms, actor pools for stateful scoring, explicit
groupby shuffles for blocking / pair-dedup / clustering, Parquet
checkpoints with per-stage manifests for idempotent resume.

Primary workload: dedup of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` — see ``pipelines.dedup``.
"""

from record_linkage_ldu_ray.config import (
    BlockingConfig,
    MinHashConfig,
    NormalizerConfig,
    PipelineConfig,
    RuleConfig,
    ScoringConfig,
)
# NOTE: the engine's execution profile (hash-shuffle exchanges, see
# runtime.py::configure_exchange) is applied by each pipeline entry point
# and by ``partitioned_map`` — NOT at import time, so merely importing this
# library never mutates the process-global Ray Data context of an embedding
# application.  Datasets the caller built beforehand are fixed up per-
# dataset inside ``partitioned_map``.

__all__ = [
    "BlockingConfig",
    "MinHashConfig",
    "NormalizerConfig",
    "PipelineConfig",
    "RuleConfig",
    "ScoringConfig",
]
