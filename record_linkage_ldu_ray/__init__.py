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
from record_linkage_ldu_ray.runtime import configure_exchange

# The engine's execution profile: hash-shuffle exchanges (see runtime.py).
# Applied at import so every Dataset created by callers of this library —
# including ones built before the first pipeline call — carries the right
# shuffle strategy.  Does NOT touch ray.init (the driver owns the session).
configure_exchange()

__all__ = [
    "BlockingConfig",
    "MinHashConfig",
    "NormalizerConfig",
    "PipelineConfig",
    "RuleConfig",
    "ScoringConfig",
]
