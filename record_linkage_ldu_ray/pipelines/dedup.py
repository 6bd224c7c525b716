"""Flagship pipeline: transcript dedup end-to-end (SURVEY §3 S1-S8).

    S1 normalize      map_batches (stateless, zero-copy Arrow)
    S2 features       hash-part groupby(conv_id-part) → vectorized agg   [shuffle 1]
    S3 blocking       two-pass key emission, LSH bands + prefix, salting
    S4+S5 pairs+score one exchange: block-part self-join, lowest-band
                      pair dedup, scoring fused in a stateful actor pool
                      (wide pair rows never leave the task)   [shuffle 2]
    S6 decide         weighted-threshold rule + 4 masks → edges
    S7 cluster        union-find star-contraction rounds                 [shuffle 4×log]
    S8 emit           (conv_id, cluster_id), sorted

With ``workdir`` set, every stage checkpoints to Parquet with a manifest
(config hash, lineage, counters) and reruns resume idempotently — the
hardened version of the reference's pickle-per-stage DAG
(pre_processing.py:271-275 → compare_ldu_hw.py:8-9 → main_ldu_hw.py:10-14).
With ``workdir=None`` the whole DAG streams under Ray Data's executor with
no intermediate materialization (bench mode).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import ray.data

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.stages.blocking import emit_block_rows, hot_key_table
from record_linkage_ldu_ray.stages.cluster import connected_components
from record_linkage_ldu_ray.stages.decide import decide_matches, mask_counters
from record_linkage_ldu_ray.stages.features import extract_features
from record_linkage_ldu_ray.stages.normalize import normalize_transcripts
from record_linkage_ldu_ray.stages.pairs import enumerate_and_score


@dataclass
class DedupResult:
    clusters: "ray.data.Dataset"
    matches: "ray.data.Dataset"
    scores: "ray.data.Dataset"
    metrics: dict = field(default_factory=dict)


def _maybe_checkpoint(name, ds_builder, workdir, cfg_hash, lineage, extra=None):
    if workdir is None:
        return ds_builder(), None
    from record_linkage_ldu_ray.state.manifest import checkpoint_stage

    ds, manifest = checkpoint_stage(
        name, workdir, cfg_hash, lineage, ds_builder, extra_counters=extra
    )
    return ds, manifest


def load_transcripts(path_or_ds, columns=None):
    if isinstance(path_or_ds, str):
        return ray.data.read_parquet(path_or_ds, columns=columns, file_extensions=["parquet"])
    return path_or_ds


def dedup_transcripts(
    transcripts,
    cfg: PipelineConfig | None = None,
    workdir: str | None = None,
) -> DedupResult:
    """Run the full dedup DAG; returns clusters/matches/scores datasets and
    stage metrics.

    ``transcripts``: parquet path or Dataset with the input_hint schema
    (conv_id, turn_idx, role, text, tool, ts).
    """
    from record_linkage_ldu_ray.runtime import configure_exchange

    configure_exchange()
    cfg = cfg or PipelineConfig()
    ch = cfg.config_hash()
    metrics: dict = {"config_hash": ch}
    if workdir is not None:
        os.makedirs(workdir, exist_ok=True)

    src = [transcripts] if isinstance(transcripts, str) else ["<dataset>"]
    # the dedup DAG only needs these input columns (prune at the read)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ds = load_transcripts(transcripts, columns=cols)

    features, man = _maybe_checkpoint(
        "features",
        lambda: extract_features(normalize_transcripts(ds, cfg), cfg),
        workdir,
        ch,
        src,
    )
    if man:
        metrics["features"] = man["counters"]
    elif workdir is None:
        # streaming mode: features feed two consumers (hot-key count + block
        # emission); pin the (much smaller than input) feature table in the
        # object store instead of recomputing its lineage twice.  The pinned
        # bytes are surfaced as a counter so a 100× run can see what it is
        # asking the object store to hold (checkpoint mode avoids pinning).
        features = features.materialize()
        metrics["features_pinned_bytes"] = features.size_bytes()

    # S3 pass A is a driver-visible aggregate by design (hot keys are few)
    hot, dropped = hot_key_table(features, cfg)
    metrics["hot_blocks"] = {str(k): v for k, v in sorted(hot.items())}
    metrics["dropped_blocks"] = {str(k): v for k, v in sorted(dropped.items())}

    # S4+S5 fused: pair enumeration + scoring in ONE exchange (stateful
    # actor pool; wide pair rows never leave the task — see
    # stages/pairs.py EnumerateScorer)
    scores, man = _maybe_checkpoint(
        "scores",
        lambda: enumerate_and_score(
            emit_block_rows(features, cfg, hot, dropped), cfg, dropped
        ),
        workdir,
        ch,
        src + ["features"],
    )
    if man:
        metrics["scores"] = man["counters"]
    elif workdir is None:
        # streaming mode: scores feed matches/clusters AND are returned to
        # the caller — pin the narrow score rows (ids + float32 features)
        # once instead of re-running enumeration+scoring per consumer.  At
        # full 10^12-turn scale use workdir checkpointing instead (scores
        # stream back from Parquet).
        scores = scores.materialize()
        metrics["scores_pinned_bytes"] = scores.size_bytes()

    matches, man = _maybe_checkpoint(
        "matches",
        lambda: decide_matches(scores, cfg),
        workdir,
        ch,
        src + ["scores"],
    )
    if man:
        metrics["matches"] = man["counters"]
        # checkpointed: matches stream back from Parquet, counting is cheap
        metrics["mask_counts"] = mask_counters(matches)

    def _build_clusters():
        all_ids = features.select_columns(["conv_id"])
        c, rounds = connected_components(matches, all_ids, cfg)
        metrics["unionfind_rounds"] = rounds
        return c

    clusters, man = _maybe_checkpoint(
        "clusters", _build_clusters, workdir, ch, src + ["matches"]
    )
    if man:
        metrics["clusters"] = man["counters"]

    from record_linkage_ldu_ray.runtime import publish_metrics

    publish_metrics("dedup_transcripts", metrics)
    return DedupResult(clusters=clusters, matches=matches, scores=scores, metrics=metrics)
