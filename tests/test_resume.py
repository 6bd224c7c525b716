"""Checkpoint/resume semantics (north rule: idempotent per-stage resume
with lineage + counters)."""

import json
import os
import shutil

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.pipelines.dedup import dedup_transcripts
from record_linkage_ldu_ray.pipelines.evaluate import clusters_equal


def _manifests(workdir):
    out = {}
    for stage in os.listdir(workdir):
        p = os.path.join(workdir, stage, "_manifest.json")
        if os.path.exists(p):
            out[stage] = json.load(open(p))
    return out


def test_rerun_resumes_all_stages(ray_session, xs_fixture_dir, tmp_path):
    workdir = str(tmp_path / "ckpt")
    cfg = PipelineConfig()
    src = f"{xs_fixture_dir}/transcripts.parquet"

    dedup_transcripts(src, cfg, workdir=workdir)
    first = _manifests(workdir)
    assert all(not m["resumed"] for m in first.values())

    res2 = dedup_transcripts(src, cfg, workdir=workdir)
    second = _manifests(workdir)
    # same manifests on disk (nothing rewritten)
    for stage in first:
        assert second[stage]["written_at"] == first[stage]["written_at"], stage
    same, diff = clusters_equal(res2.clusters, f"{xs_fixture_dir}/expected_clusters.parquet")
    assert same, diff


def test_killed_stage_is_rebuilt_alone(ray_session, xs_fixture_dir, tmp_path):
    workdir = str(tmp_path / "ckpt2")
    cfg = PipelineConfig()
    src = f"{xs_fixture_dir}/transcripts.parquet"
    dedup_transcripts(src, cfg, workdir=workdir)
    first = _manifests(workdir)

    # simulate a crash that lost the scores checkpoint
    shutil.rmtree(os.path.join(workdir, "scores"))
    res = dedup_transcripts(src, cfg, workdir=workdir)
    second = _manifests(workdir)
    # earlier stages untouched, scores (and downstream) rebuilt
    assert second["features"]["written_at"] == first["features"]["written_at"]
    assert second["scores"]["written_at"] != first["scores"]["written_at"]
    same, diff = clusters_equal(res.clusters, f"{xs_fixture_dir}/expected_clusters.parquet")
    assert same, diff


def test_config_change_invalidates(ray_session, xs_fixture_dir, tmp_path):
    from dataclasses import replace

    workdir = str(tmp_path / "ckpt3")
    src = f"{xs_fixture_dir}/transcripts.parquet"
    cfg = PipelineConfig()
    dedup_transcripts(src, cfg, workdir=workdir)
    first = _manifests(workdir)

    # a PHYSICAL knob (partition count) must NOT invalidate checkpoints:
    # results are parallelism-independent, so the N-node run resumes on 4N
    cfg_phys = replace(cfg, feature_partitions=32)
    dedup_transcripts(src, cfg_phys, workdir=workdir)
    mid = _manifests(workdir)
    assert mid["features"]["written_at"] == first["features"]["written_at"]

    # a SEMANTIC knob change invalidates
    from record_linkage_ldu_ray.config import ScoringConfig

    cfg2 = replace(cfg, scoring=ScoringConfig(ts_tau_seconds=3600.0))
    dedup_transcripts(src, cfg2, workdir=workdir)
    second = _manifests(workdir)
    assert second["features"]["config_hash"] != first["features"]["config_hash"]
    assert second["features"]["written_at"] != first["features"]["written_at"]


def test_lost_partition_file_forces_rebuild(ray_session, xs_fixture_dir, tmp_path):
    """A checkpoint dir that lost a partition file AFTER its manifest was
    written must rebuild (per-partition verification), not resume
    half-empty."""
    workdir = str(tmp_path / "ckpt4")
    cfg = PipelineConfig()
    src = f"{xs_fixture_dir}/transcripts.parquet"
    dedup_transcripts(src, cfg, workdir=workdir)
    first = _manifests(workdir)

    feat_dir = os.path.join(workdir, "features")
    victim = sorted(f for f in os.listdir(feat_dir) if f.endswith(".parquet"))[0]
    os.remove(os.path.join(feat_dir, victim))

    res = dedup_transcripts(src, cfg, workdir=workdir)
    second = _manifests(workdir)
    assert second["features"]["written_at"] != first["features"]["written_at"]
    same, diff = clusters_equal(res.clusters, f"{xs_fixture_dir}/expected_clusters.parquet")
    assert same, diff
