"""End-to-end pipeline gates (SURVEY §5): golden clusters, F1 ≥ 0.99,
invariants (D4 uniqueness, per-turn text preservation), order invariance."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.pipelines.dedup import dedup_transcripts
from record_linkage_ldu_ray.pipelines.evaluate import clusters_equal, pairwise_metrics


@pytest.fixture(scope="session")
def dedup_run(ray_session, xs_fixture_dir, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("dedup_ckpt"))
    res = dedup_transcripts(
        f"{xs_fixture_dir}/transcripts.parquet", PipelineConfig(), workdir=workdir
    )
    return res, workdir, xs_fixture_dir


class TestEndToEnd:
    def test_pairwise_f1_gate(self, dedup_run):
        res, _, fdir = dedup_run
        m = pairwise_metrics(res.matches, f"{fdir}/labeled_pairs.parquet")
        assert m["f1"] >= 0.99, m
        assert m["n_labeled"] > 100

    def test_clusters_match_expected(self, dedup_run):
        res, _, fdir = dedup_run
        same, diff = clusters_equal(res.clusters, f"{fdir}/expected_clusters.parquet")
        assert same, diff

    def test_cluster_membership_unique(self, dedup_run):
        # D4 validate_groups analog (main_ldu_hw.py:64-94): every conv_id in
        # exactly one cluster
        res, _, _ = dedup_run
        df = res.clusters.to_pandas()
        assert df["conv_id"].is_unique
        assert df["cluster_id"].notna().all()

    def test_hot_block_salted(self, dedup_run):
        res, _, _ = dedup_run
        # the fixture plants a 300-conv hot anchor block (> max_block_records,
        # < drop_block_records); pass A must detect and salt it
        assert len(res.metrics["hot_blocks"]) >= 1
        assert all(v >= 1 for v in res.metrics["hot_blocks"].values())

    def test_mask_counters_present(self, dedup_run):
        res, _, _ = dedup_run
        mc = res.metrics["mask_counts"]
        assert mc["matches"] > 0
        assert mc["matches"] <= mc["m1"] + mc["m2"] + mc["m3"] + mc["m4"]

    def test_manifests_record_lineage_and_counters(self, dedup_run):
        import json
        import os

        res, workdir, _ = dedup_run
        for stage in ["features", "scores", "matches", "clusters"]:
            p = os.path.join(workdir, stage, "_manifest.json")
            assert os.path.exists(p), stage
            m = json.load(open(p))
            assert m["complete"] and m["counters"]["rows"] > 0
            assert m["config_hash"] == res.metrics["config_hash"]


class TestInvariants:
    def test_per_turn_text_preserved(self, ray_session, xs_fixture_dir):
        # per-row invariant (input_hint): per-turn text byte-equality under
        # stable (conv_id, turn_idx) ordering through the normalize stage
        import ray.data

        from record_linkage_ldu_ray.stages.normalize import normalize_transcripts

        src = pq.read_table(f"{xs_fixture_dir}/transcripts.parquet")
        ds = ray.data.read_parquet(f"{xs_fixture_dir}/transcripts.parquet")
        out = normalize_transcripts(ds, PipelineConfig()).to_pandas()
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        exp = src.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert (out["text"] == exp["text"]).all()
        assert out["tool"].isna().equals(exp["tool"].isna())
        assert (out["ts"] == exp["ts"]).all()

    def test_input_order_and_partition_invariance(self, ray_session, xs_fixture_dir):
        # property test (SURVEY §5): cluster assignment invariant to input
        # row order and block count
        import ray.data

        ds = (
            ray.data.read_parquet(f"{xs_fixture_dir}/transcripts.parquet")
            .random_shuffle(seed=123)
            .repartition(7)
        )
        res = dedup_transcripts(ds, PipelineConfig(), workdir=None)
        same, diff = clusters_equal(res.clusters, f"{xs_fixture_dir}/expected_clusters.parquet")
        assert same, diff

    def test_cc_distributed_path_matches_driver_path(self, ray_session, xs_fixture_dir):
        # the driver union-find fast path (cc_driver_max_edges) and the
        # iterated distributed fixpoint must label identically; forcing the
        # threshold to 0 exercises the distributed rounds on the same input
        import dataclasses

        cfg = dataclasses.replace(PipelineConfig(), cc_driver_max_edges=0)
        res = dedup_transcripts(
            f"{xs_fixture_dir}/transcripts.parquet", cfg, workdir=None
        )
        same, diff = clusters_equal(res.clusters, f"{xs_fixture_dir}/expected_clusters.parquet")
        assert same, diff
        assert res.metrics["unionfind_rounds"] >= 1

    def test_empty_and_null_text_conversations(self, ray_session, tmp_path):
        # convs whose text is all null/empty must survive as singletons
        import pyarrow as pa
        import ray.data

        t = pa.table(
            {
                "conv_id": ["c-empty", "c-empty", "c-null", "c-ok", "c-ok"],
                "turn_idx": pa.array([0, 1, 0, 0, 1], pa.int32()),
                "role": ["user", "assistant", "user", "user", "assistant"],
                "text": ["", "!!!", None, "hello world", "more words"],
                "tool": pa.array([None, None, None, None, "search"], pa.string()),
                "ts": pa.array([np.datetime64("2024-01-01", "us")] * 5, pa.timestamp("us")),
            }
        )
        res = dedup_transcripts(ray.data.from_arrow(t), PipelineConfig(), workdir=None)
        df = res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
        assert sorted(df["conv_id"]) == ["c-empty", "c-null", "c-ok"]
        assert (df["conv_id"] == df["cluster_id"]).all()


class TestPairUniqueness:
    def test_each_pair_emitted_exactly_once(self, dedup_run):
        """Lowest-colliding-band + salt-diagonal dedup: the candidate pair
        set must contain every pair at most once even with hot-block
        salting active (the fixture plants a hot anchor)."""
        res, _, _ = dedup_run
        df = res.scores.to_pandas()[["conv_id_a", "conv_id_b"]]
        assert not df.duplicated().any()
        assert (df["conv_id_a"] < df["conv_id_b"]).all()


class TestOversizedBlockDrop:
    def test_non_discriminative_block_dropped(self, ray_session, xs_fixture_dir, tmp_path):
        """A block over drop_block_records is dropped entirely (salting
        cannot fix O(n²) pair cost of a non-discriminative key); recall
        falls back to the LSH bands, so true duplicates still cluster."""
        import dataclasses

        from record_linkage_ldu_ray.config import BlockingConfig, PipelineConfig
        from record_linkage_ldu_ray.pipelines.evaluate import pairwise_metrics

        cfg = PipelineConfig(blocking=BlockingConfig(drop_block_records=290))
        res = dedup_transcripts(f"{xs_fixture_dir}/transcripts.parquet", cfg)
        res.clusters.count()  # execute
        assert len(res.metrics["dropped_blocks"]) >= 1
        # the hot anchor block (300+ records) was dropped, but LSH-band
        # recall keeps the labeled-pair F1 at the gate
        m = pairwise_metrics(res.matches, f"{xs_fixture_dir}/labeled_pairs.parquet")
        assert m["f1"] >= 0.99, m
