"""Golden-record survivorship: deterministic mode ties, folds, membership,
and partition invariance."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray

from record_linkage_ldu_ray.pipelines.consolidate import consolidate_clusters


def _run(num_parts=None):
    records = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "lang": pa.array(["en", "de", "de", "en", "fr", "fr", "en"], pa.string()),
            "n_chars": pa.array([10, 20, 30, 40, 5, 6, 7], pa.int64()),
        }
    )
    # clusters: {1,2,3,4} -> 1 (lang tie en=2/de=2 -> 'de' smallest),
    # {5,6} -> 5, {7} -> 7
    assign = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "rep_id": pa.array([1, 1, 1, 1, 5, 5, 7], pa.int64()),
        }
    )
    return (
        consolidate_clusters(
            ray.data.from_arrow(records).repartition(3),
            ray.data.from_arrow(assign).repartition(2),
            id_col="doc_id",
            cluster_col="rep_id",
            mode_cols=("lang",),
            min_cols=("n_chars",),
            max_cols=("n_chars",),
            sum_cols=("n_chars",),
            num_parts=num_parts,
        )
        .to_pandas()
        .sort_values("rep_id")
        .reset_index(drop=True)
    )


class TestConsolidateClusters:
    def test_survivorship_rules(self, ray_session):
        out = _run()
        assert out.rep_id.tolist() == [1, 5, 7]
        assert out.n_members.tolist() == [4, 2, 1]
        assert out.canonical_id.tolist() == [1, 5, 7]
        # mode tie en==de==2 breaks to the lexicographically smallest
        assert out.lang_mode.tolist() == ["de", "fr", "en"]
        assert out.n_chars_min.tolist() == [10, 5, 7]
        assert out.n_chars_max.tolist() == [40, 6, 7]
        assert out.n_chars_sum.tolist() == [100, 11, 7]

    def test_partition_invariance(self, ray_session):
        pd.testing.assert_frame_equal(_run(num_parts=3), _run(num_parts=17))
