"""S4 presentation rendering — groups_to_df analog (main_ldu_hw.py:97-146)."""

import os

import pandas as pd
import pytest

import ray.data

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.fixtures import FixtureSpec, cached_fixture
from record_linkage_ldu_ray.pipelines.dedup import dedup_transcripts
from record_linkage_ldu_ray.pipelines.report import clusters_to_review_frame


@pytest.fixture(scope="module")
def review_frame(ray_session):
    d = cached_fixture(FixtureSpec(n_families=60))
    path = os.path.join(d, "transcripts.parquet")
    res = dedup_transcripts(path, PipelineConfig())
    ts = ray.data.read_parquet(path)
    return clusters_to_review_frame(res.clusters, ts, max_clusters=10)


class TestReviewFrame:
    def test_groups_separated_by_blank_rows(self, review_frame):
        df = review_frame
        assert len(df) > 0
        blanks = df["conv_id"] == ""
        assert blanks.sum() >= 1  # ≥2 groups → ≥1 separator
        # consecutive non-blank rows share a cluster_id; blanks split groups
        groups = []
        cur = []
        for _, row in df.iterrows():
            if row["conv_id"] == "":
                assert cur, "separator without a preceding group"
                groups.append(cur)
                cur = []
            else:
                cur.append(row)
        if cur:
            groups.append(cur)
        for g in groups:
            assert len(g) >= 2  # only non-singleton clusters rendered
            assert len({r["cluster_id"] for r in g}) == 1
            assert all(r["group_size"] == len(g) for r in g)

    def test_summary_columns_filled(self, review_frame):
        df = review_frame[review_frame["conv_id"] != ""]
        assert (df["n_turns"] > 0).all()
        assert df["text_preview"].str.len().gt(0).all()
        assert (df["source"] == "transcripts").all()
        assert pd.notnull(df["ts_min"]).all()
