"""Cross-table (bipartite) linkage tests — the reference's PRIMARY pipeline
(LDU↔HW: cross index compare_ldu_hw.py:160-162, cross rule
main_ldu_hw.py:399-435, bipartite groups main_ldu_hw.py:24-61).

The labeled fixture corpus is split into two sides (base conversations +
first negatives = side A, perturbed duplicates + other negatives = side B);
cross-side labeled pairs give the pairwise F1 gate, and the bipartite
groups must equal the fixture's expected connected components.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from record_linkage_ldu_ray.fixtures import FixtureSpec, cached_fixture
from record_linkage_ldu_ray.pipelines.evaluate import pairwise_metrics
from record_linkage_ldu_ray.pipelines.linkage import link_datasets


def _side_of(conv_id: str) -> str:
    """Deterministic side split: family base ('-0') and first negatives
    ('-n0') are corpus A; duplicates and other negatives are corpus B."""
    suffix = conv_id.rsplit("-", 1)[1]
    return "a" if suffix in ("0", "n0") else "b"


@pytest.fixture(scope="module")
def link_run(ray_session, tmp_path_factory):
    d = cached_fixture(FixtureSpec(n_families=120))
    tmp = tmp_path_factory.mktemp("linkage")

    transcripts = pq.read_table(os.path.join(d, "transcripts.parquet"))
    sides = [_side_of(c) for c in transcripts["conv_id"].to_pylist()]
    mask_a = pa.array([s == "a" for s in sides])
    ds_a = ray.data.from_arrow(transcripts.filter(mask_a))
    ds_b = ray.data.from_arrow(
        transcripts.filter(pa.compute.invert(mask_a))
    )

    # cross-side labeled pairs (A endpoint always lexicographically first in
    # the fixture: '-0'/'-n0' sort before '-1..-3'/'-n1')
    labels = pq.read_table(os.path.join(d, "labeled_pairs.parquet"))
    keep = [
        _side_of(a) != _side_of(b)
        for a, b in zip(
            labels["conv_id_a"].to_pylist(), labels["conv_id_b"].to_pylist()
        )
    ]
    cross_labels = labels.filter(pa.array(keep))
    cross_path = str(tmp / "cross_labels.parquet")
    pq.write_table(cross_labels, cross_path)

    res = link_datasets(ds_a, ds_b)
    return res, cross_path, d


class TestBipartiteLinkage:
    def test_cross_pair_f1_gate(self, link_run):
        res, cross_path, _ = link_run
        m = pairwise_metrics(res.matches, cross_path)
        assert m["n_labeled"] > 50
        assert m["f1"] >= 0.99, m

    def test_matches_are_cross_side_only(self, link_run):
        res, _, _ = link_run
        df = res.matches.to_pandas()
        assert len(df) > 0
        assert all(_side_of(c) == "a" for c in df["conv_id_a"])
        assert all(_side_of(c) == "b" for c in df["conv_id_b"])

    def test_groups_match_expected_components(self, link_run):
        """Bipartite transitive grouping equals the fixture's expected
        clusters: B-side duplicates never pair with each other (cross-only)
        but stay connected through their A-side base — so the component
        structure is identical to the self-dedup ground truth."""
        res, _, d = link_run
        got = (
            res.groups.to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        exp = (
            pq.read_table(os.path.join(d, "expected_clusters.parquet"))
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        assert list(got["conv_id"]) == list(exp["conv_id"])
        assert list(got["cluster_id"]) == list(exp["cluster_id"])
        # side column matches the split rule
        assert all(_side_of(c) == s for c, s in zip(got["conv_id"], got["side"]))

    def test_each_record_in_exactly_one_group(self, link_run):
        """The reference's validate_groups invariant (main_ldu_hw.py:64-94)
        holds by construction here — every (side, conv_id) exactly once."""
        res, _, _ = link_run
        df = res.groups.to_pandas()
        assert df["conv_id"].is_unique

    def test_cross_mask_counters(self, link_run):
        from record_linkage_ldu_ray.pipelines.linkage import cross_mask_counters

        res, _, _ = link_run
        counters = cross_mask_counters(res.matches)
        assert counters["matches"] == res.matches.count()
        assert counters["matches"] > 0
        assert sum(counters[k] for k in ("x1", "x2", "x3", "x4")) >= counters["matches"]


class TestLinkIncrement:
    def test_delta_assignment(self, ray_session, tmp_path):
        """Incremental linkage: existing corpus = side A with its expected
        cluster labels; delta = side B.  Every B duplicate whose expected
        cluster contains an A record must inherit that cluster's label;
        B records in A-free clusters open fresh singletons."""
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.linkage import link_increment

        d = cached_fixture(FixtureSpec(n_families=120))
        transcripts = pq.read_table(os.path.join(d, "transcripts.parquet"))
        sides = [_side_of(c) for c in transcripts["conv_id"].to_pylist()]
        mask_a = pa.array([s == "a" for s in sides])
        ds_a = ray.data.from_arrow(transcripts.filter(mask_a))
        ds_b = ray.data.from_arrow(transcripts.filter(pa.compute.invert(mask_a)))

        exp = pq.read_table(os.path.join(d, "expected_clusters.parquet")).to_pandas()
        exp_map = dict(zip(exp["conv_id"], exp["cluster_id"]))
        a_convs = {c for c in exp_map if _side_of(c) == "a"}
        a_clusters = {exp_map[c] for c in a_convs}

        existing = ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": sorted(a_convs),
                    "cluster_id": [exp_map[c] for c in sorted(a_convs)],
                }
            )
        )
        out = (
            link_increment(ds_a, existing, ds_b)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        b_convs = sorted({c for c in exp_map if _side_of(c) == "b"})
        assert out["conv_id"].tolist() == b_convs  # one row per delta conv
        got = dict(zip(out["conv_id"], out["cluster_id"]))
        new = dict(zip(out["conv_id"], out["is_new_cluster"]))
        n_ok = 0
        for b in b_convs:
            want_cluster = exp_map[b]
            if want_cluster in a_clusters:  # family anchored in the corpus
                ok = got[b] == want_cluster and not new[b]
            else:  # delta-only record → fresh singleton
                ok = got[b] == b and new[b]
            n_ok += ok
        assert n_ok / len(b_convs) >= 0.99, (n_ok, len(b_convs))
        # invariants: new-cluster flag consistent with label provenance
        for b in b_convs:
            assert new[b] == (got[b] == b and got[b] not in a_clusters)
