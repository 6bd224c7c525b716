"""Fixture generator invariants (FIXTURES.md)."""

import numpy as np
import pyarrow.parquet as pq

from record_linkage_ldu_ray.fixtures import FixtureSpec, generate


def test_deterministic():
    a = generate(FixtureSpec(n_families=20))
    b = generate(FixtureSpec(n_families=20))
    for k in a:
        assert a[k].equals(b[k]), k


def test_schema_matches_input_hint():
    t = generate(FixtureSpec(n_families=10))["transcripts"]
    names = t.schema.names
    assert names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t.schema.field("turn_idx").type) == "int32"
    assert str(t.schema.field("ts").type) == "timestamp[us]"
    # nullable tool exists
    assert t["tool"].null_count > 0


def test_labels_and_clusters_consistent():
    tabs = generate(FixtureSpec(n_families=40))
    lp = tabs["labeled_pairs"]
    ec = tabs["expected_clusters"]
    cl = dict(zip(ec["conv_id"].to_pylist(), ec["cluster_id"].to_pylist()))
    # every conv appears exactly once in expected_clusters
    assert len(set(ec["conv_id"].to_pylist())) == len(ec)
    for a, b, m in zip(
        lp["conv_id_a"].to_pylist(), lp["conv_id_b"].to_pylist(), lp["is_match"].to_pylist()
    ):
        assert a < b  # canonical pair order
        assert (cl[a] == cl[b]) == m, (a, b, m)


def test_turn_ordering_and_monotone_ts():
    t = generate(FixtureSpec(n_families=15))["transcripts"].to_pandas()
    for _, g in t.groupby("conv_id"):
        idx = g["turn_idx"].to_numpy()
        assert (np.sort(idx) == np.arange(len(idx))).all()
        ts = g.sort_values("turn_idx")["ts"].to_numpy()
        assert (np.diff(ts).astype("int64") > 0).all()


def test_cached_fixture_files(xs_fixture_dir):
    t = pq.read_table(f"{xs_fixture_dir}/transcripts.parquet")
    assert len(t) > 1000
