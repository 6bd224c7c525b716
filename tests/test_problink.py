"""Fellegi-Sunter probabilistic linkage: EM parameter recovery on planted
data, pattern-histogram merge correctness (the repeated-pattern partial
regression), block_pairs enumeration, end-to-end weight laws."""

import numpy as np
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.pipelines.problink import (
    block_pairs,
    em_fit,
    fs_match_weights,
    pattern_histogram,
)


def _planted_hist(m, u, p, n_pairs, rng):
    """Sample an agreement-pattern histogram from known FS parameters."""
    K = len(m)
    is_match = rng.random(n_pairs) < p
    probs = np.where(is_match[:, None], m, u)
    bits = (rng.random((n_pairs, K)) < probs).astype(np.int64)
    packed = (bits << np.arange(K)).sum(axis=1)
    return np.bincount(packed, minlength=1 << K)


class TestEmFit:
    def test_recovers_planted_parameters(self):
        rng = np.random.default_rng(3)
        m = np.array([0.95, 0.9, 0.85])
        u = np.array([0.05, 0.2, 0.1])
        p = 0.08
        hist = _planted_hist(m, u, p, 200_000, rng)
        got = em_fit(hist, 3, iters=200)
        assert np.allclose(got.m, m, atol=0.02)
        assert np.allclose(got.u, u, atol=0.02)
        assert abs(got.p - p) < 0.02

    def test_deterministic(self):
        hist = np.array([500, 40, 30, 20, 10, 5, 3, 60], dtype=np.int64)
        a = em_fit(hist, 3)
        b = em_fit(hist, 3)
        assert np.array_equal(a.m, b.m) and np.array_equal(a.u, b.u)
        assert a.p == b.p

    def test_empty_raises(self):
        import pytest

        with pytest.raises(ValueError):
            em_fit(np.zeros(8, dtype=np.int64), 3)


class TestPatternHistogram:
    def test_repeated_patterns_across_blocks_accumulate(self, ray_session):
        # many single-row blocks -> partials with the SAME pattern repeat
        # inside one streamed merge batch; regression for the buffered
        # fancy-indexing += bug
        n = 64
        t = pa.table(
            {
                "a1": pa.array([1] * n, pa.int64()),
                "a2": pa.array([i % 2 for i in range(n)], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(16)
        hist = pattern_histogram(ds, ["a1", "a2"])
        assert hist.sum() == n
        assert hist[0b01] == 32 and hist[0b11] == 32


class TestBlockPairs:
    def _ds(self):
        return ray.data.from_arrow(
            pa.table(
                {
                    "rid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                    "blk": pa.array(["x", "x", "x", "y", "y", "z"]),
                    "val": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
                }
            )
        )

    def test_within_block_triangle(self, ray_session):
        df = block_pairs(self._ds(), "blk", "rid", ["val"]).to_pandas()
        got = set(zip(df.id_a, df.id_b))
        assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}
        row = df[(df.id_a == 1) & (df.id_b == 3)].iloc[0]
        assert row.val_a == 10.0 and row.val_b == 30.0

    def test_partition_invariance(self, ray_session):
        a = (
            block_pairs(self._ds(), "blk", "rid", ["val"], num_parts=2)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        b = (
            block_pairs(self._ds(), "blk", "rid", ["val"], num_parts=13)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        assert a.equals(b)


class TestFsMatchWeights:
    def test_weight_laws(self, ray_session):
        rng = np.random.default_rng(9)
        n = 4000
        is_match = rng.random(n) < 0.1
        m = np.array([0.95, 0.9])
        u = np.array([0.1, 0.2])
        probs = np.where(is_match[:, None], m, u)
        bits = (rng.random((n, 2)) < probs).astype(np.int64)
        t = pa.table(
            {
                "id_a": pa.array(np.arange(n), pa.int64()),
                "id_b": pa.array(np.arange(n) + n, pa.int64()),
                "f1": pa.array(bits[:, 0], pa.int64()),
                "f2": pa.array(bits[:, 1], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(8)
        out, params = fs_match_weights(ds, ["f1", "f2"])
        df = out.to_pandas()
        assert len(df) == n
        assert ((df.posterior >= 0) & (df.posterior <= 1)).all()
        # weight strictly increases with each agreement bit flipped on
        w = df.groupby(["f1", "f2"]).match_weight.first()
        assert w[(1, 1)] > w[(1, 0)] > w[(0, 0)]
        assert w[(1, 1)] > w[(0, 1)] > w[(0, 0)]
        # pattern histogram the EM saw matches the data
        packed = bits[:, 0] | (bits[:, 1] << 1)
        assert np.array_equal(
            params.pattern_counts, np.bincount(packed, minlength=4)
        )
        # annotate matches a direct numpy replay of the weight formula
        agree_w = np.log2(params.m / params.u)
        dis_w = np.log2((1 - params.m) / (1 - params.u))
        manual = (bits * agree_w + (1 - bits) * dis_w).sum(axis=1)
        merged = df.sort_values("id_a").match_weight.to_numpy()
        assert np.allclose(merged, manual, atol=1e-6)


class TestPhoneticBlockStats:
    def test_known_codes(self, ray_session):
        from record_linkage_ldu_ray.pipelines.problink import phonetic_block_stats

        names = ["Robert smith", "Rupert jones", "Ashcraft x", "Ashcroft y",
                 "robert brown", ""]
        ds = ray.data.from_arrow(pa.table({"nm": pa.array(names)}))
        df = phonetic_block_stats(ds, "nm").to_pandas()
        got = {r.code: (r.n_records, r.n_tokens) for r in df.itertuples()}
        # robert and rupert share R163; ashcraft/ashcroft share A226
        assert got["R163"] == (3, 2)
        assert got["A226"] == (2, 2)
        assert got[""] == (1, 1)

    def test_partition_invariance(self, ray_session):
        from record_linkage_ldu_ray.pipelines.problink import phonetic_block_stats

        names = [f"name{i % 7}x suffix" for i in range(200)]
        ds = ray.data.from_arrow(pa.table({"nm": pa.array(names)}))
        a = phonetic_block_stats(ds.repartition(3), "nm", num_parts=2).to_pandas()
        b = phonetic_block_stats(ds.repartition(11), "nm", num_parts=9).to_pandas()
        a = a.sort_values("code").reset_index(drop=True)
        b = b.sort_values("code").reset_index(drop=True)
        assert a.equals(b)


class TestEmptyInputsProblink:
    def test_block_pairs_schema_less_lineage(self, ray_session):
        t = pa.table(
            {"rid": pa.array([1], pa.int64()), "s": pa.array(["x"]),
             "blk": pa.array(["b"])}
        )
        mapped = ray.data.from_arrow(t).filter(lambda r: False).materialize()
        out = block_pairs(mapped, "blk", "rid", ["s"])
        assert out.count() == 0

    def test_typed_empty_all_new_ops(self, ray_session):
        from record_linkage_ldu_ray.pipelines.editjoin import edit_distance_pairs
        from record_linkage_ldu_ray.pipelines.evaluate import (
            bcubed_metrics,
            threshold_curve,
        )
        from record_linkage_ldu_ray.pipelines.problink import phonetic_block_stats

        t = pa.table(
            {
                "rid": pa.array([], pa.int64()),
                "s": pa.array([], pa.string()),
                "blk": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
                "label": pa.array([], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        assert edit_distance_pairs(ds, "rid", "s", k=1).count() == 0
        assert block_pairs(ds, "blk", "rid", ["s"]).count() == 0
        assert threshold_curve(ds, "score", "label").count() == 0
        assert phonetic_block_stats(ds, "s").count() == 0
        r = bcubed_metrics(ds, "blk", "s").to_pandas().iloc[0]
        assert r.n_records == 0 and r.bcubed_f1 == 1.0


class TestFsDecisions:
    def test_three_regions_and_laws(self, ray_session):
        from record_linkage_ldu_ray.pipelines.problink import fs_decisions

        rng = np.random.default_rng(21)
        n = 20000
        is_match = rng.random(n) < 0.15
        m = np.array([0.97, 0.95, 0.9])
        u = np.array([0.05, 0.1, 0.15])
        probs = np.where(is_match[:, None], m, u)
        bits = (rng.random((n, 3)) < probs).astype(np.int64)
        t = pa.table(
            {
                "id_a": pa.array(np.arange(n), pa.int64()),
                "id_b": pa.array(np.arange(n) + n, pa.int64()),
                "f1": pa.array(bits[:, 0], pa.int64()),
                "f2": pa.array(bits[:, 1], pa.int64()),
                "f3": pa.array(bits[:, 2], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(8)
        out, params = fs_decisions(ds, ["f1", "f2", "f3"], mu=0.01, lam=0.01)
        df = out.to_pandas()
        assert len(df) == n
        kinds = set(df.decision.unique())
        assert kinds == {"match", "possible", "non_match"}
        # weight bands are ordered: min(match) > max(possible) > ... etc.
        wm = df[df.decision == "match"].match_weight
        wp = df[df.decision == "possible"].match_weight
        wn = df[df.decision == "non_match"].match_weight
        assert wm.min() > wp.max() > wn.max()
        assert wp.min() > wn.max()
        # designated error-rate bound: u-mass of the match region <= mu
        pats = np.arange(8)
        a = ((pats[:, None] >> np.arange(3)) & 1).astype(float)
        pu = np.prod(np.where(a == 1, params.u, 1 - params.u), axis=1)
        packed = bits[:, 0] | (bits[:, 1] << 1) | (bits[:, 2] << 2)
        match_pats = np.unique(packed[(df.sort_values("id_a").decision
                                       == "match").to_numpy()])
        assert pu[match_pats].sum() <= 0.01 + 1e-12

    def test_extreme_rates(self, ray_session):
        from record_linkage_ldu_ray.pipelines.problink import fs_decisions

        t = pa.table(
            {
                "id_a": pa.array([0, 1, 2, 3], pa.int64()),
                "id_b": pa.array([4, 5, 6, 7], pa.int64()),
                "f1": pa.array([1, 1, 0, 0], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        # mu = lam = 0 -> nothing qualifies, everything is possible
        out, _ = fs_decisions(ds, ["f1"], mu=0.0, lam=0.0)
        assert set(out.to_pandas().decision) == {"possible"}
        # mu = lam = 1 -> every pattern qualifies for match first
        out2, _ = fs_decisions(ds, ["f1"], mu=1.0, lam=1.0)
        assert set(out2.to_pandas().decision) == {"match"}
