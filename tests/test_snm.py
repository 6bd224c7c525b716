"""Sorted-neighborhood blocking: exactness vs a brute-force window oracle,
partition invariance, payload plumbing — plus the SQL-parity kernel modes
(DuckDB jaro_winkler / levenshtein semantics) the snm_pair_scores query
exposes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray

from record_linkage_ldu_ray.functions.sim import (
    jaro_winkler_batch_arrow,
    levenshtein_batch_arrow,
    levenshtein_distance_batch_arrow,
    ngram_jaccard,
    packed_trigram_sets,
    pad_codes_arrow,
    set_overlap_u64_batch,
)


def _brute_window_pairs(keys, ids, window):
    """Oracle: all pairs within `window` in the (key, id) sort order."""
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for p, i in enumerate(order):
        for q in range(p + 1, min(p + window, len(order))):
            out.add((ids[i], ids[order[q]]))
    return out


class TestSortedNeighborhood:
    def _table(self, n=97, seed=5):
        rng = np.random.default_rng(seed)
        ids = np.arange(n, dtype=np.int64)
        rng.shuffle(ids)
        keys = ["k%02d" % rng.integers(0, 30) for _ in range(n)]  # heavy key ties
        texts = ["payload-%d" % i for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(keys, pa.string()),
                "f": pa.array(texts, pa.string()),
            }
        )

    def test_exact_pair_set_and_payloads(self, ray_session):
        from record_linkage_ldu_ray.stages.snm import sorted_neighborhood_pairs

        t = self._table()
        ds = ray.data.from_arrow(t).repartition(5)
        got = sorted_neighborhood_pairs(
            ds, "k", "doc_id", payload_col="f", window=4
        ).to_pandas()
        want = _brute_window_pairs(
            t["k"].to_pylist(), t["doc_id"].to_pylist(), window=4
        )
        got_pairs = set(zip(got.id_a.tolist(), got.id_b.tolist()))
        assert got_pairs == want
        assert len(got) == len(got_pairs), "duplicate pairs emitted"
        # payloads must belong to their ids
        assert (got.f_a == "payload-" + got.id_a.astype(str)).all()
        assert (got.f_b == "payload-" + got.id_b.astype(str)).all()

    def test_partition_invariance_and_small_budget(self, ray_session):
        from record_linkage_ldu_ray.stages.snm import sorted_neighborhood_pairs

        t = self._table(n=41, seed=9)
        ds = ray.data.from_arrow(t).repartition(7)
        runs = [
            sorted_neighborhood_pairs(ds, "k", "doc_id", window=5, num_parts=p)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
            # num_parts ≫ rows forces budget == window (dense replication)
            for p in (2, 64)
        ]
        import pandas as pd

        pd.testing.assert_frame_equal(runs[0], runs[1])
        want = _brute_window_pairs(t["k"].to_pylist(), t["doc_id"].to_pylist(), 5)
        assert set(zip(runs[0].id_a, runs[0].id_b)) == want

    def test_tiny_inputs(self, ray_session):
        from record_linkage_ldu_ray.stages.snm import sorted_neighborhood_pairs

        one = pa.table(
            {"doc_id": pa.array([7], pa.int64()), "k": pa.array(["a"], pa.string())}
        )
        assert sorted_neighborhood_pairs(
            ray.data.from_arrow(one), "k", "doc_id", window=3
        ).count() == 0


class TestSqlParityKernels:
    duckdb = pytest.importorskip("duckdb")

    def _pairs(self):
        rng = np.random.default_rng(17)
        alpha = "ab cdex"
        mk = lambda n: "".join(rng.choice(list(alpha)) for _ in range(n))  # noqa: E731
        ps = [(mk(rng.integers(0, 9)), mk(rng.integers(0, 9))) for _ in range(800)]
        ps += [("", ""), ("", "a"), ("b", "b"), ("ab", "ba"), ("martha", "marhta")]
        return ps

    def test_jw_duckdb_bit_parity(self):
        ps = self._pairs()
        a = pa.array([p[0] for p in ps])
        b = pa.array([p[1] for p in ps])
        ours = jaro_winkler_batch_arrow(
            a, b, boost_threshold=0.7, empty_empty=0.0,
            out_dtype=np.float64, clamp_window=True,
        )
        con = self.duckdb.connect()
        con.register("t", pa.table({"a": a, "b": b}))
        theirs = np.array(
            [r[0] for r in con.sql("SELECT jaro_winkler_similarity(a,b) FROM t").fetchall()]
        )
        assert (ours == theirs).all()

    def test_jw_default_path_unchanged(self):
        # the engine-default float32 semantics must not move: classic
        # 1-char window edge case and unconditional prefix boost
        a = pa.array(["b", "atomic", "martha", ""])
        b = pa.array(["b", "ab", "marhta", ""])
        out = jaro_winkler_batch_arrow(a, b)
        assert out.dtype == np.float32
        assert out[0] == 0.0  # md == -1 edge: classic jaro gives 0
        assert abs(out[1] - 0.6) < 1e-6  # boost applied below 0.7 too
        assert out[3] == 1.0  # both empty

    def test_levenshtein_distance_int_parity(self):
        ps = self._pairs()
        a = pa.array([p[0] for p in ps])
        b = pa.array([p[1] for p in ps])
        ours = levenshtein_distance_batch_arrow(a, b)
        assert ours.dtype == np.int64
        con = self.duckdb.connect()
        con.register("t", pa.table({"a": a, "b": b}))
        theirs = np.array([r[0] for r in con.sql("SELECT levenshtein(a,b) FROM t").fetchall()])
        assert (ours == theirs).all()
        # the normalized kernel still agrees with 1 - d/maxlen
        norm = levenshtein_batch_arrow(a, b)
        la = np.array([len(p[0]) for p in ps])
        lb = np.array([len(p[1]) for p in ps])
        mx = np.maximum(np.maximum(la, lb), 1)
        both_empty = (la == 0) & (lb == 0)
        want = np.where(both_empty, 1.0, 1.0 - ours / mx)
        assert np.allclose(norm, want, atol=1e-6)

    def test_set_overlap_matches_scalar_trigrams(self):
        ps = self._pairs()
        a = pa.array([p[0] for p in ps])
        b = pa.array([p[1] for p in ps])
        A, la = pad_codes_arrow(a, 32)
        B, lb = pad_codes_arrow(b, 32)
        va, oa = packed_trigram_sets(A, la)
        vb, ob = packed_trigram_sets(B, lb)
        inter, union = set_overlap_u64_batch(va, oa, vb, ob)
        for i, (s1, s2) in enumerate(ps):
            g1 = {s1[j : j + 3] for j in range(max(0, len(s1) - 2))}
            g2 = {s2[j : j + 3] for j in range(max(0, len(s2) - 2))}
            assert inter[i] == len(g1 & g2)
            assert union[i] == len(g1 | g2)
        # the ratio path (ngram_jaccard scalar) stays consistent where defined
        k = next(
            i for i, (s1, s2) in enumerate(ps) if len(s1) > 4 and len(s2) > 4 and s1 != s2
        )
        assert union[k] > 0
        assert abs(inter[k] / union[k] - ngram_jaccard(ps[k][0], ps[k][1])) < 1e-12


class TestSnmMultiPass:
    def _keyed(self):
        # k1 separates rows 0/1 (typo in first char); k2 (suffix) reunites
        # them; rows 2-4 pad the sort orders apart
        rows = [
            (0, "aaaa_shared_tail", "shared_tail"),
            (1, "zzzz_shared_tail", "shared_tail"),
            (2, "bbbb_pad_1", "pad_1_x"),
            (3, "cccc_pad_2", "pad_2_y"),
            (4, "dddd_pad_3", "pad_3_z"),
        ]
        return ray.data.from_arrow(
            pa.table(
                {
                    "rid": pa.array([r[0] for r in rows], pa.int64()),
                    "k1": pa.array([r[1] for r in rows]),
                    "k2": pa.array([r[2] for r in rows]),
                }
            )
        )

    def test_second_pass_recovers_pair(self, ray_session):
        from record_linkage_ldu_ray.stages.snm import snm_multi_pass

        # window 2: only rank-adjacent pairs. Under k1, 0 and 1 are at
        # opposite ends; under k2 they are adjacent.
        one = snm_multi_pass(self._keyed(), ["k1"], "rid", window=2).to_pandas()
        assert (0, 1) not in set(zip(one.id_a, one.id_b))
        both = snm_multi_pass(self._keyed(), ["k1", "k2"], "rid", window=2).to_pandas()
        pairs = {(r.id_a, r.id_b): r.n_passes for r in both.itertuples()}
        assert pairs[(0, 1)] == 1  # found by the k2 pass only
        # adjacent under both orders -> n_passes == 2 exists
        assert 2 in set(both.n_passes)

    def test_partition_invariance(self, ray_session):
        from record_linkage_ldu_ray.stages.snm import snm_multi_pass

        a = (
            snm_multi_pass(self._keyed(), ["k1", "k2"], "rid", window=3,
                           num_parts=2)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        b = (
            snm_multi_pass(self._keyed(), ["k1", "k2"], "rid", window=3,
                           num_parts=7)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        assert a.equals(b)
