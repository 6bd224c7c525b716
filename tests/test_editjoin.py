"""edit_distance_pairs: lossless deletion-neighborhood blocking + exact
verification.  Hand-counted corpus, DuckDB brute-force parity on random
strings (small alphabet to force bucket collisions), partition invariance."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.pipelines.editjoin import edit_distance_pairs


def _run(texts, k=1, **kw):
    ds = ray.data.from_arrow(
        pa.table(
            {"rid": pa.array(range(len(texts)), pa.int64()), "s": pa.array(texts)}
        )
    )
    df = edit_distance_pairs(ds, "rid", "s", k=k, **kw).to_pandas()
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _brute(texts, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (rid BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    return con.execute(
        """SELECT a.rid AS id_a, b.rid AS id_b,
                  levenshtein(a.s, b.s)::BIGINT AS dist
           FROM t a JOIN t b ON a.rid < b.rid
           WHERE levenshtein(a.s, b.s) <= ? ORDER BY 1, 2""",
        [k],
    ).df()


class TestEditDistancePairs:
    TEXTS = [
        "martha",      # 0
        "martha",      # 1  equal -> dist 0 with 0
        "marhta",      # 2  transposition -> dist 2 from martha
        "marta",       # 3  deletion -> dist 1 from martha
        "marthas",     # 4  insertion -> dist 1 from martha
        "mertha",      # 5  substitution -> dist 1 from martha
        "zzzzzz",      # 6  far from everything
        "",            # 7  empty string
        "a",           # 8  dist 1 from empty
    ]

    def test_hand_counted_k1(self, ray_session):
        got = _run(self.TEXTS, k=1)
        pairs = {(r.id_a, r.id_b): r.dist for r in got.itertuples()}
        assert pairs[(0, 1)] == 0
        assert pairs[(0, 3)] == 1 and pairs[(0, 4)] == 1 and pairs[(0, 5)] == 1
        assert (0, 2) not in pairs  # transposition = distance 2
        assert pairs[(7, 8)] == 1
        assert not any(6 in p for p in pairs)
        exp = _brute(self.TEXTS, 1)
        assert len(got) == len(exp)

    def test_k2_includes_transposition(self, ray_session):
        got = _run(self.TEXTS, k=2)
        pairs = {(r.id_a, r.id_b): r.dist for r in got.itertuples()}
        assert pairs[(0, 2)] == 2
        exp = _brute(self.TEXTS, 2)
        assert got.astype("int64").equals(exp.astype("int64"))

    def test_random_duckdb_parity_both_k(self, ray_session):
        rng = np.random.default_rng(7)
        texts = [
            "".join(rng.choice(list("abc"), size=rng.integers(0, 8)))
            for _ in range(120)
        ]
        for k in (1, 2):
            got = _run(texts, k=k)
            exp = _brute(texts, k)
            assert got.astype("int64").equals(exp.astype("int64")), k

    def test_partition_invariance(self, ray_session):
        rng = np.random.default_rng(11)
        texts = [
            "".join(rng.choice(list("abcd"), size=rng.integers(1, 10)))
            for _ in range(100)
        ]
        a = _run(texts, k=1, num_parts=3)
        b = _run(texts, k=1, num_parts=17)
        assert a.equals(b)

    def test_k_bounds(self, ray_session):
        import pytest

        ds = ray.data.from_arrow(
            pa.table({"rid": pa.array([0], pa.int64()), "s": pa.array(["x"])})
        )
        with pytest.raises(ValueError):
            edit_distance_pairs(ds, "rid", "s", k=0)
        with pytest.raises(ValueError):
            edit_distance_pairs(ds, "rid", "s", k=3)
