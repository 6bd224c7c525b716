"""threshold_curve: hand-counted confusion table, sklearn-free PR laws,
partition invariance across block layouts."""

import numpy as np
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.pipelines.evaluate import threshold_curve


def _run(scores, labels, repart=None, **kw):
    t = pa.table(
        {
            "score": pa.array(scores, pa.float64()),
            "label": pa.array(labels, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if repart:
        ds = ds.repartition(repart)
    df = threshold_curve(ds, "score", "label", **kw).to_pandas()
    return df.sort_values("threshold", ascending=False).reset_index(drop=True)


class TestThresholdCurve:
    def test_hand_counted(self, ray_session):
        # scores: 0.9(pos) 0.8(neg) 0.8(pos) 0.5(neg) 0.3(pos) 0.3(neg) 0.1(neg)
        got = _run([0.9, 0.8, 0.8, 0.5, 0.3, 0.3, 0.1],
                   [1, 0, 1, 0, 1, 0, 0])
        assert list(got.threshold) == [0.9, 0.8, 0.5, 0.3, 0.1]
        assert list(got.tp) == [1, 2, 2, 3, 3]
        assert list(got.fp) == [0, 1, 2, 3, 4]
        assert list(got.fn) == [2, 1, 1, 0, 0]
        r = got.iloc[1]  # threshold 0.8: tp=2 fp=1 fn=1
        assert abs(r.precision - 2 / 3) < 1e-6
        assert abs(r.recall - 2 / 3) < 1e-6
        assert abs(r.f1 - 2 / 3) < 1e-6

    def test_monotone_recall_and_counts(self, ray_session):
        rng = np.random.default_rng(5)
        s = np.round(rng.random(3000), 2)
        y = (rng.random(3000) < 0.2).astype(np.int64)
        got = _run(list(s), list(y))
        # descending thresholds -> tp, fp nondecreasing; recall nondecreasing
        assert (np.diff(got.tp) >= 0).all() and (np.diff(got.fp) >= 0).all()
        assert (np.diff(got.recall) >= -1e-9).all()
        # bottom threshold covers everything
        assert got.iloc[-1].tp == y.sum()
        assert got.iloc[-1].fn == 0
        assert got.iloc[-1].tp + got.iloc[-1].fp == len(s)

    def test_partition_invariance(self, ray_session):
        rng = np.random.default_rng(6)
        s = list(np.round(rng.random(500), 2))
        y = list((rng.random(500) < 0.3).astype(np.int64))
        a = _run(s, y, repart=2, num_parts=3)
        b = _run(s, y, repart=19, num_parts=11)
        assert a.equals(b)

    def test_no_positives_recall_one(self, ray_session):
        got = _run([0.5, 0.2], [0, 0])
        assert (got.recall == 1.0).all()
        assert (got.tp == 0).all()
