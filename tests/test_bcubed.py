"""bcubed_metrics: hand-computed clusterings, degenerate laws, partition
invariance."""

import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.pipelines.evaluate import bcubed_metrics


def _run(pred, true, repart=None, **kw):
    t = pa.table(
        {
            "pred": pa.array(pred, pa.int64()),
            "tru": pa.array(true, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    if repart:
        ds = ds.repartition(repart)
    return bcubed_metrics(ds, "pred", "tru", **kw).to_pandas().iloc[0]


class TestBcubed:
    def test_perfect_clustering(self, ray_session):
        r = _run([1, 1, 2, 2, 3], [7, 7, 8, 8, 9])
        assert r.bcubed_precision == 1.0
        assert r.bcubed_recall == 1.0
        assert r.bcubed_f1 == 1.0

    def test_hand_computed_merge(self, ray_session):
        # pred merges two gold classes of sizes 2 and 2 into one cluster:
        # precision per record = 2/4, recall = 1 -> P=0.5 R=1 F1=2/3
        r = _run([1, 1, 1, 1], [7, 7, 8, 8])
        assert abs(r.bcubed_precision - 0.5) < 1e-6
        assert r.bcubed_recall == 1.0
        assert abs(r.bcubed_f1 - 2 / 3) < 1e-6

    def test_hand_computed_split(self, ray_session):
        # pred splits one gold class of 4 into two clusters of 2:
        # precision = 1, recall per record = 2/4 -> R=0.5
        r = _run([1, 1, 2, 2], [7, 7, 7, 7])
        assert r.bcubed_precision == 1.0
        assert abs(r.bcubed_recall - 0.5) < 1e-6

    def test_asymmetric_mixture(self, ray_session):
        # cluster A = {g1, g1, g2}; cluster B = {g2}
        # precision: (2/3 + 2/3 + 1/3 + 1/1)/4 = (2/3+2/3+1/3+1)/4 = 8/12/... compute:
        #   = (0.6667+0.6667+0.3333+1)/4 = 2.6667/4 = 0.666667
        # recall: g1 size 2 both in A -> 1, 1; g2 size 2 split -> 1/2, 1/2
        #   = (1+1+0.5+0.5)/4 = 0.75
        r = _run([1, 1, 1, 2], [7, 7, 8, 8])
        assert abs(r.bcubed_precision - 2 / 3) < 1e-5
        assert abs(r.bcubed_recall - 0.75) < 1e-6

    def test_partition_invariance(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(4)
        pred = list(rng.integers(0, 20, 500))
        true = list(rng.integers(0, 15, 500))
        a = _run(pred, true, repart=3, num_parts=5)
        b = _run(pred, true, repart=17, num_parts=11)
        assert a.equals(b)


class TestSplitLeakage:
    def test_hand_counted(self, ray_session):
        from record_linkage_ldu_ray.pipelines.evaluate import split_leakage_report

        clusters = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    # cluster A = {0,1} spans splits; B = {2,3} does not;
                    # C = {4} singleton
                    "rep_id": pa.array([10, 10, 20, 20, 30], pa.int64()),
                }
            )
        )
        splits = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    "split": pa.array(["train", "test", "train", "train", "val"]),
                }
            )
        )
        r = split_leakage_report(clusters, splits).to_pandas().iloc[0]
        assert r.n_clusters == 3 and r.n_leaky_clusters == 1
        assert r.n_docs == 5 and r.n_leaky_docs == 2
        assert abs(r.cluster_leak_ratio - 1 / 3) < 1e-6
        assert abs(r.doc_leak_ratio - 0.4) < 1e-6

    def test_no_leak(self, ray_session):
        from record_linkage_ldu_ray.pipelines.evaluate import split_leakage_report

        clusters = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "rep_id": pa.array([0, 0], pa.int64()),
                }
            )
        )
        splits = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "split": pa.array(["train", "train"]),
                }
            )
        )
        r = split_leakage_report(clusters, splits).to_pandas().iloc[0]
        assert r.n_leaky_clusters == 0 and r.doc_leak_ratio == 0.0
