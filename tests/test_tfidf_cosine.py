"""Sparse all-pairs TF-IDF cosine join: brute-force parity on a small
corpus, the max_df prefix-filter knob, and pair-partition invariance."""

import numpy as np
import pyarrow as pa

import ray.data


def _docs():
    texts = [
        "apple banana apple cherry",
        "apple banana apple cherry",  # exact dup of 0
        "apple banana cherry date",  # near dup
        "xylophone quartz vortex jumble",  # unrelated
        "date fig grape melon kiwi",
        "apple apple apple banana banana cherry",  # tf-skewed neighbor
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )


def _brute_cosine(texts: list[str]) -> np.ndarray:
    """Dense float64 TF-IDF cosine matrix (smooth IDF, L2 rows)."""
    vocab = sorted({w for t in texts for w in t.split()})
    vi = {w: i for i, w in enumerate(vocab)}
    n = len(texts)
    tf = np.zeros((n, len(vocab)))
    for r, t in enumerate(texts):
        for w in t.split():
            tf[r, vi[w]] += 1.0
    df = (tf > 0).sum(axis=0)
    w = tf * (np.log((1.0 + n) / (1.0 + df)) + 1.0)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    return w @ w.T


class TestTfidfCosinePairs:
    def _run(self, tau=0.5, **kw):
        from record_linkage_ldu_ray.pipelines.docdedup import tfidf_cosine_pairs

        ds = ray.data.from_arrow(_docs())
        return (
            tfidf_cosine_pairs(ds, tau=tau, **kw)
            .to_pandas()
            .sort_values(["doc_id_a", "doc_id_b"])
            .reset_index(drop=True)
        )

    def test_matches_brute_force(self, ray_session):
        texts = _docs()["text"].to_pylist()
        sim = _brute_cosine(texts)
        tau = 0.5
        exp = {
            (i, j): sim[i, j]
            for i in range(len(texts))
            for j in range(i + 1, len(texts))
            if sim[i, j] >= tau
        }
        got = self._run(tau=tau)
        assert set(zip(got.doc_id_a, got.doc_id_b)) == set(exp)
        for _, r in got.iterrows():
            assert abs(r.cosine - exp[(r.doc_id_a, r.doc_id_b)]) < 1e-6
        # the exact dup pair comes back at cosine 1.0
        assert got.set_index(["doc_id_a", "doc_id_b"]).loc[(0, 1), "cosine"] == 1.0

    def test_max_df_prunes_common_tokens(self, ray_session):
        # every token with df > 2 is dropped BEFORE weighting: docs 0/1/5
        # (built only from common tokens) vanish from the index entirely,
        # while (2, 4) — which share the rare token "date" — survive
        got = self._run(tau=0.3, max_df=2)
        pairs = set(zip(got.doc_id_a, got.doc_id_b))
        assert (2, 4) in pairs
        assert not any(a in (0, 1, 5) or b in (0, 1, 5) for a, b in pairs)

    def test_partition_invariance(self, ray_session):
        a = self._run(tau=0.5, num_parts=2)
        b = self._run(tau=0.5, num_parts=7)
        assert a.equals(b)
