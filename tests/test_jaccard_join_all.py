"""jaccard_join_all (AllPairs prefix filter): brute-force parity on
adversarial corpora, epsilon-guarded ceil regression, partition invariance."""

import numpy as np
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.pipelines.docdedup import jaccard_join_all


def _brute(texts, tau):
    sets = [frozenset(t.split()) for t in texts]
    out = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a and not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= tau:
                out.append((i, j, round(jac, 6)))
    return sorted(out)


def _run(texts, tau, **kw):
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    )
    df = jaccard_join_all(ds, tau=tau, **kw).to_pandas()
    return sorted(
        (int(r.id_a), int(r.id_b), round(float(r.jaccard), 6))
        for r in df.itertuples()
    )


class TestJaccardJoinAll:
    def test_small_vocab_worst_case(self, ray_session):
        # tiny vocabulary = weakest prefix filter; every pair must still
        # be found exactly
        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 9), replace=True))
            for _ in range(80)
        ]
        for tau in (0.3, 0.5, 0.8):
            assert _run(texts, tau) == _brute(texts, tau), tau

    def test_rare_token_corpus(self, ray_session):
        # realistic regime: mostly-unique tokens, a few shared
        rng = np.random.default_rng(17)
        texts = []
        for i in range(60):
            toks = [f"uniq{i}_{k}" for k in range(rng.integers(2, 6))]
            if i % 3 == 0:
                toks += ["shared alpha beta"]
            texts.append(" ".join(toks) + (" shared" if i % 2 == 0 else ""))
        assert _run(texts, 0.4) == _brute(texts, 0.4)

    def test_ceil_epsilon_guard(self, ray_session):
        # tau * len hitting a float artifact: 0.4 * 5 = 2.0000000000000004;
        # an unguarded ceil gives 3 and silently DROPS the pair below
        a = "t1 t2 t3 t4 t5"
        b = "t1 t2 t3 x y"          # overlap 3, union 7 -> J = 3/7 ≈ 0.4286
        got = _run([a, b], 0.4)
        assert got == [(0, 1, round(3 / 7, 6))]

    def test_partition_invariance_and_dupes(self, ray_session):
        texts = ["alpha beta gamma"] * 5 + ["alpha beta", "gamma delta"]
        a = _run(texts, 0.5, num_parts=2)
        b = _run(texts, 0.5, num_parts=13)
        assert a == b == _brute(texts, 0.5)

    def test_empty_and_singleton(self, ray_session):
        assert _run([], 0.5) == []
        assert _run(["only one"], 0.5) == []
        assert _run(["", "", "x"], 0.5) == _brute(["", "", "x"], 0.5)


class TestDfVocabPruning:
    def test_counted_vocab_is_exactly_df2_on_hapax_heavy_corpus(
        self, ray_session
    ):
        """The per-partition-counted vocabulary must contain EXACTLY the
        df>=2 tokens: on a planted hapax-heavy corpus (the realistic Zipf
        shape where df=1 tokens dominate) the df>=2 vocab is a small
        fraction of the distinct vocabulary, and the join stays
        brute-force exact."""
        from collections import Counter

        rng = np.random.default_rng(31)
        texts = []
        for i in range(40):
            hapax = [f"hapax{i}_{k}" for k in range(20)]
            core = ["core", "alpha" if i % 2 == 0 else "beta"]
            rng.shuffle(hapax)
            texts.append(" ".join(hapax + core))
        # planted near-duplicate pairs so the answer is non-trivial
        texts += [texts[0], texts[1] + " extra"]

        df = Counter()
        for t in texts:
            df.update(set(t.split()))
        n_df2 = sum(1 for v in df.values() if v >= 2)
        n_distinct = len(df)

        metrics = {}
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )
        got = sorted(
            (int(r.id_a), int(r.id_b), round(float(r.jaccard), 6))
            for r in jaccard_join_all(ds, tau=0.3, metrics=metrics)
            .to_pandas()
            .itertuples()
        )
        assert got == _brute(texts, 0.3)
        assert len(got) >= 2  # the planted duplicates were found
        # exactness of the pruning bound: counted vocab == df>=2 vocabulary
        assert metrics["df_vocab_tokens"] == n_df2
        # and the hapax mass (the part that would OOM a 100 TB driver)
        # is pruned partition-locally: >90% of this vocabulary is df=1
        assert metrics["df_vocab_tokens"] < 0.1 * n_distinct

    def test_all_hapax_corpus_counts_zero_vocab(self, ray_session):
        texts = [f"only{i} tok{i}" for i in range(30)]
        metrics = {}
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )
        assert jaccard_join_all(ds, tau=0.5, metrics=metrics).count() == 0
        assert metrics["df_vocab_tokens"] == 0


class TestFirstCommonPositionHash:
    def test_random_vs_brute(self):
        from record_linkage_ldu_ray.pipelines.docdedup import (
            _first_common_position_hash,
        )

        rng = np.random.default_rng(23)
        for _ in range(20):
            n_rows = rng.integers(2, 12)
            lists = [
                list(dict.fromkeys(rng.integers(1, 12, rng.integers(0, 7))))
                for _ in range(n_rows)
            ]
            flat = np.array([v for l in lists for v in l], np.uint64)
            off = np.r_[0, np.cumsum([len(l) for l in lists])].astype(np.int64)
            m = rng.integers(1, 10)
            ii = rng.integers(0, n_rows, m).astype(np.int64)
            jj = rng.integers(0, n_rows, m).astype(np.int64)
            got = _first_common_position_hash(flat, off, ii, jj)
            for k in range(m):
                a, b = lists[ii[k]], set(lists[jj[k]])
                exp = next((v for v in a if v in b), 0)
                assert got[k] == exp, (lists, ii[k], jj[k])


class TestNoDriverVocabularyFold:
    def test_no_driver_side_vocabulary_concat_or_broadcast(self):
        """jaccard_join_all must keep the vocabulary OFF the driver: token
        ranks are joined through the hash exchange (df = in-partition
        group size), records are rebuilt through a rid exchange, and the
        only driver-visible aggregate is the O(partitions) counter sum —
        no iter_batches fold, no np.concatenate of the vocab, no ray.put
        broadcast."""
        import inspect

        from record_linkage_ldu_ray.pipelines.docdedup import jaccard_join_all

        src = inspect.getsource(jaccard_join_all)
        assert "iter_batches" not in src
        assert "ray.put" not in src
        assert "np.concatenate" not in src
