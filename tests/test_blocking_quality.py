"""Blocking-quality audit: closed-form metric checks on a corpus where the
truth is countable by hand, plus pair-chunk invariance."""

import pyarrow as pa

import ray.data


def _docs():
    # two prefix blocks: "aaaa…" (3 docs, all near-identical → 3 true
    # pairs, all covered) and "bbbb…" (2 docs, disjoint tokens → 0 true
    # pairs); one cross-block near-dup pair ("aaaa" vs "cccc") that
    # blocking MISSES.
    texts = [
        "aaaa alpha beta gamma",
        "aaaa alpha beta gamma",
        "aaaa alpha beta gamma delta",
        "bbbb zeta eta",
        "bbbb theta iota kappa",
        "cccc alpha beta gamma",  # true pair with 0/1/2, different block
    ]
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def _run(**kw):
    from record_linkage_ldu_ray.pipelines.docdedup import blocking_quality

    return blocking_quality(ray.data.from_arrow(_docs()), **kw).to_pandas()


class TestBlockingQuality:
    def test_metrics_by_hand(self, ray_session):
        got = _run(key_len=4, tau=0.5)
        assert len(got) == 1
        r = got.iloc[0]
        assert r.n_docs == 6
        # candidates: C(3,2) in "aaaa" + C(2,2→1) in "bbbb" + 0 in "cccc"
        assert r.n_candidate_pairs == 3 + 1
        # true pairs (token-set jaccard ≥ 0.5): (0,1)=1.0, (0,2)=(1,2)=0.75
        # — note tokens include the prefix word, so 5 has j=0.6 with 0/1
        # ({alpha,beta,gamma} shared of {aaaa|cccc,alpha,beta,gamma}) →
        # pairs (0,5),(1,5) at 3/5=0.6 and (2,5) at 3/6=0.5 also true
        assert r.n_true_pairs == 6
        assert r.n_covered_true_pairs == 3  # only the within-"aaaa" three
        assert abs(r.reduction_ratio - (1 - 4 / 15)) < 1e-6
        assert abs(r.pairs_completeness - 0.5) < 1e-6

    def test_chunking_invariance(self, ray_session):
        a = _run(key_len=4, tau=0.5, pair_chunk=2)
        b = _run(key_len=4, tau=0.5, pair_chunk=512)
        assert a.equals(b)

    def test_no_true_pairs_completeness_is_one(self, ray_session):
        got = _run(key_len=4, tau=0.99)
        r = got.iloc[0]
        # only the exact dup (0,1) survives tau=0.99; it shares a block
        assert r.n_true_pairs == 1 and r.n_covered_true_pairs == 1
        assert r.pairs_completeness == 1.0


class TestClusterCohesion:
    def _docs(self):
        texts = [
            "alpha beta gamma delta",       # 0 \ family A: pairwise j known
            "alpha beta gamma delta",       # 1 / (0,1)=1.0
            "alpha beta gamma epsilon",     # 2   (0,2)=(1,2)=3/5=0.6
            "zeta eta theta iota kappa",    # 3   singleton (no match)
        ]
        return pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "source": pa.array(["s0"] * len(texts)),
                "text": pa.array(texts),
            }
        )

    def test_hand_counted(self, ray_session):
        from record_linkage_ldu_ray.pipelines.docdedup import cluster_cohesion_report

        df = cluster_cohesion_report(
            ray.data.from_arrow(self._docs()), n=2, tau=0.05
        ).to_pandas()
        assert len(df) == 1  # one non-singleton cluster (0,1,2)
        r = df.iloc[0]
        assert r.rep_id == 0 and r.n_members == 3 and r.n_pairs == 3
        assert abs(r.min_jaccard - 0.6) < 1e-6
        assert abs(r.avg_jaccard - (1.0 + 0.6 + 0.6) / 3) < 1e-6

    def test_partition_invariance(self, ray_session):
        from record_linkage_ldu_ray.pipelines.docdedup import cluster_cohesion_report

        ds = ray.data.from_arrow(self._docs())
        a = cluster_cohesion_report(ds.repartition(2), num_parts=3).to_pandas()
        b = cluster_cohesion_report(ds.repartition(4), num_parts=7).to_pandas()
        assert a.sort_values("rep_id").reset_index(drop=True).equals(
            b.sort_values("rep_id").reset_index(drop=True)
        )
