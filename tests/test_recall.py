"""Quantitative recall gates for the sketch-based dedup/search operators —
the operators with no SQL oracle get their correctness pinned against
exact brute-force computation instead (VERDICT r1 #6).

All inputs are the deterministic sf0.001 documents/embeddings tables, so
the asserted bounds are stable across runs and cluster sizes.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _pairs_set(df, a="doc_id_a", b="doc_id_b"):
    return set(zip(df[a].tolist(), df[b].tolist()))


class TestSimhashRecall:
    def test_banded_candidates_equal_bruteforce(self, docs_ds):
        """4×16-bit pigeonhole bands guarantee EVERY pair within Hamming ≤ 3
        shares at least one exact band — so the banded pipeline must emit
        exactly the brute-force hamming ≤ 3 pair set."""
        from record_linkage_ldu_ray.pipelines.docdedup import (
            simhash_dup_pairs,
            simhash_signatures,
        )

        got = simhash_dup_pairs(docs_ds, max_hamming=3).to_pandas()
        sigs = simhash_signatures(docs_ds).to_pandas().sort_values("doc_id")
        ids = sigs["doc_id"].to_numpy()
        s = sigs["simhash"].to_numpy().astype(np.uint64)
        x = s[:, None] ^ s[None, :]
        ham = np.zeros(x.shape, np.int32)
        for k in range(64):
            ham += ((x >> np.uint64(k)) & np.uint64(1)).astype(np.int32)
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = ham[iu, ju] <= 3
        exp = set(zip(ids[iu[hit]].tolist(), ids[ju[hit]].tolist()))
        assert _pairs_set(got) == exp
        # and each pair exactly once (first-matching-band dedup)
        assert len(got) == len(_pairs_set(got))


class TestMinHashLshRecall:
    def test_recall_and_precision_vs_exact_shingle_jaccard(self, docs_ds):
        """LSH candidates versus the EXACT shingle-set Jaccard it sketches:
        high-similarity pairs must be found (recall), and everything
        emitted must be genuinely similar (estimate sanity)."""
        from record_linkage_ldu_ray.functions.sim import jaccard_sorted_u64
        from record_linkage_ldu_ray.pipelines.docdedup import (
            _shingle_hashes,
            minhash_lsh_dup_pairs,
        )

        tau = 0.7
        got = minhash_lsh_dup_pairs(docs_ds, tau=tau).to_pandas()
        got_pairs = _pairs_set(got)
        assert len(got) == len(got_pairs)  # banded dedup exact

        tbl = pa.concat_tables(
            [x for r in docs_ds.to_arrow_refs() if len(x := __import__("ray").get(r))]
        )
        order = np.argsort(tbl["doc_id"].to_numpy())
        texts = tbl["text"].take(pa.array(order)).combine_chunks()
        ids = tbl["doc_id"].to_numpy()[order]
        sh, offs = _shingle_hashes(texts, 3)
        n = len(ids)
        exact = {}
        for i in range(n):
            a = sh[offs[i] : offs[i + 1]]
            if not len(a):
                continue
            for j in range(i + 1, n):
                b = sh[offs[j] : offs[j + 1]]
                if not len(b):
                    continue
                jac = jaccard_sorted_u64(a, b)
                if jac >= 0.5:
                    exact[(int(ids[i]), int(ids[j]))] = jac
        strong = {p for p, jac in exact.items() if jac >= 0.85}
        if strong:
            recall = len(strong & got_pairs) / len(strong)
            assert recall >= 0.9, (recall, len(strong))
        # no emitted pair is garbage: exact shingle jaccard ≥ 0.5
        for p in got_pairs:
            assert p in exact, p


class TestAnnRecall:
    def _recall_at_k(self, approx, exact, k=10):
        ga = approx.to_pandas().groupby("query_id")["vec_id"].apply(set)
        ge = exact.to_pandas().groupby("query_id")["vec_id"].apply(set)
        recalls = [
            len(ga.get(q, set()) & ge[q]) / len(ge[q]) for q in ge.index
        ]
        return float(np.mean(recalls))

    def test_lsh_topk_recall(self, emb_ds):
        """Multiprobe (hamming ≤ 2) recall on the sf0.001 embeddings —
        measured 0.637 with the Rademacher splitmix64 planes (0.625 with
        the earlier Gaussian planes; exact-bucket matching alone measured
        0.125 — these synthetic vectors are weakly correlated: max
        pairwise cosine < 0.5, so sign-LSH is inherently at its limit)."""
        from record_linkage_ldu_ray.pipelines.ann import (
            brute_force_topk,
            load_queries,
            lsh_topk,
        )

        qmat, qids = load_queries(emb_ds, num_queries=8)
        exact = brute_force_topk(emb_ds, qmat, qids, k=10)
        approx = lsh_topk(emb_ds, qmat, qids, k=10, n_bits=6, probe_hamming=2)
        assert self._recall_at_k(approx, exact) >= 0.6

    def test_ivf_topk_recall_beats_lsh(self, emb_ds):
        """The trained-quantizer path: recall@10 vs exact must clear a
        higher bar than the random-hyperplane buckets (LSH multiprobe
        measures 0.637 above).  With the SQL-replayable deterministic
        quantizer (best-of-8 splitmix restarts), recall at the nprobe=6/16
        operating point measures 0.738 on sf0.001 and 0.775 on sf0.01 —
        the earlier documented 0.8 at nprobe=4 was a single lucky PCG64
        init draw (the distribution over uniform draws at nprobe=4
        centers near 0.65); the oracle-exact quantizer trades that tail
        draw for bit-reproducibility and probes two more cells."""
        from record_linkage_ldu_ray.pipelines.ann import (
            brute_force_topk,
            ivf_topk,
            kmeans_centroids,
            load_queries,
        )

        qmat, qids = load_queries(emb_ds, num_queries=8)
        cents = kmeans_centroids(emb_ds, n_cells=16)
        exact = brute_force_topk(emb_ds, qmat, qids, k=10)
        approx = ivf_topk(emb_ds, qmat, qids, cents, k=10, nprobe=6)
        assert self._recall_at_k(approx, exact) >= 0.7

    def test_kmeans_deterministic(self, emb_ds):
        from record_linkage_ldu_ray.pipelines.ann import kmeans_centroids

        c1 = kmeans_centroids(emb_ds, n_cells=8)
        c2 = kmeans_centroids(emb_ds, n_cells=8)
        assert np.array_equal(c1, c2)

    def _clustered_corpus(self):
        """256 vectors in 4 well-separated clusters, ids assigned so the
        LOW id range (0..63) is entirely cluster 0 — the sharded-corpus
        shape where an ``id < sample_size`` training sample would see one
        source only."""
        rng = np.random.default_rng(41)
        centers = np.eye(8)[:4]
        vecs, true_cluster = [], []
        for c in range(4):
            pts = centers[c] + rng.normal(0, 0.05, size=(64, 8))
            vecs.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
            true_cluster += [c] * 64
        mat = np.concatenate(vecs)
        return pa.table(
            {
                "vec_id": pa.array(range(256), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float64())
                ),
            }
        ), np.array(true_cluster)

    def test_kmeans_sample_unbiased_on_single_source_low_ids(
        self, ray_session
    ):
        """Regression for the ``id < sample_size`` training sample: with
        ids 0..63 all from one source-cluster, a 64-row sample must still
        see every cluster (hash-min-k is uniform over ids), so the trained
        quantizer separates all four clusters instead of shattering the
        one it saw."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.ann import (
            _as_matrix,
            _unit_rows,
            assign_cells,
            kmeans_centroids,
        )

        tbl, true_cluster = self._clustered_corpus()
        ds = ray.data.from_arrow(tbl)
        cents = kmeans_centroids(ds, n_cells=4, sample_size=64)
        cells = (
            assign_cells(ds, cents)
            .to_pandas()
            .sort_values("vec_id")["cell"]
            .to_numpy()
        )
        # every true cluster lands in ONE cell, and the 4 clusters use 4
        # distinct cells — impossible when training saw only cluster 0
        cell_of = [set(cells[true_cluster == c]) for c in range(4)]
        assert all(len(s) == 1 for s in cell_of), cell_of
        assert len(set().union(*cell_of)) == 4, cell_of
        # and the quantizer actually reconstructs the cluster structure
        mat = _unit_rows(_as_matrix(tbl["embedding"], len(tbl)))
        for c in range(4):
            assert (mat[true_cluster == c] @ cents.T).argmax(axis=1).std() == 0

    def test_kmeans_partition_invariance(self, ray_session):
        """Centroids are a pure function of the data: identical at any
        block layout (the sample is min-k over an id hash, not 'whatever
        rows arrived first')."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.ann import kmeans_centroids

        tbl, _ = self._clustered_corpus()
        ds1 = ray.data.from_arrow(tbl)
        ds2 = ray.data.from_arrow(tbl).repartition(13)
        c1 = kmeans_centroids(ds1, n_cells=4, sample_size=64)
        c2 = kmeans_centroids(ds2, n_cells=4, sample_size=64)
        assert np.array_equal(c1, c2)


class TestEmbeddingIvfDedup:
    def test_ivf_cells_beat_label_blocking_vs_bruteforce(self, emb_ds):
        """Engine-trained IVF cells as the blocking column, gated against
        BRUTE-FORCE all-pairs cosine ≥ tau truth: measured on sf0.001 the
        trained cells recover 27/66 true pairs (0.41) while the dataset's
        own ``label`` column recovers only 5/66 (0.076) — the quantizer
        must stay ≥ 0.35 and strictly better than label blocking."""
        import ray

        from record_linkage_ldu_ray.pipelines.ann import (
            _as_matrix,
            _unit_rows,
            assign_cells,
            kmeans_centroids,
        )
        from record_linkage_ldu_ray.pipelines.docdedup import embedding_dup_pairs

        tau = 0.4
        tbl = pa.concat_tables(
            [x for r in emb_ds.to_arrow_refs() if len(x := ray.get(r))]
        )
        ids = tbl["vec_id"].to_numpy()
        mat = _unit_rows(_as_matrix(tbl["embedding"], len(tbl)))
        cos = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = cos[iu, ju] >= tau
        truth = {
            (min(a, b), max(a, b))
            for a, b in zip(ids[iu[hit]].tolist(), ids[ju[hit]].tolist())
        }
        assert truth

        cents = kmeans_centroids(emb_ds, n_cells=16)
        by_cell = embedding_dup_pairs(
            assign_cells(emb_ds, cents), tau=tau, block_col="cell"
        ).to_pandas()
        by_label = embedding_dup_pairs(emb_ds, tau=tau, block_col="label").to_pandas()
        cell = _pairs_set(by_cell, "vec_id_a", "vec_id_b")
        label = _pairs_set(by_label, "vec_id_a", "vec_id_b")
        assert cell <= truth and label <= truth  # blocking never invents pairs
        cell_recall = len(cell & truth) / len(truth)
        label_recall = len(label & truth) / len(truth)
        assert cell_recall >= 0.35, (cell_recall, label_recall)
        assert cell_recall > label_recall


class TestFuzzyDedupLsh:
    def test_representative_closure_and_exact_parity(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import fuzzy_dedup_documents_lsh

        # near-dup families: identical texts always share every LSH band
        base = [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten",
            "red orange yellow green blue indigo violet white black grey",
        ]
        rows = []
        did = 0
        for fam, txt in enumerate(base):
            for _ in range(fam + 2):  # family sizes 2, 3, 4
                rows.append((did, txt))
                did += 1
        for i in range(20):  # singletons with distinct shingles
            rows.append((did, f"solo{i} text body word{i} tail{i} more{i} filler{i}"))
            did += 1
        docs = pa.table(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
        out = (
            fuzzy_dedup_documents_lsh(ray.data.from_arrow(docs).repartition(4), tau=0.5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(rows)
        rep = dict(zip(out["doc_id"], out["rep_id"]))
        keep = dict(zip(out["doc_id"], out["keep"]))
        # invariants: keep ⇔ own representative; every rep is itself kept
        for d in rep:
            assert keep[d] == (rep[d] == d)
            assert rep[rep[d]] == rep[d]
        # identical-text families collapse to their min id
        assert rep[0] == rep[1] == 0
        assert rep[2] == rep[3] == rep[4] == 2
        assert rep[5] == rep[6] == rep[7] == rep[8] == 5
        # singletons keep themselves
        for d in range(9, 29):
            assert rep[d] == d


class TestDedupByPairs:
    def test_components_and_representatives(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import dedup_by_pairs

        # components: {1,2,9}, {3,4}, singletons 5..8; note 9>2 bridges to 1
        docs = pa.table({"doc_id": list(range(1, 10)), "text": ["x"] * 9})
        pairs = pa.table(
            {"doc_id_a": [1, 2, 3], "doc_id_b": [2, 9, 4], "jaccard": [1.0, 1.0, 1.0]}
        )
        out = (
            dedup_by_pairs(ray.data.from_arrow(docs), ray.data.from_arrow(pairs))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 9
        rep = dict(zip(out["doc_id"], out["rep_id"]))
        assert rep[1] == rep[2] == rep[9] == 1
        assert rep[3] == rep[4] == 3
        for d in (5, 6, 7, 8):
            assert rep[d] == d
        keep = set(out.loc[out["keep"], "doc_id"])
        assert keep == {1, 3, 5, 6, 7, 8}

    def test_numeric_min_not_lexicographic(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import dedup_by_pairs

        # "10" < "9" lexicographically — zero-padding must give numeric min
        docs = pa.table({"doc_id": [9, 10], "text": ["a", "a"]})
        pairs = pa.table({"doc_id_a": [9], "doc_id_b": [10], "jaccard": [1.0]})
        out = dedup_by_pairs(ray.data.from_arrow(docs), ray.data.from_arrow(pairs)).to_pandas()
        assert set(out["rep_id"]) == {9}


class TestSemanticDedup:
    def test_brute_force_parity_and_closure(self, ray_session):
        """semantic_dedup must equal a brute-force union-find over ALL
        label-blocked pairs with cos >= tau (exact semantics, no
        approximation in the label-blocked mode)."""
        from record_linkage_ldu_ray.pipelines.docdedup import semantic_dedup

        rng = np.random.default_rng(7)
        dim, tau = 16, 0.9
        vecs, labels, vids = [], [], []
        centers = rng.normal(size=(5, dim))
        vid = 100
        for c in range(5):
            for _ in range(6):  # tight families -> within-label dup chains
                vecs.append(centers[c] + rng.normal(scale=0.005, size=dim))
                labels.append(c % 3)  # labels split families across blocks
                vids.append(vid)
                vid += 3  # non-contiguous ids: rep must be numeric min
        for _ in range(15):  # scattered singletons
            vecs.append(rng.normal(size=dim))
            labels.append(int(rng.integers(0, 3)))
            vids.append(vid)
            vid += 3
        mat = np.asarray(vecs, np.float64)
        t = pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "label": pa.array(labels, pa.int32()),
                "embedding": pa.array([list(map(float, v)) for v in mat]),
            }
        )
        out = (
            semantic_dedup(ray.data.from_arrow(t).repartition(5), tau=tau)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        # brute-force ground truth: min-root union-find over exact pairs
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        parent = list(range(len(vids)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        order = np.argsort(vids)  # process in id order; roots stay minimal
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if labels[i] == labels[j] and unit[i] @ unit[j] >= tau:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        lo, hi = (ra, rb) if vids[ra] < vids[rb] else (rb, ra)
                        parent[hi] = lo
        expect = {vids[i]: vids[find(i)] for i in range(len(vids))}
        got = dict(zip(out["vec_id"], out["rep_id"]))
        assert got == expect
        keep = dict(zip(out["vec_id"], out["keep"]))
        for v in got:  # closure: keep <=> own representative, reps kept
            assert keep[v] == (got[v] == v)
            assert got[got[v]] == got[v]
        assert sum(keep.values()) < len(vids)  # families actually collapsed

    def test_ivf_variant_deterministic(self, ray_session, sf_dir):
        """ENGINE-trained-cell SemDeDup (k-means blocks) is a pure function
        of the input at any parallelism: two runs are byte-identical."""
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.ann import assign_cells, kmeans_centroids
        from record_linkage_ldu_ray.pipelines.docdedup import semantic_dedup

        def run(nblocks):
            ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(nblocks)
            cents = kmeans_centroids(ds, n_cells=16)
            return (
                semantic_dedup(assign_cells(ds, cents), tau=0.4, block_col="cell")
                .to_pandas()
                .sort_values("vec_id")
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(run(3), run(8))


class TestMaskDuplicateSpans:
    def test_known_spans_and_partition_invariance(self, ray_session):
        """Tokens covered by an 8-gram shared across >= 2 docs are masked;
        unique text and sub-L docs are untouched; result is identical at
        any partitioning."""
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.docdedup import mask_duplicate_spans

        shared = "s1 s2 s3 s4 s5 s6 s7 s8"  # exactly L=8 tokens
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        f"a1 a2 {shared} a3 a4",
                        f"b1 {shared} b2 b3 b4 b5",
                        "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",  # unique 8-grams
                        "short doc here",  # < L tokens: no grams
                    ],
                    pa.string(),
                ),
            }
        )
        ds = ray.data.from_arrow(docs)
        out = (
            mask_duplicate_spans(ds.repartition(3), L=8, min_df=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = dict(zip(out["doc_id"], out["text_clean"]))
        assert got[1] == "a1 a2 a3 a4"
        assert got[2] == "b1 b2 b3 b4 b5"
        assert got[3] == "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
        assert got[4] == "short doc here"
        nd = dict(zip(out["doc_id"], out["n_dup_tokens"]))
        assert nd[1] == 8 and nd[2] == 8 and nd[3] == 0 and nd[4] == 0
        assert out["n_tokens"].tolist() == [12, 13, 10, 3]

        two = (
            mask_duplicate_spans(ds.repartition(1), L=8, min_df=2, num_parts=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, two)

    def test_overlapping_spans_merge(self, ray_session):
        """Two overlapping duplicated 8-grams cover their union, not 16
        tokens (difference-array coverage, Lee et al. span semantics)."""
        from record_linkage_ldu_ray.pipelines.docdedup import mask_duplicate_spans

        nine = "c1 c2 c3 c4 c5 c6 c7 c8 c9"  # 9 tokens -> two overlapping 8-grams
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([f"x0 {nine} x1", f"y0 y1 {nine}"], pa.string()),
            }
        )
        out = (
            mask_duplicate_spans(ray.data.from_arrow(docs), L=8, min_df=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_dup_tokens"].tolist() == [9, 9]
        assert out["text_clean"].tolist() == ["x0 x1", "y0 y1"]

    def test_keep_first_owner_unmasked(self, ray_session):
        """keep_first=True: the global min (doc_id, pos) occurrence of each
        duplicated gram survives; later occurrences are masked."""
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.docdedup import mask_duplicate_spans

        shared = "s1 s2 s3 s4 s5 s6 s7 s8"
        docs = pa.table(
            {
                "doc_id": pa.array([5, 2, 9], pa.int64()),
                "text": pa.array(
                    [
                        f"a1 {shared} a2",  # doc 5: NOT the owner (2 < 5)
                        f"b1 b2 {shared}",  # doc 2: min doc_id -> owner
                        f"{shared} c1 c2",  # doc 9: masked
                    ],
                    pa.string(),
                ),
            }
        )
        out = (
            mask_duplicate_spans(
                ray.data.from_arrow(docs).repartition(3), L=8, min_df=2, keep_first=True
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = dict(zip(out["doc_id"], out["text_clean"]))
        nd = dict(zip(out["doc_id"], out["n_dup_tokens"]))
        assert got[2] == f"b1 b2 {shared}" and nd[2] == 0  # owner intact
        assert got[5] == "a1 a2" and nd[5] == 8
        assert got[9] == "c1 c2" and nd[9] == 8
        # partition invariance of the distributed owner min
        two = (
            mask_duplicate_spans(
                ray.data.from_arrow(docs).repartition(1),
                L=8,
                min_df=2,
                keep_first=True,
                num_parts=5,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, two)


class TestUnigramLogprob:
    def test_pandas_parity_and_partition_invariance(self, ray_session):
        import math

        import pandas as pd

        from record_linkage_ldu_ray.functions.rounding import round6_scalar
        from record_linkage_ldu_ray.pipelines.textstats import unigram_logprob_scores

        rng = np.random.default_rng(3)
        texts = [
            " ".join(f"t{int(x)}" for x in rng.integers(0, 12, int(rng.integers(1, 30))))
            for _ in range(80)
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(list(range(80)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        ds = ray.data.from_arrow(docs).repartition(7)
        a = (
            unigram_logprob_scores(ds, num_parts=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            unigram_logprob_scores(ds, num_parts=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # ground truth: global unigram distribution over the same corpus
        from collections import Counter

        cnt: Counter = Counter()
        for s in texts:
            cnt.update(s.split(" "))
        N = sum(cnt.values())
        for row in a.itertuples():
            toks = texts[row.doc_id].split(" ")
            exp = round6_scalar(sum(math.log(cnt[t] / N) for t in toks) / len(toks))
            assert abs(row.mean_token_logprob - exp) < 2e-6, (row.doc_id, exp)
        assert (a["mean_token_logprob"] < 0).all()


class TestEmbeddingNeighborStats:
    def test_density_counts_and_isolated_flags(self, ray_session):
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.docdedup import embedding_neighbor_stats

        rng = np.random.default_rng(5)
        dim, tau = 8, 0.9
        vecs, labels, vids = [], [], []
        center = rng.normal(size=dim)
        for i in range(4):  # tight family of 4 in label 0 -> 3 neighbors each
            vecs.append(center + rng.normal(scale=0.002, size=dim))
            labels.append(0)
            vids.append(10 + i)
        for i in range(6):  # isolated scatter in label 0 and 1
            vecs.append(rng.normal(size=dim))
            labels.append(i % 2)
            vids.append(100 + i)
        t = pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "label": pa.array(labels, pa.int32()),
                "embedding": pa.array([[float(x) for x in v] for v in vecs]),
            }
        )
        ds = ray.data.from_arrow(t).repartition(4)
        out = (
            embedding_neighbor_stats(ds, tau=tau)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(vids)
        fam = out[out.vec_id < 100]
        assert (fam.n_neighbors == 3).all() and (~fam.is_isolated).all()
        assert (fam.max_sim > 0.99).all()
        iso = out[out.vec_id >= 100]
        assert (iso.n_neighbors == 0).all() and iso.is_isolated.all()
        assert iso.max_sim.isna().all()
        two = (
            embedding_neighbor_stats(ds, tau=tau, num_parts=5)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, two)


class TestDedupIncrement:
    def test_matches_ties_and_partition_invariance(self, ray_session):
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.docdedup import dedup_increment

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 10, 11, 12], pa.int64()),
                "source": pa.array(["s"] * 6, pa.string()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta",      # corpus 1
                        "alpha beta gamma epsilon",    # corpus 2: same sim to 10 as 1
                        "zeta eta theta iota",         # corpus 3
                        "alpha beta gamma",            # new 10: ties corpus 1 vs 2 -> best=1
                        "zeta eta theta iota",         # new 11: exact dup of 3
                        "unique solo words here",      # new 12: keep
                    ],
                    pa.string(),
                ),
                "is_new": pa.array([0, 0, 0, 1, 1, 1], pa.int8()),
            }
        )
        ds = ray.data.from_arrow(docs).repartition(4)
        out = (
            dedup_increment(ds, tau=0.5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [10, 11, 12]
        r10 = out.iloc[0]
        # jaccard(10, 1) == jaccard(10, 2) == 3/4 -> tie broken to min cid 1
        assert r10.n_corpus_matches == 2 and r10.best_match_id == 1
        assert abs(r10.best_jaccard - 0.75) < 1e-9 and not r10.keep
        r11 = out.iloc[1]
        assert r11.n_corpus_matches == 1 and r11.best_match_id == 3
        assert r11.best_jaccard == 1.0 and not r11.keep
        r12 = out.iloc[2]
        assert r12.n_corpus_matches == 0 and r12.keep
        assert pd.isna(r12.best_match_id) and pd.isna(r12.best_jaccard)

        two = (
            dedup_increment(ds, tau=0.5, num_parts=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, two)
