"""Deterministic sampling/splitting and vocabulary heavy-hitters."""

import numpy as np
import pyarrow as pa


class TestHashSplit:
    def test_deterministic_and_partition_invariant(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_split

        ids = pa.table({"doc_id": list(range(1000))})
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = (
            hash_split(ray.data.from_arrow(ids), fr)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            hash_split(ray.data.from_arrow(ids).random_shuffle(seed=3).repartition(7), fr)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        frac = a["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.05
        assert abs(frac["val"] - 0.1) < 0.04
        assert abs(frac["test"] - 0.1) < 0.04

    def test_salt_changes_assignment(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_split

        ids = pa.table({"doc_id": list(range(500))})
        fr = {"a": 0.5, "b": 0.5}
        s1 = hash_split(ray.data.from_arrow(ids), fr, salt="x").to_pandas()
        s2 = hash_split(ray.data.from_arrow(ids), fr, salt="y").to_pandas()
        merged = s1.merge(s2, on="doc_id")
        assert (merged["split_x"] != merged["split_y"]).any()


class TestHashModes:
    """hash_fn="fast" (vectorized default) vs hash_fn="md5" (oracle parity)."""

    def test_md5_mode_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_sample

        t = pa.table({"doc_id": list(range(1500))})
        got = (
            hash_sample(ray.data.from_arrow(t), 0.25, salt="sample-v1", hash_fn="md5")
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        thr = format(int(round(0.25 * (1 << 128))), "032x")
        want = duckdb.sql(
            f"SELECT doc_id FROM t WHERE md5('sample-v1' || CAST(doc_id AS VARCHAR))"
            f" < '{thr}' ORDER BY doc_id"
        ).fetchall()
        assert got == [r[0] for r in want]

    def test_fast_mode_partition_invariant_and_uniform(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_split

        ids = pa.table({"doc_id": list(range(4000))})
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = (
            hash_split(ray.data.from_arrow(ids), fr, hash_fn="fast")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            hash_split(
                ray.data.from_arrow(ids).random_shuffle(seed=5).repartition(9),
                fr,
                hash_fn="fast",
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        frac = a["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.03
        assert abs(frac["val"] - 0.1) < 0.03
        assert abs(frac["test"] - 0.1) < 0.03

    def test_fast_mode_nested_and_string_ids(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_sample

        t = pa.table({"doc_id": [f"doc-{i}" for i in range(3000)]})
        big = hash_sample(ray.data.from_arrow(t), 0.4, hash_fn="fast").to_pandas()
        small = hash_sample(ray.data.from_arrow(t), 0.1, hash_fn="fast").to_pandas()
        assert set(small["doc_id"]) <= set(big["doc_id"])
        assert abs(len(big) / 3000 - 0.4) < 0.04
        # int ids hash identically to their string form (str(id) semantics)
        ti = pa.table({"doc_id": list(range(3000))})
        ts = pa.table({"doc_id": [str(i) for i in range(3000)]})
        a = hash_sample(ray.data.from_arrow(ti), 0.3, hash_fn="fast").to_pandas()
        b = hash_sample(ray.data.from_arrow(ts), 0.3, hash_fn="fast").to_pandas()
        assert set(a["doc_id"].astype(str)) == set(b["doc_id"])

    def test_fast_mode_stratified_matches_global_when_single_group(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import (
            hash_sample,
            stratified_hash_sample,
        )

        t = pa.table({"doc_id": list(range(1000)), "source": ["s"] * 1000})
        a = stratified_hash_sample(
            ray.data.from_arrow(t), {"s": 0.2}, hash_fn="fast"
        ).to_pandas()
        b = hash_sample(ray.data.from_arrow(t), 0.2, hash_fn="fast").to_pandas()
        assert set(a["doc_id"]) == set(b["doc_id"])

    def test_bad_mode_rejected(self, ray_session):
        import pytest
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_sample, hash_split

        t = pa.table({"doc_id": [1, 2]})
        with pytest.raises(ValueError):
            hash_split(ray.data.from_arrow(t), {"a": 1.0}, hash_fn="sha9000")
        with pytest.raises(ValueError):
            hash_sample(ray.data.from_arrow(t), 0.5, hash_fn="sha9000")


class TestHashSample:
    def test_subset_and_fraction(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import hash_sample

        t = pa.table({"doc_id": list(range(2000)), "v": list(range(2000))})
        out = hash_sample(ray.data.from_arrow(t), 0.3).to_pandas()
        assert abs(len(out) / 2000 - 0.3) < 0.05
        # sample at a smaller fraction is a strict subset (nested samples)
        sub = hash_sample(ray.data.from_arrow(t), 0.1).to_pandas()
        assert set(sub["doc_id"]) <= set(out["doc_id"])


class TestTfidfTopTerms:
    def test_matches_bruteforce(self, ray_session):
        import collections
        import math

        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import tfidf_top_terms

        texts = {
            1: "apple banana apple cherry",
            2: "banana banana date",
            3: "apple cherry cherry cherry egg",
            4: "fig",
        }
        docs = pa.table({"doc_id": list(texts), "text": list(texts.values())})
        out = (
            tfidf_top_terms(ray.data.from_arrow(docs).repartition(2), k=2)
            .to_pandas()
            .sort_values(["doc_id", "tfidf", "token"], ascending=[True, False, True])
            .reset_index(drop=True)
        )

        dfreq: collections.Counter = collections.Counter()
        for s in texts.values():
            dfreq.update(set(s.split()))
        N = len(texts)
        want = []
        for d, s in texts.items():
            tf = collections.Counter(s.split())
            scored = sorted(
                (
                    (tok, c, c * (math.log((1.0 + N) / (1.0 + dfreq[tok])) + 1.0))
                    for tok, c in tf.items()
                ),
                key=lambda x: (-x[2], x[0]),
            )[:2]
            want += [(d, tok, c, round(sc, 6)) for tok, c, sc in scored]
        got = list(
            zip(out["doc_id"], out["token"], out["tf"], out["tfidf"].round(6))
        )
        assert got == want

    def test_min_df_prunes(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import tfidf_top_terms

        docs = pa.table({"doc_id": [1, 2], "text": ["rare shared", "shared"]})
        out = tfidf_top_terms(ray.data.from_arrow(docs), k=5, min_df=2).to_pandas()
        assert set(out["token"]) == {"shared"}


class TestDedupKeepBest:
    def test_longest_wins_then_lowest_id(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import dedup_keep_best

        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": [
                    "Hello  World",      # norm "hello world", L=12
                    "hello world",       # same norm, L=11 → loses on length
                    "HELLO   WORLD ",    # same norm, L=14 → wins
                    "other doc",
                    "Other    Doc",      # norm "other doc", L=12 → wins
                    "unique",
                ],
            }
        )
        out = (
            dedup_keep_best(ray.data.from_arrow(docs).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [3, 5, 6]
        assert out["n_dups"].tolist() == [3, 2, 1]

    def test_id_tiebreak_across_batches(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import dedup_keep_best

        # equal lengths → lowest id wins, regardless of batch placement
        docs = pa.table({"doc_id": [9, 2, 5], "text": ["same txt", "Same Txt", "SAME TXT"]})
        out = dedup_keep_best(ray.data.from_arrow(docs).repartition(3)).to_pandas()
        assert out["doc_id"].tolist() == [2]
        assert out["n_dups"].tolist() == [3]


class TestSourceLengthQuantiles:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import source_length_quantiles

        rng = np.random.default_rng(17)
        n = 600
        srcs = [f"s{int(i)}" for i in rng.integers(0, 5, n)]
        texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 120, n)]
        docs = pa.table({"doc_id": list(range(n)), "source": srcs, "text": texts})
        out = (
            source_length_quantiles(ray.data.from_arrow(docs).repartition(8))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        lens: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            lens.setdefault(s, []).append(len(t.split()))
        for _, row in out.iterrows():
            vals = np.sort(lens[row["source"]])
            N = len(vals)
            assert row["n_docs"] == N
            for p, col in ((0.5, "p50_words"), (0.9, "p90_words"), (0.99, "p99_words")):
                want = vals[max(1, int(np.ceil(np.float64(p) * N))) - 1]
                assert row[col] == want, (row["source"], col)


class TestDistinctTokens:
    def _corpus(self, n_docs: int, vocab: int, seed: int = 31):
        rng = np.random.default_rng(seed)
        texts = [
            " ".join(f"tok{v}" for v in rng.integers(0, vocab, 40))
            for _ in range(n_docs)
        ]
        return pa.table(
            {
                "doc_id": list(range(n_docs)),
                "source": [f"s{i % 2}" for i in range(n_docs)],
                "text": texts,
            }
        )

    def test_exact_matches_bruteforce(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import distinct_tokens_exact

        docs = self._corpus(200, 500)
        out = distinct_tokens_exact(ray.data.from_arrow(docs).repartition(5))
        got = dict(zip(out["source"].to_pylist(), out["n_distinct"].to_pylist()))
        truth: dict[str, set] = {}
        for s, t in zip(docs["source"].to_pylist(), docs["text"].to_pylist()):
            truth.setdefault(s, set()).update(t.split())
        assert got == {s: len(v) for s, v in truth.items()}

    def test_hll_within_5pct_and_partition_invariant(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import distinct_tokens_hll

        docs = self._corpus(1500, 60_000, seed=7)
        truth: dict[str, set] = {}
        for s, t in zip(docs["source"].to_pylist(), docs["text"].to_pylist()):
            truth.setdefault(s, set()).update(t.split())

        a = distinct_tokens_hll(ray.data.from_arrow(docs).repartition(3)).to_pandas()
        b = distinct_tokens_hll(ray.data.from_arrow(docs).repartition(11)).to_pandas()
        ga = dict(zip(a["source"], a["n_distinct_est"]))
        gb = dict(zip(b["source"], b["n_distinct_est"]))
        assert ga == gb  # register max-merge is associative → batching-invariant
        for s, v in truth.items():
            assert abs(ga[s] - len(v)) / len(v) < 0.05, (s, ga[s], len(v))


class TestRedactPii:
    def test_redactions_and_counts(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import redact_pii

        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "mail a.b+c@x-y.org and d@e.io now",
                    "server 192.168.0.1 called +44 20 7946 0958 twice",
                    "clean text only",
                ],
            }
        )
        out = redact_pii(ray.data.from_arrow(docs)).to_pandas().sort_values("doc_id")
        assert out["text_redacted"].tolist() == [
            "mail <EMAIL> and <EMAIL> now",
            "server <IP> called <PHONE> twice",
            "clean text only",
        ]
        assert out["n_emails"].tolist() == [2, 0, 0]
        assert out["n_ips"].tolist() == [0, 1, 0]
        assert out["n_phones"].tolist() == [0, 1, 0]


class TestStratifiedHashSample:
    def test_per_group_fractions(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import stratified_hash_sample

        n = 3000
        t = pa.table(
            {
                "doc_id": list(range(n)),
                "source": [f"g{i % 3}" for i in range(n)],
            }
        )
        out = stratified_hash_sample(
            ray.data.from_arrow(t), {"g0": 1.0, "g1": 0.5}, default=0.0
        ).to_pandas()
        counts = out["source"].value_counts()
        assert counts["g0"] == 1000          # fraction 1.0 keeps every row
        assert abs(counts.get("g1", 0) / 1000 - 0.5) < 0.06
        assert "g2" not in counts.index      # unknown group → default 0.0

    def test_nested_with_global_sample(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.sampling import (
            hash_sample,
            stratified_hash_sample,
        )

        t = pa.table({"doc_id": list(range(1000)), "source": ["s"] * 1000})
        a = stratified_hash_sample(ray.data.from_arrow(t), {"s": 0.2}).to_pandas()
        b = hash_sample(ray.data.from_arrow(t), 0.2).to_pandas()
        assert set(a["doc_id"]) == set(b["doc_id"])


class TestPackDocuments:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import pack_documents

        rng = np.random.default_rng(23)
        n = 200
        srcs = [f"s{int(i)}" for i in rng.integers(0, 3, n)]
        lens = rng.integers(1, 40, n)
        docs = pa.table(
            {
                "doc_id": list(range(n)),
                "source": srcs,
                "text": [" ".join(["w"] * int(k)) for k in lens],
            }
        )
        out = (
            pack_documents(ray.data.from_arrow(docs).repartition(5), budget_words=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        cum: dict[str, int] = {}
        for i in range(n):
            s = srcs[i]
            before = cum.get(s, 0)
            assert out.loc[i, "bin_id"] == before // 50, i
            assert out.loc[i, "n_words"] == lens[i]
            cum[s] = before + int(lens[i])

    def test_bins_monotone_within_group(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import pack_documents

        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "source": ["a"] * 4,
                "text": ["w " * 30, "w " * 30, "w " * 30, "w"],
            }
        )
        out = (
            pack_documents(ray.data.from_arrow(docs), budget_words=50)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["bin_id"].tolist() == [0, 0, 1, 1]


class TestCrossSourceOverlap:
    def test_flags_only_multisource_texts(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import cross_source_overlap

        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "text": ["leak", "leak", "leak", "clean", "clean", "solo"],
                "source": ["train", "test", "val", "train", "train", "test"],
            }
        )
        out = (
            cross_source_overlap(ray.data.from_arrow(docs).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # "leak" spans 3 sources → rows 1,2,3; "clean" is twice in ONE
        # source (not contamination); "solo" unique
        assert out["doc_id"].tolist() == [1, 2, 3]
        assert out["n_sources"].tolist() == [3, 3, 3]


class TestFilterShortDocs:
    def test_per_group_median_cutoff(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import filter_short_docs

        docs = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "source": ["a", "a", "a", "b", "b", "b"],
                "text": ["w", "w w", "w w w", "x " * 10, "x " * 20, "x " * 30],
            }
        )
        out = (
            filter_short_docs(ray.data.from_arrow(docs).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # medians: a → 2 words, b → 20 words; keep n_words >= median
        assert out["doc_id"].tolist() == [2, 3, 5, 6]
        assert out["n_words"].tolist() == [2, 3, 20, 30]


class TestVocabTopTokens:
    def test_counts_and_tiebreak(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import vocab_top_tokens

        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["b a a", "a  b\tc", None],
            }
        )
        out = vocab_top_tokens(ray.data.from_arrow(docs), k=2, num_parts=4)
        df = out.to_pandas()
        # a: 3 occurrences over 2 docs; b and c tie at lower counts → 'b' wins
        assert df["token"].tolist() == ["a", "b"]
        assert df["n_occurrences"].tolist() == [3, 2]
        assert df["n_docs"].tolist() == [2, 2]

    def test_matches_bruteforce(self, ray_session):
        import collections

        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import vocab_top_tokens

        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(40)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
            for _ in range(300)
        ]
        docs = pa.table({"doc_id": list(range(300)), "text": texts})
        out = vocab_top_tokens(ray.data.from_arrow(docs).repartition(6), k=10).to_pandas()

        occ: collections.Counter = collections.Counter()
        dfreq: collections.Counter = collections.Counter()
        for s in texts:
            ws = s.split()
            occ.update(ws)
            dfreq.update(set(ws))
        want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(zip(out["token"], out["n_occurrences"])) == want
        assert out["n_docs"].tolist() == [dfreq[t] for t, _ in want]


class TestDecontaminateNgrams:
    def test_planted_overlap_flagged(self, ray_session, tmp_path):
        """Corpus docs that copy an 8-gram from a benchmark doc must be
        flagged with the exact distinct-gram hit count; clean docs and
        docs shorter than n tokens must report 0 hits."""
        import pyarrow.parquet as pq

        from record_linkage_ldu_ray.pipelines.docdedup import decontaminate_ngrams

        bench_text = " ".join(f"b{i}" for i in range(20))  # doc_id 0 (0 % 25 == 0)
        gram = " ".join(f"b{i}" for i in range(8))  # bench 8-gram b0..b7
        rows = {
            0: bench_text,
            1: "clean " + " ".join(f"c{i}" for i in range(30)),
            2: f"prefix {gram} suffix " + " ".join(f"d{i}" for i in range(10)),
            3: f"{gram} and {gram}",  # duplicated gram counts ONCE (distinct)
            4: "tiny doc under n tokens",
        }
        t = pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "text": pa.array(list(rows.values())),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["src0"] * len(rows)),
                "n_chars": pa.array([len(v) for v in rows.values()], pa.int64()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/documents.parquet")

        got = (
            decontaminate_ngrams(str(d))
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        assert list(got.index) == [1, 2, 3, 4]  # bench doc 0 excluded
        assert got.loc[1, "n_hits"] == 0 and not got.loc[1, "contaminated"]
        # doc 2 contains b0..b7 → exactly 1 distinct bench gram
        assert got.loc[2, "n_hits"] == 1 and got.loc[2, "contaminated"]
        # doc 3: the same gram twice plus overlap grams crossing "and":
        # only grams fully inside a b0..b7 run match the bench set → window
        # b0..b7 occurs (distinct) once; crossing grams contain "and"/"b0.."
        # tokens in bench order? bench grams are all 8-windows of b0..b19,
        # so e.g. "b1..b7 and" is NOT a bench gram but "b0..b7" is; distinct
        # hit count is 1
        assert got.loc[3, "n_hits"] == 1 and got.loc[3, "contaminated"]
        assert got.loc[4, "n_hits"] == 0 and not got.loc[4, "contaminated"]


class TestRepetitionScores:
    def test_edge_cases_and_counts(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import repetition_scores

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "",  # no tokens → all fracs 0
                        "solo",  # 1 token → no 2-grams
                        "a a a a",  # 4 tokens, 1 distinct; 3 identical 2-grams
                        "x y x y x",  # grams: xy yx xy yx → top 2/4, distinct 2/4
                        "all distinct words here now",
                    ]
                ),
            }
        )
        got = (
            repetition_scores(ray.data.from_arrow(t))
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        assert got.loc[0, "n_tokens"] == 0 and got.loc[0, "dup_token_frac"] == 0.0
        assert got.loc[1, "n_tokens"] == 1 and got.loc[1, "top_2gram_frac"] == 0.0
        assert got.loc[2, "dup_token_frac"] == 1.0 - 1 / 4
        assert got.loc[2, "dup_2gram_frac"] == 1.0 - 1 / 3
        assert got.loc[2, "top_2gram_frac"] == 1.0
        assert got.loc[3, "dup_2gram_frac"] == 0.5
        assert got.loc[3, "top_2gram_frac"] == 0.5
        assert got.loc[4, "dup_token_frac"] == 0.0
        assert got.loc[4, "dup_2gram_frac"] == 0.0
        assert got.loc[4, "top_2gram_frac"] == 1 / 4


class TestValueQuantileSketch:
    def test_rank_accuracy_and_partition_invariance(self, ray_session, tmp_path):
        """The bottom-k sample sketch must (a) estimate quantiles within
        rank error a few × 1/√k and (b) return BIT-IDENTICAL output under a
        different input partitioning (the mergeability contract)."""
        import pyarrow.parquet as pq

        from record_linkage_ldu_ray.pipelines.textstats import value_quantile_sketch

        rng = np.random.default_rng(23)
        n = 20000
        vals = np.round(rng.exponential(40, n), 2)  # skewed like real values
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
                "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                "event_type": pa.array(rng.choice(["click", "view"], n)),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * n),
            }
        )
        d1 = tmp_path / "one"
        d1.mkdir()
        pq.write_table(t, f"{d1}/events.parquet")
        d2 = tmp_path / "many"
        d2.mkdir()
        # same rows, 8 row-groups → different block structure
        pq.write_table(t, f"{d2}/events.parquet", row_group_size=n // 8)

        a = value_quantile_sketch(str(d1)).to_pandas()
        b = value_quantile_sketch(str(d2)).to_pandas()
        assert a.equals(b), "sketch must be partition-invariant"

        df = t.to_pandas()
        for et in ("click", "view"):
            sub = np.sort(df[df.event_type == et]["value"].to_numpy())
            row = a[a.event_type == et].iloc[0]
            for q, col in ((0.5, "q50_est"), (0.9, "q90_est"), (0.99, "q99_est")):
                est = row[col]
                true_rank = np.searchsorted(sub, est, side="right") / len(sub)
                assert abs(true_rank - q) < 0.08, (et, q, est, true_rank)


class TestQuantileSketchVsSqlExact:
    def test_rank_error_vs_duckdb_quantile_disc_both_sfs(self, ray_session):
        """The bottom-k sample sketch's estimates must sit within the
        O(1/√k) rank-error bound of DuckDB's EXACT per-group
        ``quantile_disc`` on the same parquet input, at BOTH driver sf
        levels (VERDICT r2 #8 — the SQL-exact cross-check for the
        rows-only sketch query)."""
        import duckdb

        from record_linkage_ldu_ray.pipelines.textstats import value_quantile_sketch

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            got = value_quantile_sketch(sf).to_pandas().set_index("event_type")
            con = duckdb.connect()
            exact = con.sql(
                f"""
                SELECT event_type,
                       quantile_disc(value, 0.5)  AS q50,
                       quantile_disc(value, 0.9)  AS q90,
                       quantile_disc(value, 0.99) AS q99,
                       list(value ORDER BY value) AS vals
                FROM '{sf}/events.parquet'
                GROUP BY event_type
                """
            ).df().set_index("event_type")
            con.close()
            assert set(got.index) == set(exact.index)
            # k=512 bottom-k sample: rank error a few × 1/√k ≈ 0.044
            bound = 0.08
            for et in exact.index:
                vals = np.asarray(exact.loc[et, "vals"], dtype=np.float64)
                n = len(vals)
                for q, col, ecol in (
                    (0.5, "q50_est", "q50"),
                    (0.9, "q90_est", "q90"),
                    (0.99, "q99_est", "q99"),
                ):
                    est = got.loc[et, col]
                    rank_est = np.searchsorted(vals, est, side="right") / n
                    rank_exact = np.searchsorted(vals, exact.loc[et, ecol], side="right") / n
                    # estimate's rank within bound of the EXACT value's rank
                    assert abs(rank_est - rank_exact) < bound, (sf, et, q, est)
                    assert abs(rank_est - q) < bound, (sf, et, q, est, rank_est)


class TestVocabCoverage:
    def test_boundary_and_empty_docs(self, ray_session):
        """Tokens outside the top-V vocabulary lower coverage; empty docs
        score 0.0; fully-in-vocab docs score 1.0."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import vocab_coverage_scores

        # 'hot' appears 6×, 'warm' 3×, 'rare'/'odd' once each → top-2 vocab
        # is {hot, warm}
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "hot hot hot warm",
                        "hot warm rare odd",
                        "",
                        "hot hot hot warm",
                    ]
                ),
            }
        )
        got = (
            vocab_coverage_scores(ray.data.from_arrow(t), top_v=2)
            .to_pandas()
            .set_index("doc_id")
        )
        assert got.loc[0, "vocab_coverage"] == 1.0
        assert got.loc[1, "vocab_coverage"] == 0.5
        assert got.loc[2, "n_tokens"] == 0 and got.loc[2, "vocab_coverage"] == 0.0
        assert got.loc[3, "n_in_vocab"] == 4


class TestRemoveBoilerplateTurns:
    def test_planted_boilerplate_dropped(self, ray_session, tmp_path):
        """A turn text planted across many docs must be dropped everywhere;
        unique turns survive with their (conv_id, turn_idx) intact."""
        import pyarrow.parquet as pq

        from record_linkage_ldu_ray.pipelines.docdedup import remove_boilerplate_turns

        boiler = " ".join(f"b{i}" for i in range(8))  # one full 8-token turn
        texts = []
        for d in range(6):
            uniq = " ".join(f"u{d}x{i}" for i in range(8))
            # turn 0 = boilerplate (shared by all docs), turn 1 = unique
            texts.append(boiler + " " + uniq)
        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 6),
                "source": pa.array(["src0"] * 6),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/documents.parquet")

        got = remove_boilerplate_turns(str(d), max_df=2).to_pandas()
        assert (got["turn_idx"] == 1).all()  # every boilerplate turn dropped
        assert len(got) == 6  # each doc keeps its unique turn
        assert not got["text"].str.startswith("b0").any()


class TestBloomFilter:
    def test_no_false_negatives_and_fpr(self):
        from record_linkage_ldu_ray.functions.bloom import (
            bloom_build,
            bloom_merge,
            bloom_probe,
        )

        rng = np.random.default_rng(29)
        keys = rng.integers(0, 2**63, 4000, dtype=np.uint64)
        other = np.setdiff1d(
            rng.integers(0, 2**63, 60000, dtype=np.uint64), keys
        )
        f = bloom_build(keys, m_bits=1 << 17, k=4)
        assert bloom_probe(f, keys, k=4).all(), "Bloom false negative"
        fpr = bloom_probe(f, other, k=4).mean()
        assert fpr < 0.005, fpr  # theoretical ≈ 0.0004 at n=4k, m=128k, k=4
        # associative merge == single build
        halves = bloom_merge(
            bloom_build(keys[:2000], 1 << 17), bloom_build(keys[2000:], 1 << 17)
        )
        assert (halves == f).all()

    def test_bloom_decontaminate_superset_of_exact(self, ray_session):
        """Bloom-path decontamination must flag every doc the exact path
        flags (no false negatives); over-flagging is bounded by the FPR."""
        from record_linkage_ldu_ray.pipelines.docdedup import decontaminate_ngrams

        sf = "/root/testdata/sf0.001"
        exact = decontaminate_ngrams(sf).to_pandas().set_index("doc_id")
        bloom = (
            decontaminate_ngrams(sf, use_bloom=True).to_pandas().set_index("doc_id")
        )
        assert set(exact.index) == set(bloom.index)
        flagged_exact = set(exact[exact.contaminated].index)
        flagged_bloom = set(bloom[bloom.contaminated].index)
        assert flagged_exact <= flagged_bloom
        extra = len(flagged_bloom - flagged_exact)
        assert extra <= max(2, int(0.01 * len(exact))), extra


class TestCountMinSketch:
    def test_one_sided_error_merge_and_bound(self):
        from record_linkage_ldu_ray.functions.countmin import (
            cms_build,
            cms_estimate,
            cms_merge,
        )

        rng = np.random.default_rng(37)
        # zipf-ish stream over a vocabulary much larger than w forces
        # collisions → exercises the overestimate bound
        keys = rng.zipf(1.3, 200000).astype(np.uint64)
        uh, true = np.unique(keys, return_counts=True)
        m = cms_build(keys, d=4, w=1 << 10)
        est = cms_estimate(m, uh)
        assert (est >= true).all(), "CMS must never underestimate"
        n = len(keys)
        bound = 2 * n / (1 << 10)
        frac_within = ((est - true) <= bound).mean()
        assert frac_within > 0.9, frac_within  # expected ≥ 1-(1/2)^4 ≈ 0.94
        halves = cms_merge(
            cms_build(keys[:100000], d=4, w=1 << 10),
            cms_build(keys[100000:], d=4, w=1 << 10),
        )
        assert (halves == m).all(), "merge must equal single-pass build"

    def test_token_freq_cms_query(self, ray_session):
        from record_linkage_ldu_ray.pipelines.textstats import token_freq_cms

        r = token_freq_cms("/root/testdata/sf0.001").to_pandas()
        assert len(r) == 20
        assert (r["cms_estimate"] >= r["n_occurrences"]).all()
        n_total = r["n_occurrences"].sum()  # lower bound on stream size N
        assert ((r["cms_estimate"] - r["n_occurrences"]) <= 2 * 30000 / (1 << 14)).all()


class TestTopSimilarPairs:
    def test_k_rows_descending_deterministic(self, ray_session):
        from record_linkage_ldu_ray.pipelines.docdedup import top_similar_pairs

        r = top_similar_pairs("/root/testdata/sf0.001", k=25).to_pandas()
        assert len(r) == 25
        j = r["jaccard"].to_numpy()
        assert (j[:-1] >= j[1:]).all(), "must be sorted by similarity DESC"
        assert (r["doc_id_a"] < r["doc_id_b"]).all()


class TestChunkDocuments:
    def test_stride_overlap_and_edges(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import chunk_documents

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        " ".join(f"t{i}" for i in range(30)),  # 30 toks → 3 chunks
                        "short doc",  # 2 toks → 1 partial chunk
                        "",  # empty → 1 empty chunk (start 0)
                    ]
                ),
            }
        )
        got = (
            chunk_documents(ray.data.from_arrow(t), chunk_tokens=16, stride=12)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        d0 = got[got.doc_id == 0]
        assert list(d0["chunk_idx"]) == [0, 1, 2]
        assert list(d0["n_chunk_tokens"]) == [16, 16, 6]  # 30-24=6 tail kept
        # overlap: chunk 1 starts at token 12, so tokens 12..15 repeat
        assert d0.iloc[0]["chunk"].split()[12:16] == d0.iloc[1]["chunk"].split()[0:4]
        assert got[got.doc_id == 1]["n_chunk_tokens"].tolist() == [2]
        assert got[got.doc_id == 2]["n_chunk_tokens"].tolist() == [0]


class TestCurateDocuments:
    def test_stages_compose(self, ray_session, tmp_path):
        """Duplicates collapse to the lowest id, short docs drop, bench
        docs and contaminated docs drop, survivors get a split label."""
        import pyarrow.parquet as pq

        from record_linkage_ldu_ray.pipelines.docdedup import curate_documents

        bench_text = " ".join(f"w{i}" for i in range(40))
        long = " ".join(f"v{i}" for i in range(40))  # token-disjoint from bench
        gram = " ".join(f"w{i}" for i in range(8))  # shared with bench doc 0
        rows = {
            0: bench_text,  # bench doc (0 % 25 == 0) → excluded
            1: "dup " + long,  # survivor
            2: "dup " + long,  # exact duplicate of 1 → dropped (higher id)
            3: "too short",  # length filter
            4: gram + " " + " ".join(f"z{i}" for i in range(40)),  # contaminated
            5: " ".join(f"u{i}" for i in range(35)),  # clean survivor
        }
        t = pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "text": pa.array(list(rows.values())),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["src0"] * len(rows)),
                "n_chars": pa.array([len(v) for v in rows.values()], pa.int64()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/documents.parquet")

        got = curate_documents(str(d)).to_pandas().sort_values("doc_id")
        assert list(got["doc_id"]) == [1, 5]
        assert set(got["split"]) <= {"train", "val", "test"}
        assert got.set_index("doc_id").loc[1, "n_tokens"] == 41


class TestWriteCuratedShards:
    def test_partitioned_layout_roundtrip(self, ray_session, tmp_path):
        """The sink must produce one hive directory per split and the
        re-read rows must equal the in-memory curation result."""
        import os

        import pyarrow.dataset as pads

        from record_linkage_ldu_ray.pipelines.docdedup import (
            curate_documents,
            write_curated_shards,
        )

        sf = "/root/testdata/sf0.001"
        out = str(tmp_path / "shards")
        counts = write_curated_shards(sf, out).to_pandas().set_index("split")

        subdirs = sorted(p for p in os.listdir(out) if p.startswith("split="))
        assert subdirs == ["split=test", "split=train", "split=val"]

        want = curate_documents(sf).to_pandas()
        assert counts["n_docs"].sum() == len(want)
        for s in ("train", "val", "test"):
            assert counts.loc[s, "n_docs"] == (want["split"] == s).sum()

        back = (
            pads.dataset(out, partitioning="hive")
            .to_table()
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        w = want.sort_values("doc_id").reset_index(drop=True)
        assert (back["doc_id"].to_numpy() == w["doc_id"].to_numpy()).all()
        assert (back["n_tokens"].to_numpy() == w["n_tokens"].to_numpy()).all()
        assert (back["split"].astype(str).to_numpy() == w["split"].to_numpy()).all()


class TestEmptyDocInputs:
    def test_doc_ops_on_empty_corpus(self, ray_session, tmp_path):
        """Every document operator must survive a 0-row documents table."""
        import pyarrow.parquet as pq

        from record_linkage_ldu_ray.pipelines.docdedup import (
            curate_documents,
            decontaminate_ngrams,
            remove_boilerplate_turns,
            top_similar_pairs,
        )
        from record_linkage_ldu_ray.pipelines.textstats import token_freq_cms

        d = tmp_path / "sf"
        d.mkdir()
        sch = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        )
        pq.write_table(sch.empty_table(), f"{d}/documents.parquet")
        assert decontaminate_ngrams(str(d)).count() == 0
        assert remove_boilerplate_turns(str(d)).count() == 0
        assert len(top_similar_pairs(str(d))) == 0
        assert curate_documents(str(d)).count() == 0
        assert len(token_freq_cms(str(d))) == 0
