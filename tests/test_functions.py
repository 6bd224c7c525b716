"""Unit tests for the scalar/vector kernel library (SURVEY §5 plan:
hand-computed cases per kernel)."""

import numpy as np
import pyarrow as pa
import pytest

from record_linkage_ldu_ray.config import BlockingConfig, MinHashConfig, NormalizerConfig
from record_linkage_ldu_ray.functions.hashing import (
    combine_hash_columns,
    fnv1a_hash_strings,
    splitmix64,
)
from record_linkage_ldu_ray.functions.minhash import (
    EMPTY_SENTINEL,
    lsh_band_hashes,
    minhash_segments,
    perm_params,
)
from record_linkage_ldu_ray.functions.sim import (
    hamming_similarity_u64,
    jaccard_sorted_u64,
    jaro_winkler,
    levenshtein_normalized,
    minmax_ratio,
    ngram_jaccard,
    ratcliff_obershelp,
    simhash64,
    simhash_hamming_sim,
    ts_gap_similarity,
)
from record_linkage_ldu_ray.functions.text import (
    extract_digits,
    normalize_text,
    soundex,
    soundex_array,
    strip_float_suffix,
)


class TestNormalizers:
    def test_normalize_text_reference_semantics(self):
        # lower → strip punct → tokenize → stopwords → sort → join
        # (pre_processing.py:48-55 semantics)
        out = normalize_text(pa.array(["Hello, The World! foo", "zeta alpha  beta"]))
        assert out.to_pylist() == ["foo hello world", "alpha beta zeta"]

    def test_nulls_propagate(self):
        out = normalize_text(pa.array(["x", None, ""]))
        assert out.to_pylist() == ["x", None, ""]

    def test_no_sort_variant(self):
        cfg = NormalizerConfig(sort_tokens=False)
        out = normalize_text(pa.array(["Zeta Alpha"]), cfg)
        assert out.to_pylist() == ["zeta alpha"]

    def test_extract_digits(self):
        assert extract_digits(pa.array(["+1 (555) 123-4567", "abc"])).to_pylist() == [
            "15551234567",
            "",
        ]

    def test_strip_float_suffix(self):
        assert strip_float_suffix(pa.array(["123.0", "1.50"])).to_pylist() == ["123", "1.50"]

    def test_soundex(self):
        assert soundex("robert") == soundex("rupert") == "R163"
        assert soundex("ashcraft") == "A226"
        assert soundex("") == ""
        assert list(soundex_array(["robert", "rupert"])) == ["R163", "R163"]


class TestSimilarity:
    def test_jaro_winkler_known(self):
        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
        assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133, abs=1e-3)
        assert jaro_winkler("abc", "abc") == 1.0
        assert jaro_winkler("", "abc") == 0.0
        assert jaro_winkler("", "") == 1.0

    def test_levenshtein_brute_force(self):
        import random

        def lev_ref(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                ndp = [i]
                for j, cb in enumerate(b, 1):
                    ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (ca != cb)))
                dp = ndp
            return dp[-1]

        rng = random.Random(7)
        for _ in range(100):
            a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
            b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
            if a == b:
                exp = 1.0
            elif not a or not b:
                exp = 0.0
            else:
                exp = 1 - lev_ref(a, b) / max(len(a), len(b))
            assert levenshtein_normalized(a, b) == pytest.approx(exp)

    def test_ratcliff(self):
        assert ratcliff_obershelp("abc", "abc") == 1.0
        assert ratcliff_obershelp("", "") == 1.0
        assert ratcliff_obershelp("a", "") == 0.0

    def test_jaccard_sorted(self):
        a = np.array([1, 2, 3, 4], dtype=np.uint64)
        b = np.array([3, 4, 5, 6], dtype=np.uint64)
        assert jaccard_sorted_u64(a, b) == pytest.approx(2 / 6)
        assert jaccard_sorted_u64(a, a) == 1.0
        assert jaccard_sorted_u64(np.empty(0, np.uint64), a) == 0.0
        assert jaccard_sorted_u64(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 1.0

    def test_ngram_jaccard(self):
        assert ngram_jaccard("abcdef", "abcdef") == 1.0
        assert 0 < ngram_jaccard("abcdef", "abcxef") < 1

    def test_ts_gap(self):
        out = ts_gap_similarity(np.array([0.0, 7.0]), tau=7.0)
        assert out[0] == 1.0 and out[1] == pytest.approx(np.exp(-1))

    def test_minmax_ratio(self):
        out = minmax_ratio(np.array([2, 0, 5]), np.array([4, 0, 5]))
        assert list(out) == [0.5, 1.0, 1.0]

    def test_simhash(self):
        h = fnv1a_hash_strings(pa.array([f"t{i}" for i in range(50)]))
        s1 = simhash64(h)
        s2 = simhash64(np.concatenate([h[:45], fnv1a_hash_strings(pa.array(["x1", "x2"]))]))
        assert simhash_hamming_sim(s1, s1) == 1.0
        assert simhash_hamming_sim(s1, s2) > 0.7


class TestHashing:
    def test_deterministic_across_calls(self):
        a = pa.array(["alpha", "beta", ""])
        assert (fnv1a_hash_strings(a, 3) == fnv1a_hash_strings(a, 3)).all()
        assert (fnv1a_hash_strings(a, 3) != fnv1a_hash_strings(a, 4)).any()

    def test_chunked_and_python_inputs(self):
        ch = pa.chunked_array([pa.array(["a"]), pa.array(["b"])])
        assert len(fnv1a_hash_strings(ch)) == 2
        assert len(fnv1a_hash_strings(["a", "b"])) == 2

    def test_splitmix_bijective_ish(self):
        x = np.arange(1000, dtype=np.uint64)
        assert len(np.unique(splitmix64(x))) == 1000

    def test_combine_columns(self):
        m = np.array([[1, 2], [1, 2], [2, 1]], dtype=np.uint64)
        out = combine_hash_columns(m)
        assert out[0] == out[1] and out[0] != out[2]


class TestMinHash:
    def test_determinism_and_estimate(self):
        cfg = MinHashConfig()
        p = perm_params(cfg)
        p2 = perm_params(cfg)
        assert (p[0] == p2[0]).all() and (p[1] == p2[1]).all()

        t1 = fnv1a_hash_strings(pa.array([f"tok{i}" for i in range(100)]))
        t2 = fnv1a_hash_strings(pa.array([f"tok{i}" for i in range(10, 110)]))
        flat = np.concatenate([t1, t2])
        offs = np.array([0, 100, 200], dtype=np.int64)
        sig = minhash_segments(flat, offs, p)
        est = hamming_similarity_u64(sig[0], sig[1])
        assert abs(est - 90 / 110) < 0.2

    def test_empty_segments_get_sentinel(self):
        cfg = MinHashConfig()
        p = perm_params(cfg)
        t1 = fnv1a_hash_strings(pa.array(["a", "b"]))
        flat = t1
        offs = np.array([0, 0, 2, 2], dtype=np.int64)  # empty, {a,b}, empty
        sig = minhash_segments(flat, offs, p)
        assert (sig[0] == EMPTY_SENTINEL).all()
        assert (sig[2] == EMPTY_SENTINEL).all()
        assert not (sig[1] == EMPTY_SENTINEL).all()

    def test_band_keys_identical_for_identical_sigs(self):
        cfg = MinHashConfig()
        bcfg = BlockingConfig()
        p = perm_params(cfg)
        t1 = fnv1a_hash_strings(pa.array([f"tok{i}" for i in range(30)]))
        flat = np.concatenate([t1, t1])
        offs = np.array([0, 30, 60], dtype=np.int64)
        sig = minhash_segments(flat, offs, p)
        keys = lsh_band_hashes(sig, bcfg)
        assert (keys[0] == keys[1]).all()
        # band index mixed in: a row's bands differ from each other
        assert len(np.unique(keys[0])) == bcfg.bands


class TestBatchKernels:
    """Batched kernels must agree exactly with their scalar references."""

    def test_jaro_winkler_batch_matches_scalar(self):
        from record_linkage_ldu_ray.functions.sim import jaro_winkler_batch

        rng = np.random.default_rng(7)
        alpha = list("abcdef ")
        cases = [("", ""), ("a", ""), ("", "a"), ("a", "a"), ("ab", "ba"),
                 ("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "abc")]
        for _ in range(500):
            n1, n2 = rng.integers(0, 30, 2)
            cases.append(("".join(rng.choice(alpha, n1)),
                          "".join(rng.choice(alpha, n2))))
        got = jaro_winkler_batch([c[0] for c in cases], [c[1] for c in cases])
        for i, (s1, s2) in enumerate(cases):
            assert got[i] == pytest.approx(jaro_winkler(s1, s2), abs=1e-6), (s1, s2)

    def test_jaro_winkler_batch_truncates_at_64(self):
        from record_linkage_ldu_ray.functions.sim import jaro_winkler_batch

        a, b = "x" * 100, "x" * 100
        assert jaro_winkler_batch([a], [b])[0] == pytest.approx(1.0)

    def test_jaro_winkler_batch_none_is_empty(self):
        from record_linkage_ldu_ray.functions.sim import jaro_winkler_batch

        got = jaro_winkler_batch([None, "ab"], ["ab", None])
        assert got[0] == 0.0 and got[1] == 0.0

    def test_union_find_codes(self):
        from record_linkage_ldu_ray.stages.cluster import union_find_codes

        # 0-1, 1-2 | 3-4 | 5 isolated
        us = np.array([1, 2, 4])
        vs = np.array([0, 1, 3])
        roots = union_find_codes(us, vs, 6)
        assert roots.tolist() == [0, 0, 0, 3, 3, 5]

    def test_union_find_codes_random_vs_bruteforce(self):
        rng = np.random.default_rng(11)
        from record_linkage_ldu_ray.stages.cluster import union_find_codes

        n = 200
        m = 150
        us = rng.integers(0, n, m)
        vs = rng.integers(0, n, m)
        roots = union_find_codes(us, vs, n)
        # brute force
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(us, vs):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = [find(i) for i in range(n)]
        # map both labelings to component-min canonical form
        import collections
        comp = collections.defaultdict(list)
        for i, r in enumerate(expect):
            comp[r].append(i)
        canon = {}
        for r, mem in comp.items():
            mn = min(mem)
            for x in mem:
                canon[x] = mn
        assert roots.tolist() == [canon[i] for i in range(n)]

    def test_contract_matches_np_unique_reference(self):
        """The Arrow dictionary-encode + rank path in _contract must agree
        with the straightforward np.unique-over-Python-strings reference,
        including min-string root selection (byte order == code point
        order), duplicates, self-loops and non-ASCII ids."""
        import pyarrow as pa
        from record_linkage_ldu_ray.stages.cluster import _contract, union_find_codes

        rng = np.random.default_rng(23)
        vocab = (
            [f"conv-{i:04d}" for i in range(40)]
            + ["zzz", "ä-umlaut", "é-acute", "a", ""]
        )
        m = 300
        us = [vocab[i] for i in rng.integers(0, len(vocab), m)]
        vs = [vocab[i] for i in rng.integers(0, len(vocab), m)]
        tbl = pa.table({"u": pa.array(us, pa.string()), "v": pa.array(vs, pa.string())})
        got = _contract(tbl)

        ustr = np.asarray(us, dtype=object)
        vstr = np.asarray(vs, dtype=object)
        uniq, inv = np.unique(np.concatenate([ustr, vstr]), return_inverse=True)
        roots = union_find_codes(inv[:m], inv[m:], len(uniq))
        node = np.arange(len(uniq), dtype=np.int64)
        keep = roots != node
        assert got["u"].to_pylist() == list(uniq[node[keep]])
        assert got["v"].to_pylist() == list(uniq[roots[keep]])

    def test_contract_empty(self):
        import pyarrow as pa
        from record_linkage_ldu_ray.stages.cluster import _contract

        out = _contract(pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())}))
        assert len(out) == 0 and out.column_names == ["u", "v"]


class TestBatchKernelProperties:
    def test_jaro_winkler_batch_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from record_linkage_ldu_ray.functions.sim import jaro_winkler_batch

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.text(alphabet="abcde 0", max_size=70),
                    st.text(alphabet="abcde 0", max_size=70),
                ),
                min_size=1,
                max_size=20,
            )
        )
        def check(pairs):
            got = jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
            for i, (a, b) in enumerate(pairs):
                ref = jaro_winkler(a[:64], b[:64])
                assert abs(got[i] - ref) < 1e-6, (a, b)

        check()

    def test_ratcliff_obershelp_batch_property(self):
        """Batched RO must be BIT-equal to the scalar difflib kernel on
        arbitrary pairs (VERDICT r2 #5) — including empties, nulls, and
        unicode, and past the 64-char JW clamp."""
        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from record_linkage_ldu_ray.functions.sim import (
            _scalar_string_batch,
            ratcliff_obershelp,
            ratcliff_obershelp_batch_arrow,
        )

        scalar = _scalar_string_batch(ratcliff_obershelp)

        @settings(max_examples=150, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.one_of(st.none(), st.text(alphabet="abcß日 0", max_size=90)),
                    st.one_of(st.none(), st.text(alphabet="abcß日 0", max_size=90)),
                ),
                min_size=1,
                max_size=16,
            ),
            st.sampled_from([8, 64, 128]),
        )
        def check(pairs, max_len):
            aa = pa.array([a for a, _ in pairs], pa.string())
            bb = pa.array([b for _, b in pairs], pa.string())
            got = ratcliff_obershelp_batch_arrow(aa, bb, max_len)
            want = scalar(aa, bb, max_len)
            assert (got == want).all(), (pairs, max_len, got, want)

        check()

    def test_ratcliff_obershelp_batch_known_values(self):
        import pyarrow as pa

        from record_linkage_ldu_ray.functions.sim import (
            ratcliff_obershelp_batch_arrow,
        )

        a = pa.array(["hello world", "", "abc", None, "same"], pa.string())
        b = pa.array(["hello weird", "", "", "x", "same"], pa.string())
        got = ratcliff_obershelp_batch_arrow(a, b)
        import difflib

        exp0 = difflib.SequenceMatcher(None, "hello world", "hello weird").ratio()
        assert got[0] == np.float32(exp0)
        assert got[1] == 1.0  # both empty
        assert got[2] == 0.0 and got[3] == 0.0  # one side empty/null
        assert got[4] == 1.0

    def test_levenshtein_batch_property(self):
        """Batched Myers bit-parallel Levenshtein must be bit-equal to the
        scalar DP kernel (the reference's short-field default,
        compare_ldu_hw.py:72) on arbitrary pairs."""
        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from record_linkage_ldu_ray.functions.sim import (
            _scalar_string_batch,
            levenshtein_batch_arrow,
            levenshtein_normalized,
        )

        scalar = _scalar_string_batch(levenshtein_normalized)

        @settings(max_examples=150, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.one_of(st.none(), st.text(alphabet="abcß日 0", max_size=90)),
                    st.one_of(st.none(), st.text(alphabet="abcß日 0", max_size=90)),
                ),
                min_size=1,
                max_size=16,
            ),
            st.sampled_from([5, 64]),
        )
        def check(pairs, max_len):
            aa = pa.array([a for a, _ in pairs], pa.string())
            bb = pa.array([b for _, b in pairs], pa.string())
            got = levenshtein_batch_arrow(aa, bb, max_len)
            want = scalar(aa, bb, max_len)
            assert (got == want).all(), (pairs, max_len, got, want)

        check()

    def test_ngram_jaccard_batch_property(self):
        """Batched exact-packed trigram Jaccard must be bit-equal to the
        scalar set kernel, including the <n-char edge conventions."""
        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from record_linkage_ldu_ray.functions.sim import (
            _scalar_string_batch,
            ngram_jaccard,
            ngram_jaccard_batch_arrow,
        )

        scalar = _scalar_string_batch(ngram_jaccard)

        @settings(max_examples=150, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.one_of(st.none(), st.text(alphabet="abß日 0", max_size=90)),
                    st.one_of(st.none(), st.text(alphabet="abß日 0", max_size=90)),
                ),
                min_size=1,
                max_size=16,
            ),
            st.sampled_from([2, 64, 90]),
        )
        def check(pairs, max_len):
            aa = pa.array([a for a, _ in pairs], pa.string())
            bb = pa.array([b for _, b in pairs], pa.string())
            got = ngram_jaccard_batch_arrow(aa, bb, max_len)
            want = scalar(aa, bb, max_len)
            assert (got == want).all(), (pairs, max_len, got, want)

        check()

    def test_jaccard_batch_matches_scalar(self):
        from record_linkage_ldu_ray.functions.sim import (
            jaccard_sorted_u64,
            jaccard_sorted_u64_batch,
        )

        rng = np.random.default_rng(5)
        vals_a, offs_a, vals_b, offs_b, expect = [], [0], [], [0], []
        for _ in range(50):
            na, nb = rng.integers(0, 30, 2)
            a = np.unique(rng.integers(0, 40, na).astype(np.uint64))
            b = np.unique(rng.integers(0, 40, nb).astype(np.uint64))
            vals_a.append(a)
            vals_b.append(b)
            offs_a.append(offs_a[-1] + len(a))
            offs_b.append(offs_b[-1] + len(b))
            expect.append(jaccard_sorted_u64(a, b))
        got = jaccard_sorted_u64_batch(
            np.concatenate(vals_a) if vals_a else np.empty(0, np.uint64),
            np.array(offs_a),
            np.concatenate(vals_b) if vals_b else np.empty(0, np.uint64),
            np.array(offs_b),
        )
        assert np.allclose(got, expect)
