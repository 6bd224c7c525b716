"""§2.11 similarity-registry dispatch + J3/P2 comparison-map tests.

The reference selects a similarity algorithm per field via a dict
(``compare_method``, compare_ldu_hw.py:66-76) and folds field variants by
max (phone = max(phone, phone2, phone3), compare_ldu_hw.py:51-59).  Here
``ScoringConfig.string_kernels`` / ``compare_map`` carry the same surface;
these tests swap kernels and fold variants through the real PairScorer.
"""

import numpy as np
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig, ScoringConfig
from record_linkage_ldu_ray.functions.sim import (
    STRING_KERNELS,
    jaro_winkler,
    levenshtein_normalized,
    ratcliff_obershelp,
)
from record_linkage_ldu_ray.stages.scoring import PairScorer


def _pair_batch(texts_a, texts_b, roles_a=None, roles_b=None, tools_a=None, tools_b=None):
    n = len(texts_a)
    tok = pa.array([[1, 2, 3]] * n, pa.list_(pa.uint64()))
    mk = lambda v, d: pa.array(v if v is not None else [d] * n)  # noqa: E731
    return pa.table(
        {
            "conv_id_a": pa.array([f"x{i}" for i in range(n)]),
            "conv_id_b": pa.array([f"y{i}" for i in range(n)]),
            "n_turns_a": pa.array([3] * n, pa.int32()),
            "n_turns_b": pa.array([3] * n, pa.int32()),
            "ts_min_a": pa.array([1_000_000] * n, pa.timestamp("us")),
            "ts_min_b": pa.array([1_000_000] * n, pa.timestamp("us")),
            "text_prefix_a": pa.array(texts_a),
            "text_prefix_b": pa.array(texts_b),
            "role_seq_a": mk(roles_a, "uau"),
            "role_seq_b": mk(roles_b, "uau"),
            "tool_seq_a": mk(tools_a, "search"),
            "tool_seq_b": mk(tools_b, "search"),
            "tok_hashes_a": tok,
            "tok_hashes_b": tok,
            "minhash_est": pa.array([0.9] * n, pa.float32()),
        }
    )


class TestKernelRegistry:
    def test_registry_kernels_match_scalars(self):
        a = ["martha stewart", "abcdef", ""]
        b = ["marhta stewart", "abcxef", "zz"]
        for name, scalar in (
            ("jaro_winkler", jaro_winkler),
            ("ratcliff_obershelp", ratcliff_obershelp),
            ("levenshtein", levenshtein_normalized),
        ):
            got = STRING_KERNELS[name](pa.array(a), pa.array(b), max_len=64)
            exp = np.array([scalar(x, y) for x, y in zip(a, b)], dtype=np.float32)
            assert np.allclose(got, exp, atol=1e-6), name

    def test_scorer_dispatches_selected_kernel(self):
        texts_a = ["alpha beta gamma", "delta epsilon"]
        texts_b = ["alpha beta gamme", "zeta eta"]
        cfg = PipelineConfig(
            scoring=ScoringConfig(
                string_kernels={
                    "jw_text": "ratcliff_obershelp",
                    "jw_role": "jaro_winkler",
                    "jw_tool": "levenshtein",
                }
            )
        )
        out = PairScorer(cfg)(_pair_batch(texts_a, texts_b))
        exp = [ratcliff_obershelp(a, b) for a, b in zip(texts_a, texts_b)]
        assert np.allclose(out["jw_text"].to_numpy(), exp, atol=1e-6)
        # tool_seq identical both sides → levenshtein 1.0
        assert np.allclose(out["jw_tool"].to_numpy(), 1.0)

    def test_variant_max_fold(self):
        """compare_ldu_hw.py:51-59 semantics: jw_tool compares tool_seq_a
        against BOTH tool_seq_b and role_seq_b, keeping the max."""
        cfg = PipelineConfig(
            scoring=ScoringConfig(
                compare_map={
                    "jw_text": ("text_prefix",),
                    "jw_role": ("role_seq",),
                    "jw_tool": ("tool_seq", "role_seq"),
                }
            )
        )
        batch = _pair_batch(
            ["aa"], ["aa"],
            tools_a=["browser"], tools_b=["python"], roles_b=["browsex"],
        )
        out = PairScorer(cfg)(batch)
        v1 = jaro_winkler("browser", "python")
        v2 = jaro_winkler("browser", "browsex")
        assert np.isclose(out["jw_tool"][0].as_py(), max(v1, v2), atol=1e-6)

    def test_missing_variant_never_wins(self):
        cfg = PipelineConfig(
            scoring=ScoringConfig(
                compare_map={
                    "jw_text": ("text_prefix",),
                    "jw_role": ("role_seq",),
                    "jw_tool": ("tool_seq", "role_seq"),
                }
            )
        )
        batch = _pair_batch(
            ["aa"], ["aa"], tools_a=["browser"], tools_b=[""], roles_b=["browser"]
        )
        out = PairScorer(cfg)(batch)
        # empty tool variant scores 0; role variant (exact match) wins
        assert np.isclose(out["jw_tool"][0].as_py(), 1.0)

    def test_normalizer_plan(self, ray_session):
        """Per-field normalizer registry (pre_processing.py:176-213 sweep
        with per-field choice: sorted for names, unsorted for emails,
        digits for phones)."""
        import ray.data

        from record_linkage_ldu_ray.functions.text import normalize_columns

        t = pa.table(
            {
                "name": ["Beta Alpha! Corp", None],
                "email": ["Zoe@Ex.com and alpha", "b b"],
                "phone": ["+1 (555) 123-4567", "x"],
            }
        )
        out = (
            normalize_columns(
                ray.data.from_arrow(t),
                {"name": "text_sorted", "email": "text_unsorted", "phone": "digits"},
            )
            .to_pandas()
            .sort_values("phone_norm", na_position="first")
        )
        row = out[out["phone_norm"] == "15551234567"].iloc[0]
        assert row["name_norm"] == "alpha beta corp"
        assert row["email_norm"] == "zoe ex com alpha"  # 'and' is a stopword; order kept
        assert out["name_norm"].isna().sum() == 1  # null stays null

    def test_config_hash_tracks_registry(self):
        base = PipelineConfig()
        swapped = PipelineConfig(
            scoring=ScoringConfig(
                string_kernels={
                    "jw_text": "ratcliff_obershelp",
                    "jw_role": "jaro_winkler",
                    "jw_tool": "jaro_winkler",
                }
            )
        )
        assert base.config_hash() != swapped.config_hash()


class TestDistinctComboDedup:
    """The scorer runs each string kernel once per DISTINCT (a, b) combo and
    scatters scores back (stages/scoring.py _string_gated); these pin that
    the dedup path is bit-equal to direct per-row kernel application, with
    repeats, nulls, and empties mixed."""

    def test_repeated_combos_bit_equal_direct(self):
        base_a = ["alpha beta", "gamma delta", "alpha beta", None, "", "alpha beta"]
        base_b = ["alpha bete", "gamma delta", "alpha bete", "x", "y", "other"]
        texts_a = base_a * 50  # heavy repetition: 300 rows, 6 combos
        texts_b = base_b * 50
        out = PairScorer(PipelineConfig())(_pair_batch(texts_a, texts_b))
        got = out["jw_text"].to_numpy()
        exp = np.array(
            [
                jaro_winkler(a or "", b or "") if (a and b) else 0.0
                for a, b in zip(texts_a, texts_b)
            ],
            dtype=np.float32,
        )
        assert np.array_equal(got, exp)

    def test_all_unique_path_unchanged(self):
        texts_a = [f"user query {i}" for i in range(64)]
        texts_b = [f"user query {i + 1}" for i in range(64)]
        out = PairScorer(PipelineConfig())(_pair_batch(texts_a, texts_b))
        exp = np.array(
            [jaro_winkler(a, b) for a, b in zip(texts_a, texts_b)], dtype=np.float32
        )
        assert np.array_equal(out["jw_text"].to_numpy(), exp)
