"""The shared token-set helper (`_prep_tokens`) and its reintroduction
guard: every set-semantics tokenizer must go through the one helper that
drops the empty-string split artifact, so the engine-vs-oracle
empty-token divergence (round-3 ADVICE class) cannot come back."""

import pathlib
import re

import pyarrow as pa

from record_linkage_ldu_ray.pipelines import docdedup
from record_linkage_ldu_ray.pipelines.docdedup import _prep_tokens, _ws_token_lists

REPO = pathlib.Path(__file__).resolve().parent.parent


class TestPrepTokens:
    def test_empty_and_whitespace_docs_have_empty_token_sets(self):
        texts = pa.array(["", "   ", "\t\n", "a  b b", " b a "])
        toks = _prep_tokens(texts).to_list()
        assert toks == [[], [], [], ["a", "b"], ["a", "b"]]

    def test_non_unique_variant_still_filters_empties(self):
        texts = pa.array(["", "b a b"])
        toks = _prep_tokens(texts, unique=False).to_list()
        assert toks == [[], ["b", "a", "b"]]

    def test_raw_sequence_helper_keeps_split_artifact(self):
        # documented contract: _ws_token_lists matches DuckDB string_split,
        # where splitting "" yields [""] — sequence oracles replay this
        assert _ws_token_lists(pa.array([""])).to_list() == [[""]]

    def test_no_new_unfiltered_set_call_sites(self):
        """Reintroduction guard: direct `_ws_token_lists(` calls are only
        allowed at the known sequence-semantics sites (each carries a
        'sequence' comment and an oracle replaying the same artifact);
        everything else must use `_prep_tokens`."""
        allowed_sequence_sites = 3  # shingles, simhash, decontam token count
        py_files = [
            *(REPO / "record_linkage_ldu_ray").rglob("*.py"),
            REPO / "__ray_entry__.py",
        ]
        call_re = re.compile(r"_ws_token_lists\(")
        calls = 0
        for f in py_files:
            src = f.read_text()
            for m in call_re.finditer(src):
                # skip the definition itself and the helper's own call
                line = src[: m.start()].rsplit("\n", 1)[-1] + src[m.start() :].split("\n", 1)[0]
                if line.lstrip().startswith("def "):
                    continue
                calls += 1
        # 1 call inside _prep_tokens + the allowed sequence sites
        assert calls == 1 + allowed_sequence_sites, (
            f"found {calls} direct _ws_token_lists() calls; new tokenizing "
            "code must use _prep_tokens (token sets) or document sequence "
            "semantics here"
        )

    def test_jaccard_ignores_whitespace_only_docs(self, ray_session):
        """An all-whitespace doc must not match another all-whitespace doc
        (both have EMPTY token sets → Jaccard undefined/0, excluded), the
        exact case where the pre-helper code diverged from the oracle."""
        import ray

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "source": pa.array(["s"] * 4),
                    "text": pa.array(["   ", "", "x y z", "x y z"]),
                }
            )
        )
        out = docdedup.jaccard_dup_pairs(ds, tau=0.5).to_pandas()
        pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
        assert (1, 2) not in pairs and (2, 1) not in pairs
        assert (3, 4) in pairs
