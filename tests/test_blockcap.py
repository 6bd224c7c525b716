"""Oversized-block cap (logged-drop counters) and the cluster-derived
partition fan-out knob for the exact pair operators (VERDICT r2 #2, #6)."""

import logging

import numpy as np
import polars as pl
import pyarrow as pa

import ray.data


class TestOversizedBlockKeepMask:
    def test_none_when_under_cap(self):
        from record_linkage_ldu_ray.pipelines.docdedup import (
            _oversized_block_keep_mask,
        )

        df = pl.DataFrame({"blk": ["a", "a", "b"], "doc_id": [1, 2, 3]})
        assert _oversized_block_keep_mask(df, "blk", 2, "t") is None

    def test_mask_and_logged_counters(self, caplog):
        from record_linkage_ldu_ray.pipelines.docdedup import (
            _oversized_block_keep_mask,
        )

        df = pl.DataFrame(
            {"blk": ["big"] * 5 + ["ok"] * 2 + ["big2"] * 4, "doc_id": range(11)}
        )
        with caplog.at_level(logging.WARNING):
            mask = _oversized_block_keep_mask(df, "blk", 3, "myop")
        assert mask is not None
        # only the 2 "ok" rows survive
        assert mask.tolist() == [False] * 5 + [True] * 2 + [False] * 4
        msg = caplog.records[-1].getMessage()
        assert "myop" in msg
        assert "2 oversized block(s)" in msg  # blocks dropped counter
        assert "9 records total" in msg  # records dropped counter


class TestNgramBlockCap:
    def _docs(self):
        # block "giant": 6 near-identical docs (> cap 4); block "small":
        # 2 identical docs (pairs must survive the cap)
        rows = []
        for i in range(6):
            rows.append((i, "giant", "alpha beta gamma delta epsilon"))
        rows.append((10, "small", "zeta eta theta iota"))
        rows.append((11, "small", "zeta eta theta iota"))
        ids, blks, txts = zip(*rows)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(blks),
                "text": pa.array(txts),
            }
        )

    def test_capped_drops_giant_block_only(self, ray_session):
        from record_linkage_ldu_ray.pipelines.docdedup import ngram_jaccard_dup_pairs

        t = self._docs()
        uncapped = ngram_jaccard_dup_pairs(
            ray.data.from_arrow(t), n=2, tau=0.5
        ).to_pandas()
        capped = ngram_jaccard_dup_pairs(
            ray.data.from_arrow(t), n=2, tau=0.5, max_block_records=4
        ).to_pandas()
        assert len(uncapped) == 15 + 1  # C(6,2) giant pairs + 1 small pair
        assert capped["doc_id_a"].tolist() == [10]
        assert capped["doc_id_b"].tolist() == [11]

    def test_fuzzy_dedup_default_cap_finite(self):
        import inspect

        from record_linkage_ldu_ray.pipelines.docdedup import fuzzy_dedup_documents

        sig = inspect.signature(fuzzy_dedup_documents)
        assert sig.parameters["max_block_records"].default == 10_000

    def test_jaccard_cap_behavioral(self, ray_session):
        from record_linkage_ldu_ray.pipelines.docdedup import jaccard_dup_pairs

        t = self._docs()
        capped = jaccard_dup_pairs(
            ray.data.from_arrow(t), tau=0.5, max_block_records=4
        ).to_pandas()
        assert set(zip(capped["doc_id_a"], capped["doc_id_b"])) == {(10, 11)}


class TestNumPartsKnob:
    """The num_parts knob must reach partitioned_map (VERDICT r2 #3)."""

    def _capture(self, monkeypatch):
        import record_linkage_ldu_ray.runtime as rt

        seen = {}

        def fake_partitioned_map(ds, key_cols, num_partitions, fn, **kw):
            seen["num_partitions"] = num_partitions
            return ds

        monkeypatch.setattr(rt, "partitioned_map", fake_partitioned_map)
        return seen

    def _tiny_docs(self):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "source": pa.array(["a", "a"]),
                    "text": pa.array(["x y", "x y"]),
                }
            )
        )

    def _tiny_vecs(self):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([1, 2], pa.int64()),
                    "label": pa.array(["a", "a"]),
                    "embedding": pa.array([[0.1, 0.2], [0.1, 0.2]], pa.list_(pa.float32())),
                }
            )
        )

    def test_explicit_num_parts_reaches_exchange(self, ray_session, monkeypatch):
        from record_linkage_ldu_ray.pipelines.docdedup import (
            embedding_dup_pairs,
            jaccard_dup_pairs,
            ngram_jaccard_dup_pairs,
        )

        for fn, mk in (
            (jaccard_dup_pairs, self._tiny_docs),
            (ngram_jaccard_dup_pairs, self._tiny_docs),
            (embedding_dup_pairs, self._tiny_vecs),
        ):
            seen = self._capture(monkeypatch)
            fn(mk(), num_parts=7)
            assert seen["num_partitions"] == 7, fn.__name__

    def test_default_is_cluster_derived(self, ray_session, monkeypatch):
        import record_linkage_ldu_ray.runtime as rt
        from record_linkage_ldu_ray.pipelines.docdedup import jaccard_dup_pairs

        seen = self._capture(monkeypatch)
        jaccard_dup_pairs(self._tiny_docs())
        assert seen["num_partitions"] == rt.default_num_parts()
        # the derivation itself: ~2 per CPU, never below the floor
        assert rt.default_num_parts() >= 16
        monkeypatch.setattr(rt, "_cluster_cpus", lambda: 256)
        assert rt.default_num_parts() == 512
