"""Byte-exactness of the sketch-query SQL oracles against the engine:
value_quantile_sketch (bottom-k sample quantiles), token_freq_cms
(Count-Min estimates), distinct_tokens_hll (HyperLogLog counts).

Each sketch is deterministic integer math over the fnv1a+splitmix64 hash
chain, so its oracle replays it exactly — these tests pin that on an
adversarial corpus (multi-byte UTF-8, empty/whitespace-only docs, heavy
duplication, a >512-row group for the sample cutoff, and a ~20k-distinct-
token source so the HLL harmonic branch — not just linear counting — is
exercised, including hash-collision cells in the CMS).
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_corpus(tmp_path):
    rng = np.random.default_rng(11)
    pool = [f"tok{i}" for i in range(300)] + ["naïve", "日本語", "emoji✨", "x" * 40]
    texts, sources = [], []
    for i in range(120):
        texts.append(" ".join(rng.choice(pool, size=rng.integers(0, 25))))
        sources.append("small_a" if i % 2 else "small_b")
    # ~20k distinct tokens in one source → HLL harmonic branch
    big = [f"u{j}" for j in range(20000)]
    for j in range(0, 20000, 500):
        texts.append(" ".join(big[j : j + 500]))
        sources.append("big")
    texts += ["", "   ", "\t\n"]
    sources += ["small_a", "small_b", "big"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "source": pa.array(sources, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    n_ev = 1400  # one group far over the k=512 sample cutoff
    ev_types = ["click"] * 900 + ["view"] * 400 + ["rare"] * 100
    events = pa.table(
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "event_type": pa.array(ev_types, pa.string()),
            "value": pa.array(
                np.round(rng.normal(0, 100, n_ev), 3), pa.float64()
            ),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    pq.write_table(events, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _oracle_df(sf_dir: str, name: str):
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.sql(e.oracle_sql()[name]).df()
    con.close()
    return df


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v:.17g}" if isinstance(v, float) else str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


class TestSketchOracles:
    def test_value_quantile_sketch_byte_exact(self, ray_session, tmp_path):
        from record_linkage_ldu_ray.pipelines.textstats import value_quantile_sketch

        sf = _write_corpus(tmp_path)
        eng = _canon(_to_df(value_quantile_sketch(sf)))
        exp = _canon(_oracle_df(sf, "value_quantile_sketch"))
        assert eng.equals(exp)
        # the >512-row group really was cut to the sample size
        raw = _to_df(value_quantile_sketch(sf))
        assert int(raw.loc[raw.event_type == "click", "n_sample"].iloc[0]) == 512
        assert int(raw.loc[raw.event_type == "rare", "n_sample"].iloc[0]) == 100

    def test_token_freq_cms_byte_exact(self, ray_session, tmp_path):
        from record_linkage_ldu_ray.pipelines.textstats import token_freq_cms

        sf = _write_corpus(tmp_path)
        raw = _to_df(token_freq_cms(sf))
        eng = _canon(raw)
        exp = _canon(_oracle_df(sf, "token_freq_cms"))
        assert eng.equals(exp)
        # one-sided error law: estimate never under-counts
        assert (raw.cms_estimate >= raw.n_occurrences).all()

    def test_distinct_tokens_hll_byte_exact(self, ray_session, tmp_path):
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import distinct_tokens_hll

        sf = _write_corpus(tmp_path)
        ds = ray.data.read_parquet(f"{sf}/documents.parquet")
        raw = _to_df(distinct_tokens_hll(ds))
        eng = _canon(raw)
        exp = _canon(_oracle_df(sf, "distinct_tokens_hll"))
        assert eng.equals(exp)
        # the big source exercised the harmonic branch (est >> 2.5*m is not
        # required, but the estimate must be in HLL's error envelope)
        big = int(raw.loc[raw.source == "big", "n_distinct_est"].iloc[0])
        assert abs(big - 20000) / 20000 < 0.05
