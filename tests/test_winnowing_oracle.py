"""Byte-exactness of the SQL winnowing oracle against the engine kernel
(textstats.winnowing_fingerprints).

The oracle replays the byte-level k-gram (k=5) rolling polynomial hash
(FNV-prime powers mod 2^64), the splitmix64 finalizer, and the
sliding-window-4 minimum selection in pure DuckDB SQL; these tests pin the
two implementations together on an adversarial corpus (short docs at every
boundary length, unicode, repeats) plus a random soup.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ADVERSARIAL_TEXTS = [
    "",  # 0 bytes → no fingerprints
    "abcd",  # 4 bytes < k → no fingerprints
    "abcde",  # exactly k: m=1 (short branch)
    "abcdef",  # m=2
    "abcdefgh",  # m=4 (short-branch upper boundary)
    "abcdefghi",  # m=5 (first long-branch doc: 2 windows)
    "hello world this is a test",
    "aaaaaaaaaaaaaaaaaaa",  # constant bytes → massive fingerprint dedup
    "xyxyxyxyxyxyxy",  # period-2 repeats
    "único café naïve",  # multi-byte UTF-8 (byte-level k-grams)
    "日本語のテキスト",  # CJK: 3-byte code points
    "the quick brown fox jumps over the lazy dog " * 5,
]


def _doc_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _engine_rows(tbl, ray_session):
    import ray.data

    from record_linkage_ldu_ray.pipelines.textstats import winnowing_fingerprints

    out = set()
    for b in winnowing_fingerprints(ray.data.from_arrow(tbl)).iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            for fp in r["fingerprints"]:
                out.add((int(r["doc_id"]), int(fp)))
            assert r["n_fp"] == len(set(r["fingerprints"]))
    return out


def _sql_rows(tbl):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("documents", tbl)
    rows = con.execute(e.oracle_sql()["winnowing_fingerprints"]).fetchall()
    con.close()
    return {(int(d), int(fp)) for d, fp in rows}


class TestWinnowingOracle:
    def test_adversarial_corpus_byte_exact(self, ray_session):
        tbl = _doc_table(ADVERSARIAL_TEXTS)
        eng = _engine_rows(tbl, ray_session)
        assert eng == _sql_rows(tbl)
        # docs below k bytes contribute nothing on either side
        assert not any(d in (0, 1) for d, _ in eng)

    def test_random_soup_byte_exact(self, ray_session):
        rng = np.random.default_rng(13)
        alpha = list("abcdefg ")
        texts = [
            "".join(rng.choice(alpha, size=rng.integers(0, 60)))
            for _ in range(80)
        ]
        tbl = _doc_table(texts)
        assert _engine_rows(tbl, ray_session) == _sql_rows(tbl)
