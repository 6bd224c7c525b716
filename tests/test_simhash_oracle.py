"""Byte-exactness of the SQL SimHash oracle (_SIMHASH_SIG_SQL) against the
engine's numpy kernel (docdedup.simhash_signatures / simhash_dup_pairs).

The oracle re-implements FNV-1a + splitmix64 + TF-weighted bit votes in
pure DuckDB SQL; these tests pin the two implementations together on an
adversarial corpus (empty / whitespace-only / unicode / TF-heavy texts) so
any drift in either side fails loudly instead of silently desyncing the
driver's hash-compare.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _entry():
    import __ray_entry__ as e

    return e


ADVERSARIAL_TEXTS = [
    "",  # empty → token [''] on both sides
    "   \t\n  ",  # whitespace-only → trims to '' → token ['']
    "hello world",
    "hello hello hello world",  # TF weighting matters
    "único café naïve",  # multi-byte UTF-8
    "日本語 トークン 処理",  # CJK
    "🦀 🦀 emoji🚀mix",  # emoji + repeated token
    "a",  # single char
    "x" * 300,  # long token
    "hello world",  # exact duplicate of doc 2 → hamming 0 pair
    "hello world extra",  # near-dup
    "tab\tseparated\nnewline  multi   space",
    "trailing space ",
    " leading",
]


def _doc_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _sql_sigs(tbl: pa.Table) -> dict[int, int]:
    e = _entry()
    con = duckdb.connect()
    con.register("documents", tbl)
    sql = (
        "WITH RECURSIVE "
        + e._SIMHASH_SIG_SQL.format(src="documents")
        + " SELECT doc_id, sig FROM sigs"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return {int(d): int(s) for d, s in rows}


class TestSimhashSignatureOracle:
    def test_sql_sigs_byte_exact_vs_engine(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import simhash_signatures

        tbl = _doc_table(ADVERSARIAL_TEXTS)
        eng = {
            int(r["doc_id"]): int(r["simhash"])
            for b in simhash_signatures(ray.data.from_arrow(tbl)).iter_batches(
                batch_format="pyarrow"
            )
            for r in b.to_pylist()
        }
        assert eng == _sql_sigs(tbl)

    def test_sql_sigs_byte_exact_vs_kernel_random(self, ray_session):
        """Random token soup (seeded): 60 docs drawn from a 40-token pool
        with repetition — signature equality over every doc."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import simhash_signatures

        rng = np.random.default_rng(7)
        pool = [f"tok{i}" for i in range(30)] + ["naïve", "日本", "🦀", "x" * 50]
        texts = [
            " ".join(rng.choice(pool, size=rng.integers(1, 25)))
            for _ in range(60)
        ]
        tbl = _doc_table(texts)
        eng = {
            int(r["doc_id"]): int(r["simhash"])
            for b in simhash_signatures(ray.data.from_arrow(tbl)).iter_batches(
                batch_format="pyarrow"
            )
            for r in b.to_pylist()
        }
        assert eng == _sql_sigs(tbl)


class TestSimhashPairsOracle:
    def test_full_oracle_matches_engine_pairs(self, ray_session):
        """End-to-end: oracle_sql()['simhash_dup_pairs'] (brute-force SQL
        self-join) returns exactly the engine's banded+verified pair set
        with identical hamming distances."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import simhash_dup_pairs

        rng = np.random.default_rng(11)
        pool = [f"w{i}" for i in range(25)]
        base = [" ".join(rng.choice(pool, size=18)) for _ in range(20)]
        # planted guaranteed pairs (exact duplicates → hamming 0) plus
        # one-token edits (may or may not land within hamming 3 — either
        # way both sides must agree)
        texts = list(base) + base[:8]
        for t in base[:8]:
            toks = t.split()
            toks[3] = "mutant"
            texts.append(" ".join(toks))
        tbl = _doc_table(texts)

        eng = sorted(
            (int(r["doc_id_a"]), int(r["doc_id_b"]), int(r["hamming"]))
            for b in simhash_dup_pairs(ray.data.from_arrow(tbl)).iter_batches(
                batch_format="pyarrow"
            )
            for r in b.to_pylist()
        )
        con = duckdb.connect()
        con.register("documents", tbl)
        sql = _entry().oracle_sql()["simhash_dup_pairs"]
        got = sorted(
            (int(a), int(b), int(h)) for a, b, h in con.execute(sql).fetchall()
        )
        con.close()
        assert eng == got
        assert len(eng) >= 8  # every planted near-dup found
