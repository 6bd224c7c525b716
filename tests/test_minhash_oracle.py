"""Byte-exactness of the SQL MinHash-LSH oracle against the distributed
pipeline (docdedup.minhash_lsh_dup_pairs / fuzzy_dedup_documents_lsh).

The oracle replays the ENTIRE sketch chain in DuckDB SQL — token FNV-1a +
splitmix64, word-3-gram rolling shingle combine, 64 seeded permutations
(constants inlined from the engine's own perm_params), per-perm minima,
16 LSH band keys, aligned-band candidate generation, and the low-byte
agreement estimate — so the 100 TB-shaped dedup path is pinned hash-exact,
not just recall-gated.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus():
    rng = np.random.default_rng(5)
    pool = [f"w{i}" for i in range(40)] + ["naïve", "日本", "x" * 30]
    base = [
        " ".join(rng.choice(pool, size=rng.integers(0, 30))) for _ in range(40)
    ]
    texts = list(base) + base[:6]  # exact duplicates → est 1.0 pairs
    for t in base[:6]:  # near-duplicates (one-token edit)
        tk = t.split()
        if len(tk) > 4:
            tk[2] = "mut"
        texts.append(" ".join(tk))
    texts += ["", "   ", "one two"]  # shingle-less docs: never pair
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _sql_rows(tbl, name):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("documents", tbl)
    rows = con.execute(e.oracle_sql()[name]).fetchall()
    con.close()
    return rows


class TestMinhashLshOracle:
    def test_pairs_byte_exact(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import minhash_lsh_dup_pairs

        tbl = _corpus()
        eng = sorted(
            (int(r["doc_id_a"]), int(r["doc_id_b"]), float(r["est_jaccard"]))
            for b in minhash_lsh_dup_pairs(
                ray.data.from_arrow(tbl), tau=0.7
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )
        got = sorted(
            (int(a), int(b), float(e))
            for a, b, e in _sql_rows(tbl, "minhash_lsh_dup_pairs")
        )
        assert eng == got  # floats are exact k/64 dyadics on both sides
        assert len(eng) >= 6  # every planted exact duplicate found

    def test_fuzzy_dedup_lsh_byte_exact(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.docdedup import (
            fuzzy_dedup_documents_lsh,
        )

        tbl = _corpus()
        eng = sorted(
            (int(r["doc_id"]), int(r["rep_id"]), bool(r["keep"]))
            for b in fuzzy_dedup_documents_lsh(
                ray.data.from_arrow(tbl), tau=0.5
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )
        got = sorted(
            (int(d), int(r), bool(k))
            for d, r, k in _sql_rows(tbl, "fuzzy_dedup_documents_lsh")
        )
        assert eng == got
        assert sum(1 for _, _, k in eng if not k) >= 6  # dups were dropped
