"""Byte-exactness of the SQL sign-LSH ANN oracle against the distributed
pipeline (``pipelines/ann.py lsh_topk``).

The oracle replays the whole approximate-search chain in DuckDB SQL —
Rademacher ±1 hyperplanes from ``splitmix64(seed + j*dim + d)``, sign keys
over the raw widened-float32 doubles, hamming≤1 multiprobe candidate
generation, cosine top-10 with ``(c DESC, vec_id)`` tie order — so the ANN
query is pinned hash-exact, not just recall-gated.  The plane parity test
is exact by construction (integer arithmetic on both sides); the key/top-k
tests additionally pin that DuckDB's sequential float dot products land on
the same sign / 6-dp value as numpy's on this fixture.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED, N_BITS, DIM = 0xA11CE, 6, 64


def _corpus(n=300):
    """Clustered float32 embeddings: 8 anchor directions (the vec_id<8
    queries) plus jittered copies, so top-k has real structure; a zero
    vector and exact-duplicate rows cover the edge cases."""
    rng = np.random.default_rng(99)
    anchors = rng.normal(size=(8, DIM))
    rows = [anchors[i] for i in range(8)]
    for i in range(8, n - 2):
        rows.append(anchors[i % 8] + 0.3 * rng.normal(size=DIM))
    rows.append(np.zeros(DIM))  # zero vector: key 0, cosine 0 everywhere
    rows.append(anchors[0])  # exact duplicate of query 0
    mat = np.asarray(rows, np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )


def _con(tbl):
    con = duckdb.connect()
    con.register("embeddings", tbl)
    return con


class TestLshOracle:
    def test_planes_byte_exact(self):
        """SQL splitmix64 planes == the numpy kernel's, entry for entry."""
        from record_linkage_ldu_ray.pipelines.ann import _hyperplanes

        planes = _hyperplanes(DIM, N_BITS, SEED)
        con = duckdb.connect()
        rows = con.execute(
            f"""
            WITH pidx AS (
              SELECT b.b, d.d, ({SEED}::UBIGINT + (b.b*{DIM} + d.d)::UBIGINT) AS x
              FROM (SELECT unnest(range({N_BITS})) AS b) b,
                   (SELECT unnest(range({DIM})) AS d) d),
            p1 AS (SELECT b, d, ((x::UHUGEINT + 11400714819323198485::UHUGEINT)
                    % 18446744073709551616::UHUGEINT)::UBIGINT AS z FROM pidx),
            p2 AS (SELECT b, d, ((xor(z, z >> 30)::UHUGEINT
                      * 13787848793156543929::UHUGEINT)
                    % 18446744073709551616::UHUGEINT)::UBIGINT AS z FROM p1),
            p3 AS (SELECT b, d, ((xor(z, z >> 27)::UHUGEINT
                      * 10723151780598845931::UHUGEINT)
                    % 18446744073709551616::UHUGEINT)::UBIGINT AS z FROM p2)
            SELECT b, d, CASE WHEN (xor(z, z >> 31) >> 63) & 1::UBIGINT
                                   = 1::UBIGINT THEN 1.0 ELSE -1.0 END AS w
            FROM p3 ORDER BY b, d
            """
        ).fetchall()
        con.close()
        got = np.array([w for _, _, w in rows]).reshape(N_BITS, DIM)
        assert np.array_equal(got, planes)

    def test_sign_keys_match_sql(self):
        """Sign keys from the SQL dot products equal the numpy kernel's on
        the fixture (sum-order float differences never flip a sign here)."""
        from record_linkage_ldu_ray.pipelines.ann import _hyperplanes, _sign_keys

        tbl = _corpus()
        mat = (
            np.asarray(tbl["embedding"].combine_chunks().values)
            .reshape(len(tbl), DIM)
            .astype(np.float64)
        )
        keys = _sign_keys(mat, _hyperplanes(DIM, N_BITS, SEED))
        con = _con(tbl)
        import __ray_entry__ as e

        # reuse the committed oracle's key CTE by truncating at `keys`
        sql = e.oracle_sql()["lsh_ann_topk"]
        head = sql[: sql.index(",\n            q AS")]
        rows = con.execute(head + " SELECT vec_id, key FROM keys ORDER BY vec_id").fetchall()
        con.close()
        got = {int(v): int(k) for v, k in rows}
        assert got == {int(i): int(k) for i, k in enumerate(keys)}
        assert got[len(tbl) - 2] == 0  # zero vector → every dot is 0, key 0

    def test_topk_byte_exact(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.ann import load_queries, lsh_topk

        tbl = _corpus()
        ds = ray.data.from_arrow(tbl).repartition(4)
        qmat, qids = load_queries(ds, num_queries=8)
        eng = sorted(
            (int(r["query_id"]), int(r["rank"]), int(r["vec_id"]), float(r["cos_sim"]))
            for r in lsh_topk(ds, qmat, qids, k=10, n_bits=N_BITS).to_pylist()
        )
        import __ray_entry__ as e

        con = _con(tbl)
        got = sorted(
            (int(q), int(rk), int(v), float(c))
            for q, v, c, rk in con.execute(e.oracle_sql()["lsh_ann_topk"]).fetchall()
        )
        con.close()
        assert eng == got
        # the planted exact duplicate of query 0 must be found at rank 1 or 2
        q0 = [v for q, rk, v, _ in eng if q == 0 and rk <= 2]
        assert len(tbl) - 1 in q0 or 0 in q0
