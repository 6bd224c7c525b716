"""Bit-exactness of the SQL k-means replay (``_KMEANS_CENTS_SQL``) against
the engine's ``kmeans_centroids`` / ``assign_cells``.

The engine quantizes unit rows and centroids to the 2^-20 dyadic grid, so
every dot product and member sum in Lloyd is exact in float64 under ANY
summation order — numpy/BLAS and DuckDB's parallel aggregation cannot
diverge.  These tests pin that construction: the winning centroids must be
equal BIT FOR BIT (not approximately) and the cell assignment must match
row for row.
"""
from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_lsh_oracle import _corpus  # clustered 64-dim float32 fixture


def _kmeans_sql_parts(tbl):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("embeddings", tbl)
    frag = "WITH RECURSIVE " + e._KMEANS_CENTS_SQL.format(src="embeddings").lstrip()
    cents = con.execute(
        frag
        + """
        SELECT cc.c, b.cents[cc.c + 1]
        FROM kbest b, (SELECT unnest(range(16)) AS c) cc ORDER BY cc.c"""
    ).fetchall()
    cells = con.execute(
        frag + " SELECT vec_id, cell FROM cellof ORDER BY vec_id"
    ).fetchall()
    con.close()
    return np.array([r[1] for r in cents]), {int(v): int(c) for v, c in cells}


class TestKmeansOracle:
    def test_centroids_bit_exact(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.ann import kmeans_centroids

        tbl = _corpus()
        eng = kmeans_centroids(ray.data.from_arrow(tbl).repartition(4), n_cells=16)
        got, _ = _kmeans_sql_parts(tbl)
        assert got.shape == eng.shape
        assert np.array_equal(got, eng)  # BIT equality, not allclose

    def test_cell_assignment_matches(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.ann import (
            assign_cells,
            kmeans_centroids,
        )

        tbl = _corpus()
        ds = ray.data.from_arrow(tbl).repartition(4)
        cents = kmeans_centroids(ds, n_cells=16)
        eng = {
            int(r["vec_id"]): int(r["cell"])
            for b in assign_cells(ds, cents).select_columns(
                ["vec_id", "cell"]
            ).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        _, got = _kmeans_sql_parts(tbl)
        assert got == eng

    def test_partitioning_invariance(self, ray_session):
        """Centroids are a pure function of the data — any block layout."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.ann import kmeans_centroids

        tbl = _corpus()
        c1 = kmeans_centroids(ray.data.from_arrow(tbl), n_cells=16)
        c2 = kmeans_centroids(ray.data.from_arrow(tbl).repartition(7), n_cells=16)
        assert np.array_equal(c1, c2)
