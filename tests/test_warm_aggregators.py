"""Warm shuffle-aggregator pool (runtime.install_shuffle_aggregator_reuse):
exchanges must reuse aggregator actors across dataset executions without
any state bleed between executions, and fall back to fresh spawns when a
cached actor is gone."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from record_linkage_ldu_ray import runtime
from record_linkage_ldu_ray.runtime import _AGG_REUSE_STATE, partitioned_map


# defined as lambdas/closures at use sites: top-level functions in a test
# module are pickled by reference and can't import on Ray workers
_identity = lambda t: t  # noqa: E731


def _make_sum_by_key():
    def _sum_by_key(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        return df.group_by("k").agg(pl.col("v").sum().alias("s")).sort("k").to_arrow()

    return _sum_by_key


class TestWarmAggregatorReuse:
    def test_installed_and_reused_across_executions(self, ray_session):
        assert runtime.install_shuffle_aggregator_reuse()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(np.arange(5000, dtype=np.int64) % 13),
                    "v": pa.array(np.arange(5000, dtype=np.int64)),
                }
            )
        )
        h0, s0 = _AGG_REUSE_STATE["hits"], _AGG_REUSE_STATE["spawns"]
        for _ in range(3):
            assert partitioned_map(ds, ["k"], 8, _identity).count() == 5000
        # after the first execution's spawns, later executions hit the cache
        assert _AGG_REUSE_STATE["hits"] > h0
        assert _AGG_REUSE_STATE["spawns"] - s0 <= 2 * runtime._num_aggregators()

    def test_no_state_bleed_between_executions(self, ray_session):
        """Two different datasets exchanged back-to-back through the same
        warm actors must each produce exactly their own aggregation."""
        t1 = pa.table(
            {
                "k": pa.array([1, 1, 2, 2], pa.int64()),
                "v": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
        t2 = pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array([5, 6, 7], pa.int64()),
            }
        )
        d1 = ray.data.from_arrow(t1)
        d2 = ray.data.from_arrow(t2)
        for _ in range(2):  # alternate to force actor reuse across them
            fn = _make_sum_by_key()
            r1 = partitioned_map(d1, ["k"], 4, fn).to_pandas()
            r2 = partitioned_map(d2, ["k"], 4, fn).to_pandas()
            assert dict(zip(r1["k"], r1["s"])) == {1: 30, 2: 70}
            assert dict(zip(r2["k"], r2["s"])) == {1: 5, 2: 6, 3: 7}

    def test_killed_cached_actor_is_replaced(self, ray_session):
        """A cached actor that died must not break the next exchange — the
        pool detects the failed reset and spawns a replacement."""
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(np.arange(100, dtype=np.int64) % 5),
                    "v": pa.array(np.arange(100, dtype=np.int64)),
                }
            )
        )
        assert partitioned_map(ds, ["k"], 4, _identity).count() == 100
        # kill every parked actor behind the cache's back
        for actors in runtime._AGG_CACHE.values():
            for a in actors:
                ray.kill(a)
        assert partitioned_map(ds, ["k"], 4, _identity).count() == 100

    def test_groupby_and_sort_still_exact(self, ray_session):
        """Ray Data's own hash-shuffle consumers (groupby aggregate, keyed
        repartition) run through the patched pool unchanged."""
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(np.arange(1000, dtype=np.int64) % 7),
                    "v": pa.array(np.ones(1000, dtype=np.int64)),
                }
            )
        )
        out = ds.groupby("k").sum("v").to_pandas().sort_values("k")
        assert list(out["sum(v)"]) == [143, 143, 143, 143, 143, 143, 142]
