"""Execution-profile knobs for the engine's Ray Data pipelines.

The engine's wide steps are hash-partitioned groupbys whose UDFs run once
per partition (the ``part`` key is computed inside ``map_batches`` as a pure
function of the data).  Ray Data's default SORT_SHUFFLE strategy
range-partitions by sampled key quantiles, which collapses small key spaces
into very few output blocks — serializing every stage downstream of a
groupby.  HASH_SHUFFLE with an explicit ``num_partitions`` keeps the block
fan-out equal to the partition count, so actor pools and per-partition
tasks actually parallelize; it is also the strategy that scales to
multi-node clusters (no global sample/sort barrier).

``configure_exchange()`` is idempotent and called at pipeline-build time by
every pipeline entry point.  It intentionally does NOT touch ray.init (the
driver owns the session).
"""

from __future__ import annotations

import os


# Driver-side registry of the most recent run's counters, keyed by pipeline
# name.  Pipelines that make data-dependent decisions a 100× operator must
# see (hot-key salting, dropped blocks, pinned bytes) publish here so the
# CLI can surface them WITHOUT the caller threading a metrics dict through
# every return type (queries() callables return bare Datasets).  Driver-local
# by design: counters are tiny driver-visible aggregates, not per-task state.
LAST_RUN_METRICS: dict[str, dict] = {}


def publish_metrics(pipeline: str, metrics: dict) -> None:
    """Record ``metrics`` as the latest counters for ``pipeline`` (shallow
    copy — callers keep mutating their own dict after publishing)."""
    LAST_RUN_METRICS[pipeline] = dict(metrics)


def _num_aggregators() -> int:
    """~1 shuffle aggregator per 4 CPUs, scaled WITH the cluster (see
    configure_exchange); ``RL_SHUFFLE_AGGREGATORS`` overrides for tuning
    experiments."""
    env = os.environ.get("RL_SHUFFLE_AGGREGATORS")
    if env:
        return int(env)
    return max(2, _cluster_cpus() // 4)


def configure_exchange() -> None:
    """Switch the current DataContext to hash-shuffle exchanges.

    The per-partition CPU overrides keep the shuffle aggregator actors from
    reserving whole cores: with the default reservation, partitions ≫ CPUs
    (a 4-CPU CI session running 64-partition stages) deadlocks — map tasks
    and aggregators starve each other.  Aggregators are memcpy-bound, so a
    tiny reservation oversubscribes safely.
    """
    import ray.data
    from ray.data.context import ShuffleStrategy

    ctx = ray.data.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    # fewer, fatter aggregators: each handles several partitions — far
    # cheaper to start than one actor per partition (aggregator pools
    # respawn per dataset execution, so spawn cost recurs per exchange).
    # ~1 aggregator per 4 CPUs measured fastest single-node; grows with
    # the cluster.  The count must scale WITH the cluster (not a fixed
    # floor): aggregators run beyond their 0.01-CPU reservation, so a
    # fixed count hands a small cluster disproportionate hidden capacity —
    # which both distorts two-cluster-size scaling measurements and would
    # under-provision a big one.
    ctx.max_hash_shuffle_aggregators = _num_aggregators()


def _cluster_cpus() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        return 8


def default_num_parts(floor: int = 16) -> int:
    """Cluster-derived hash-partition fan-out for partition-level stages:
    ~2 partitions per available CPU, never below ``floor``.

    Pipelines that accept ``num_parts=None`` resolve it through this at
    build time, so the same code paths fan out to hundreds of partitions
    on a real cluster instead of a fixed single-node count (the clamp in
    :func:`effective_partitions` still bounds tiny test sessions)."""
    return max(floor, _cluster_cpus() * 2)


def effective_partitions(requested: int) -> int:
    """Clamp a configured partition count to ~4 tasks per available CPU.

    Config values size the EXCHANGE for the design scale; on a small
    cluster (or a 4-CPU test session) running 64 partition-tasks of a tiny
    stage costs more in scheduling than it buys in parallelism.  On a big
    cluster the clamp is a no-op.  4 waves per core (not 2) keeps the
    stage's tail short when partition sizes are skewed — the final wave's
    straggler is a quarter-size partition, not a half-size one.
    """
    return max(2, min(requested, _cluster_cpus() * 4))


def partitioned_map(ds, key_cols: list[str], num_partitions: int, fn, **map_kwargs):
    """Hash-partition ``ds`` by ``key_cols`` into ``num_partitions`` blocks
    and apply ``fn`` to each WHOLE partition (one Arrow table per call).

    This is the engine's partition-level compute primitive: ``fn`` must
    group internally (a partition holds every row of each key it owns, but
    may own many keys).  Used instead of ``groupby().map_groups`` because
    (a) the sort step is unnecessary — UDFs group vectorized in-memory, and
    (b) Ray 2.49's sorted hash repartition breaks on the schema-less empty
    blocks that empty partitions emit (keys-based sort of an empty block).
    """
    configure_exchange()
    # a Dataset captures its DataContext at creation — callers may have
    # built ``ds`` before this library was imported, so fix the captured
    # context too (same knobs as configure_exchange)
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ds.context.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    ds.context.max_hash_shuffle_aggregators = _num_aggregators()
    num_partitions = effective_partitions(num_partitions)
    return ds.repartition(num_partitions, keys=key_cols, sort=False).map_batches(
        fn,
        batch_size=None,  # the whole partition-block per call
        batch_format="pyarrow",
        zero_copy_batch=True,
        **map_kwargs,
    )
