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


# ---------------------------------------------------------------------------
# Warm shuffle-aggregator pool
#
# Ray 2.49's hash-shuffle family (repartition-by-key, groupby aggregate,
# join) spawns a FRESH set of aggregator actors for every dataset
# execution and ray.kill()s them at operator shutdown.  Each spawn is a
# new Python worker process importing ray.data (~0.4 s wall), so every
# exchange in every query pays a flat startup cost that neither data size
# nor CPU count amortizes — measured here as the bulk of the ~1-2 s
# per-exchange floor under every small-sf query, and a direct drag on
# two-cluster-size end-to-end scaling ratios (the constant is
# CPU-independent).  Production shuffle services keep reducers warm for
# exactly this reason (e.g. Spark push-based shuffle's long-lived merge
# services, magnet/SOSP'20 — public).
#
# ``install_shuffle_aggregator_reuse()`` patches the pool to check actors
# out of a session-level free list keyed by their Ray remote-args and
# return them at operator shutdown instead of killing them:
#
# - The warm actor is a thin shell whose per-execution state (the
#   StatefulShuffleAggregation) is rebuilt by an explicit ``reset`` call;
#   ``start`` BLOCKS on the resets (ms for warm actors) so no shuffle
#   task's ``submit`` can race an older execution's state.
# - Actors are returned to the cache ONLY when the operator shut down
#   quiescent (zero active shuffle/finalize tasks).  On error/cancel
#   paths with in-flight tasks the actors are killed exactly like stock,
#   so a straggling submit can never poison a later execution.
# - A dead/stuck cached actor fails its ``reset`` and is replaced with a
#   fresh spawn (the stock cost, once).
# - Cache capped at ``_AGG_CACHE_MAX_ACTORS``; all actors die with the
#   session.  Set ``RL_REUSE_SHUFFLE_AGGREGATORS=0`` to disable and get
#   stock per-execution pools; the patch also declines to install (and
#   the engine runs stock) if Ray's internals don't match the pinned
#   surface, so a Ray upgrade degrades to slower-but-correct.

_AGG_REUSE_ENV = "RL_REUSE_SHUFFLE_AGGREGATORS"
_AGG_CACHE: dict[tuple, list] = {}
_AGG_CACHE_MAX_ACTORS = 64
_AGG_REUSE_STATE = {"installed": False, "remote_cls": None, "hits": 0, "spawns": 0}


def _aggregator_reuse_enabled() -> bool:
    return os.environ.get(_AGG_REUSE_ENV, "1") != "0"


def _cached_aggregator_count() -> int:
    return sum(len(v) for v in _AGG_CACHE.values())


class _WarmHashShuffleAggregator:
    """Reusable stand-in for Ray Data's ``HashShuffleAggregator``: same
    ``submit``/``finalize`` actor surface (hash_shuffle.py:1370-1410), but
    the per-execution aggregation state is (re)built by ``reset`` so one
    actor process serves many dataset executions."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._agg = None

    def reset(self, aggregator_id, target_partition_ids, agg_factory) -> bool:
        with self._lock:
            self._agg = agg_factory(aggregator_id, target_partition_ids)
        return True

    def release(self) -> bool:
        """Drop aggregation state when parked in the free list (holds block
        refs otherwise)."""
        with self._lock:
            self._agg = None
        return True

    def submit(self, input_seq_id, partition_id, partition_shard):
        with self._lock:
            self._agg.accept(input_seq_id, partition_id, partition_shard)

    def finalize(self, partition_id):
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema

        with self._lock:
            exec_stats_builder = BlockExecStats.builder()
            block = self._agg.finalize(partition_id)
            exec_stats = exec_stats_builder.build()
            self._agg.clear(partition_id)
        yield block
        yield BlockMetadataWithSchema.from_block(block, stats=exec_stats)


def _aggregator_cache_key(remote_args: dict) -> tuple:
    items = []
    for k, v in sorted(remote_args.items()):
        if k == "max_concurrency":
            continue  # warm actors spawn with a generous fixed cap
        items.append((k, v if isinstance(v, (int, float, str, bool, type(None))) else repr(v)))
    return tuple(items)


def install_shuffle_aggregator_reuse() -> bool:
    """Idempempotently patch Ray Data's AggregatorPool for warm reuse (see
    module comment above).  Returns True when the patch is active."""
    if _AGG_REUSE_STATE["installed"]:
        return True
    if not _aggregator_reuse_enabled():
        return False
    try:
        import ray as _ray
        from ray.data._internal.execution.operators import hash_shuffle as _hs

        # the exact internal surface this patch relies on — decline (and
        # run stock) if a Ray upgrade moved any of it
        _hs.AggregatorPool.start
        _hs.AggregatorPool.shutdown
        _hs.HashShufflingOperatorBase._do_shutdown
        _hs.HashShufflingOperatorBase._get_active_shuffling_tasks
        _hs.HashShuffleAggregator
    except Exception:
        return False

    remote_cls = _ray.remote(_WarmHashShuffleAggregator)
    _AGG_REUSE_STATE["remote_cls"] = remote_cls
    _orig_do_shutdown = _hs.HashShufflingOperatorBase._do_shutdown

    def _spawn(pool, aggregator_id, tids):
        args = dict(pool._aggregator_ray_remote_args)
        mc = int(args.pop("max_concurrency", 1) or 1)
        _AGG_REUSE_STATE["spawns"] += 1
        actor = remote_cls.options(max_concurrency=max(mc, 32), **args).remote()
        return actor, actor.reset.remote(
            aggregator_id, tids, pool._aggregation_factory_ref
        )

    def _pool_start(pool):
        pool._check_cluster_resources()
        key = _aggregator_cache_key(pool._aggregator_ray_remote_args)
        pool._rl_cache_key = key
        free = _AGG_CACHE.setdefault(key, [])
        pending = []
        for aggregator_id in range(pool._num_aggregators):
            tids = pool._aggregator_partition_map[aggregator_id]
            assert len(tids) > 0
            if free:
                actor = free.pop()
                _AGG_REUSE_STATE["hits"] += 1
                ref = actor.reset.remote(
                    aggregator_id, tids, pool._aggregation_factory_ref
                )
            else:
                actor, ref = _spawn(pool, aggregator_id, tids)
            pending.append((aggregator_id, tids, actor, ref))
        # BLOCK until every reset landed: guarantees no shuffle task's
        # submit (dispatched only after start returns) can observe a
        # previous execution's aggregation state.  Warm actors ack in
        # milliseconds; a dead/stuck one is replaced by a fresh spawn.
        actors = [None] * pool._num_aggregators
        for aggregator_id, tids, actor, ref in pending:
            try:
                _ray.get(ref, timeout=60)
            except Exception:
                try:
                    _ray.kill(actor)
                except Exception:
                    pass
                actor, ref = _spawn(pool, aggregator_id, tids)
                _ray.get(ref, timeout=120)
            actors[aggregator_id] = actor
        pool._aggregators[:] = actors
        pool.start_health_monitoring()

    def _pool_shutdown(pool, force):
        returnable = getattr(pool, "_rl_return_ok", False) and getattr(
            pool, "_rl_cache_key", None
        ) is not None
        for actor in pool._aggregators:
            if returnable and _cached_aggregator_count() < _AGG_CACHE_MAX_ACTORS:
                actor.release.remote()
                _AGG_CACHE.setdefault(pool._rl_cache_key, []).append(actor)
            else:
                try:
                    _ray.kill(actor)
                except Exception:
                    pass
        pool._aggregators.clear()

    def _op_do_shutdown(op, force: bool = False):
        pool = getattr(op, "_aggregator_pool", None)
        if pool is not None:
            try:
                pool._rl_return_ok = (
                    len(op._get_active_shuffling_tasks()) == 0
                    and len(op._finalizing_tasks) == 0
                )
            except Exception:
                pool._rl_return_ok = False
        _orig_do_shutdown(op, force)

    _hs.AggregatorPool.start = _pool_start
    _hs.AggregatorPool.shutdown = _pool_shutdown
    _hs.HashShufflingOperatorBase._do_shutdown = _op_do_shutdown
    _AGG_REUSE_STATE["installed"] = True
    return True


def configure_exchange() -> None:
    """Switch the current DataContext to hash-shuffle exchanges.

    The per-partition CPU overrides keep the shuffle aggregator actors from
    reserving whole cores: with the default reservation, partitions ≫ CPUs
    (a 4-CPU CI session running 64-partition stages) deadlocks — map tasks
    and aggregators starve each other.  Aggregators are memcpy-bound, so a
    tiny reservation oversubscribes safely.

    Also installs the warm shuffle-aggregator pool (see
    :func:`install_shuffle_aggregator_reuse`) so repeated exchanges within
    one session stop paying the per-execution actor-spawn constant.
    """
    import ray.data
    from ray.data.context import ShuffleStrategy

    install_shuffle_aggregator_reuse()
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
