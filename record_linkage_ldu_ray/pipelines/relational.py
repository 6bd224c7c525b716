"""Relational operator demonstrations over the TPC-H-ish test tables.

These exercise the engine's generic primitives — projection/filter (M2/M3),
groupby aggregation (A4/A5 shape), broadcast lookup join (J4 pattern: small
side ``ray.put`` once, read per batch — never a shuffle join), ordered
per-key sequence aggregation (A1 analog), top-k (O4) — each with an exact
DuckDB-SQL oracle.  Money sums are computed in integer CENTS so Ray and SQL
agree bit-for-bit (no float summation-order issues).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate: per (returnflag, linestatus) sums/counts.

    Partial aggregation happens inside map_batches (combiner), the final
    groupby only merges ≤ |flags×statuses| tiny partials per block —
    shuffle volume is O(groups), not O(rows).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.with_columns(
                (pl.col("l_quantity") * 100).round(0).cast(pl.Int64).alias("qty_c"),
                (pl.col("l_extendedprice") * 100).round(0).cast(pl.Int64).alias("price_c"),
                (pl.col("l_discount") * 100).round(0).cast(pl.Int64).alias("disc_c"),
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .agg(
                pl.col("qty_c").sum().alias("sum_qty_cents"),
                pl.col("price_c").sum().alias("sum_price_cents"),
                pl.col("disc_c").sum().alias("sum_disc_cents"),
                pl.len().cast(pl.Int64).alias("count_rows"),
            )
        )
        return out.to_arrow()

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.group_by(["l_returnflag", "l_linestatus"])
            .agg(
                pl.col("sum_qty_cents").sum(),
                pl.col("sum_price_cents").sum(),
                pl.col("sum_disc_cents").sum(),
                pl.col("count_rows").sum(),
            )
            .sort(["l_returnflag", "l_linestatus"])
            .to_arrow()
        )

    # final merge over the tiny partials table (≤ groups × blocks rows)
    return partial.repartition(1).map_batches(_merge, batch_format="pyarrow")


def orders_by_segment(sf_dir: str):
    """Broadcast join orders→customer (small side in the object store once),
    then per-mktsegment order count + totalprice sum in cents."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_arrow_refs()
    cust_tbl = pa.concat_tables([ray.get(r) for r in cust])
    keys = cust_tbl["c_custkey"].to_numpy()
    order = np.argsort(keys)
    lookup_ref = ray.put(
        (keys[order], np.asarray(cust_tbl["c_mktsegment"].to_pylist(), object)[order])
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        k, seg = ray.get(lookup_ref)
        ck = t["o_custkey"].to_numpy()
        idx = np.searchsorted(k, ck)
        idx_c = np.clip(idx, 0, len(k) - 1)
        found = k[idx_c] == ck
        segments = np.where(found, seg[idx_c], None)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        df = pl.DataFrame(
            {"c_mktsegment": pl.Series(segments.tolist(), dtype=pl.Utf8), "cents": cents}
        )
        return (
            df.filter(pl.col("c_mktsegment").is_not_null())
            .group_by("c_mktsegment")
            .agg(
                pl.len().cast(pl.Int64).alias("n_orders"),
                pl.col("cents").sum().alias("sum_totalprice_cents"),
            )
            .to_arrow()
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("c_mktsegment")
            .agg(pl.col("n_orders").sum(), pl.col("sum_totalprice_cents").sum())
            .sort("c_mktsegment")
            .to_arrow()
        )

    return partial.repartition(1).map_batches(_merge, batch_format="pyarrow")


def filter_click_events(sf_dir: str, min_value: float = 50.0):
    """Projection + row filter pushed to the read (M2/M3): click events with
    value above threshold."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "value"]
    )

    def _f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["event_type"], pa.scalar("click")),
            pc.greater(t["value"], pa.scalar(min_value)),
        )
        return t.filter(mask).select(["event_id", "user_id", "value"])

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def top_orders(sf_dir: str, k: int = 100):
    """Deterministic top-k: highest totalprice, ties by orderkey (O4).

    Streaming partial top-k per block, tiny driver merge — no global sort.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        keys = t["o_orderkey"].to_numpy()
        kk = min(k, len(keys))
        order = np.lexsort((keys, -cents))[:kk]
        return pa.table(
            {
                "o_orderkey": pa.array(keys[order], pa.int64()),
                "totalprice_cents": pa.array(cents[order], pa.int64()),
            }
        )

    parts = ray.get(
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
    )
    merged = pa.concat_tables([p for p in parts if len(p)])
    cents = merged["totalprice_cents"].to_numpy()
    keys = merged["o_orderkey"].to_numpy()
    order = np.lexsort((keys, -cents))[:k]
    return pa.table(
        {
            "o_orderkey": pa.array(keys[order], pa.int64()),
            "totalprice_cents": pa.array(cents[order], pa.int64()),
        }
    )


def user_event_features(sf_dir: str, num_parts: int = 32):
    """Per-user ordered event aggregation — the A1 per-conversation feature
    pattern over the events table: hash-partition by user, ONE vectorized
    ordered group_by per partition (event sequence ordered by (ts, event_id)).

    Output: (user_id, n_events:int64, ts_min, ts_max, event_seq:string).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "event_type", "ts"]
    )

    def _part(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["user_id"].cast(pa.string()))
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _agg(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        return (
            df.sort(["user_id", "ts", "event_id"])
            .group_by("user_id", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("ts").min().alias("ts_min"),
                pl.col("ts").max().alias("ts_max"),
                pl.col("event_type").str.join(",").alias("event_seq"),
            )
            .to_arrow()
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(
        ds.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True),
        ["part"],
        num_parts,
        _agg,
    )


def tumbling_window_stats(sf_dir: str, window: str = "1h", num_parts: int = 32):
    """Tumbling (fixed-width) windowed aggregate over the event stream:
    per (user_id, window_start) event count, value sum and click count.

    The scale pattern is two-level aggregation: each input batch combines
    to at most one partial row per (user, window) it contains (vectorized
    polars group_by inside ``map_batches``), and only those partials — not
    raw events — enter the ONE hash exchange keyed by user; the merge sums
    partials per partition.  Shuffle volume is O(distinct user-windows per
    batch), not O(events).  Value sums travel as integer cents so the
    result is bit-exact against the SQL oracle regardless of merge order.

    Output: (user_id, window_start, n_events:int64, sum_value_cents:int64,
    n_clicks:int64).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "value"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.with_columns(
                pl.col("ts").dt.truncate(window).alias("window_start"),
                (pl.col("value") * 100).round(0).cast(pl.Int64).alias("_cents"),
                (pl.col("event_type") == "click").cast(pl.Int64).alias("_click"),
            )
            .group_by(["user_id", "window_start"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("_cents").sum().alias("sum_value_cents"),
                pl.col("_click").sum().alias("n_clicks"),
            )
        )
        t2 = out.to_arrow()
        h = fnv1a_hash_strings(t2["user_id"].cast(pa.string()))
        return t2.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        return (
            df.group_by(["user_id", "window_start"])
            .agg(
                pl.col("n_events").sum(),
                pl.col("sum_value_cents").sum(),
                pl.col("n_clicks").sum(),
            )
            .sort(["user_id", "window_start"])
            .to_arrow()
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map(partials, ["part"], num_parts, _merge)


def sessionize_events(sf_dir: str, gap_minutes: int = 30, num_parts: int = 32):
    """Windowed aggregate over an event stream: per-user sessionization by
    inactivity gap — the streaming-window operator a training-data pipeline
    needs for behavioral features.

    Semantics: events of one user, ordered by (ts, event_id), start a new
    session whenever the gap to the previous event exceeds ``gap_minutes``;
    sessions are numbered 1.. per user.  Distributed as the A1 pattern:
    hash-partition by user (all of a user's events co-locate), ONE
    vectorized polars pass per partition — shift/cum_sum inside the
    partition, never a driver-side loop.

    Output: (user_id, session_idx:int32, n_events:int64, ts_start, ts_end).
    SQL-oracle-expressible via lag() + running sum (see __ray_entry__).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def _part(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["user_id"].cast(pa.string()))
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _sess(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        df = df.sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            (
                (pl.col("ts") - pl.col("ts").shift(1).over("user_id"))
                > pl.duration(minutes=gap_minutes)
            )
            .fill_null(True)
            .cast(pl.Int32)
            .alias("_brk")
        ).with_columns(pl.col("_brk").cum_sum().over("user_id").alias("session_idx"))
        out = (
            df.group_by(["user_id", "session_idx"], maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("ts").min().alias("ts_start"),
                pl.col("ts").max().alias("ts_end"),
            )
            .sort(["user_id", "session_idx"])
        )
        return out.with_columns(pl.col("session_idx").cast(pl.Int32)).to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(
        ds.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True),
        ["part"],
        num_parts,
        _sess,
    )


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
    num_parts: int = 32,
    strategy: str = "backward",
):
    """Distributed as-of join: for every left row, attach the right row with
    the greatest ``on`` ≤ left.``on`` (strategy="backward") sharing the same
    ``by`` key; left rows with no such right row keep nulls (left join).

    Ray Data has no native as-of join; this is the documented composition —
    (a) align both sides to one schema with a ``side`` tag (missing columns
    null-filled with the other side's types), (b) ONE hash exchange keyed by
    ``by`` so matching keys co-locate, (c) per-partition vectorized polars
    ``join_asof`` (sort by ``on``, binary-search merge — never a row loop).
    Shuffle volume is one pass over both inputs; no driver materialization.

    Partitioning assumption: all rows of one ``by`` key fit in one
    partition's task (same bound as every keyed operator here); skewed keys
    are bounded by the key's own row count, not the table size.

    Output: (``by``, ``on``, *left_cols, *(c+suffix for right_cols)),
    sorted by (``by``, ``on``) within each partition.  Right-side ties on
    (``by``, ``on``) must be unique (asserted by the oracle check).
    """
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    out_right = [c + suffix for c in right_cols]

    def _align(side: int):
        # right_cols may repeat `by`/`on` (to carry them into the output) —
        # select each source column once
        src_cols = list(dict.fromkeys([by, on] + (left_cols if side == 0 else right_cols)))

        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols: dict[str, pa.Array] = {
                "side": pa.array(np.full(n, side, np.int8)),
                by: t[by].combine_chunks(),
                on: t[on].combine_chunks(),
            }
            for c in left_cols:
                cols[c] = t[c].combine_chunks() if side == 0 else pa.nulls(n, l_types[c])
            for c, oc in zip(right_cols, out_right):
                cols[oc] = pa.nulls(n, r_types[c]) if side == 0 else t[c].combine_chunks()
            out = pa.table(cols)
            h = fnv1a_hash_strings(out[by].cast(pa.string()))
            return out.append_column(
                "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
            )

        return lambda t: _f(t.select(src_cols))

    both = left_ds.map_batches(
        _align(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(_align(1), batch_format="pyarrow", zero_copy_batch=True))

    def _join(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        lf = df.filter(pl.col("side") == 0).select([by, on] + left_cols).sort(on)
        rf = df.filter(pl.col("side") == 1).select([by, on] + out_right).sort(on)
        out = lf.join_asof(rf, on=on, by=by, strategy=strategy)
        return out.sort([by, on]).to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(both, ["part"], num_parts, _join)


def range_join(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    lo: int,
    hi: int,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
    num_parts: int = 32,
):
    """Distributed range (interval) join: every (left, right) pair sharing
    the same ``by`` key with ``right.on`` in ``[left.on + lo, left.on + hi]``
    (both bounds inclusive, in the units of ``on`` after int64 cast — µs for
    timestamps).  Inner join; output size is the true match count.

    Ray Data has no native range join; this is the documented composition —
    (a) align both sides to one schema with a ``side`` tag, (b) ONE hash
    exchange keyed by ``by`` so matching keys co-locate, (c) per-partition
    vectorized probe: right sorted by (key, on) once, each left row's match
    run found with TWO global ``np.searchsorted`` calls over a composite
    ``key*span + offset`` int64 (no per-row loop), pairs expanded with
    repeat/arange — work and memory proportional to output, never a per-key
    cartesian product.

    Partitioning assumption: all rows of one ``by`` key fit in one
    partition's task (same bound as ``asof_join``); a pathologically hot key
    is bounded by its own row count, not the table size.

    Output: (``by``, ``on``, *left_cols, ``on``+suffix, *(c+suffix for
    right_cols)).
    """
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    out_right = [on + suffix] + [c + suffix for c in right_cols]

    def _align(side: int):
        src_cols = list(dict.fromkeys([by, on] + (left_cols if side == 0 else right_cols)))

        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols: dict[str, pa.Array] = {
                "side": pa.array(np.full(n, side, np.int8)),
                by: t[by].combine_chunks(),
                on: t[on].combine_chunks(),
            }
            for c in left_cols:
                cols[c] = t[c].combine_chunks() if side == 0 else pa.nulls(n, l_types[c])
            for c, oc in zip(right_cols, out_right[1:]):
                cols[oc] = pa.nulls(n, r_types[c]) if side == 0 else t[c].combine_chunks()
            out = pa.table(cols)
            h = fnv1a_hash_strings(out[by].cast(pa.string()))
            return out.append_column(
                "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
            )

        return lambda t: _f(t.select(src_cols))

    both = left_ds.map_batches(
        _align(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(_align(1), batch_format="pyarrow", zero_copy_batch=True))

    on_is_ts = pa.types.is_timestamp(l_types[on])

    def _join(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(by, l_types[by]), (on, l_types[on])]
            + [(c, l_types[c]) for c in left_cols]
            + [(on + suffix, r_types[on])]
            + [(c + s, r_types[c]) for c, s in zip(right_cols, [suffix] * len(right_cols))]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        side = t["side"].to_numpy(zero_copy_only=False)
        onv = t[on].combine_chunks()
        if on_is_ts:
            onv = onv.cast(pa.int64())
        onv = onv.to_numpy(zero_copy_only=False).astype(np.int64)
        # dense key codes shared by both sides (string-safe via Arrow dict)
        codes = (
            pc.dictionary_encode(t[by].combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lmask = side == 0
        li = np.nonzero(lmask)[0]
        ri = np.nonzero(~lmask)[0]
        if len(li) == 0 or len(ri) == 0:
            return out_schema.empty_table()
        base = int(onv.min())
        shifted = onv - base
        span = int(shifted.max()) + 2  # +2: room for exclusive upper probe
        assert (int(codes.max()) + 1) * span < 2**63, "range_join composite key overflow"
        rkey = codes[ri] * span + shifted[ri]
        order = np.argsort(rkey, kind="stable")
        ri = ri[order]
        rkey = rkey[order]
        # right shifted values live in [0, span-2]; clip the window ends so
        # probes stay inside this key's composite block ([0, span-1]) —
        # windows entirely outside the data range clamp to zero matches
        ql = codes[li] * span + np.clip(shifted[li] + lo, 0, span - 1)
        qh = codes[li] * span + np.clip(shifted[li] + hi, -1, span - 2) + 1
        lo_pos = np.searchsorted(rkey, ql, side="left")
        hi_pos = np.searchsorted(rkey, qh, side="left")
        cnt = np.maximum(hi_pos - lo_pos, 0)
        lidx = np.repeat(li, cnt)
        starts = np.cumsum(cnt) - cnt
        ridx = ri[
            np.repeat(lo_pos, cnt) + (np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(starts, cnt))
        ]
        cols: dict[str, pa.Array] = {
            by: t[by].take(pa.array(lidx)),
            on: t[on].take(pa.array(lidx)),
        }
        for c in left_cols:
            cols[c] = t[c].take(pa.array(lidx))
        cols[on + suffix] = t[on].take(pa.array(ridx))
        for c in right_cols:
            cols[c + suffix] = t[c + suffix].take(pa.array(ridx))
        return pa.table(cols)

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(both, ["part"], num_parts, _join)


def purchase_click_attribution(sf_dir: str, window_minutes: int = 60, num_parts: int = 32):
    """Range join over the event stream: every purchase paired with ALL of
    the same user's clicks in the preceding ``window_minutes`` (inclusive
    both ends) — the classic attribution-window shape.  Inner join; oracle
    is a plain SQL inequality join.
    """
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def _typed(etype: str, keep: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], pa.scalar(etype))).select(keep)

        return _f

    purchases = ds.map_batches(
        _typed("purchase", ["event_id", "user_id", "ts", "value"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    clicks = ds.map_batches(
        _typed("click", ["event_id", "user_id", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = range_join(
        purchases,
        clicks,
        by="user_id",
        on="ts",
        lo=-window_minutes * 60_000_000,  # µs
        hi=0,
        left_cols=["event_id", "value"],
        right_cols=["event_id"],
        suffix="_click",
        num_parts=num_parts,
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "purchase_ts", "purchase_event_id", "value", "click_ts", "click_event_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def clicks_last_purchase(sf_dir: str, num_parts: int = 32):
    """As-of join over the event stream: every click event annotated with
    the same user's most recent purchase at-or-before the click (the
    point-in-time feature-lookup shape: "state as of the event").

    Both sides come from ONE pruned read of the events table; the oracle is
    DuckDB's native ``ASOF LEFT JOIN``.
    """
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def _typed(etype: str, keep: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], pa.scalar(etype))).select(keep)

        return _f

    clicks = ds.map_batches(
        _typed("click", ["event_id", "user_id", "ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    purchases = ds.map_batches(
        _typed("purchase", ["event_id", "user_id", "ts", "value"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = asof_join(
        clicks,
        purchases,
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["event_id", "ts", "value"],
        suffix="_purchase",
        num_parts=num_parts,
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "ts", "event_id", "purchase_event_id", "purchase_ts", "purchase_value"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# transcripts derived from the documents table (deterministic graft input)


TURN_TOKENS = 8  # words per synthesized turn
_EPOCH_US = 1704067200_000_000  # 2024-01-01T00:00:00 in µs


def transcripts_from_documents(sf_dir: str):
    """Deterministically explode each document into a multi-turn transcript
    with the BASELINE.json input_hint schema (conv_id, turn_idx, role, text,
    tool, ts) — the bridge from the shared test tables to the flagship
    dedup pipeline.  Pure function of (doc_id, text): same at any
    parallelism."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _explode(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        turns = (
            df.with_columns(
                pl.col("text").str.split(" ").alias("_w"),
            )
            .with_columns(
                (pl.int_ranges(0, pl.col("_w").list.len(), TURN_TOKENS)).alias("_starts")
            )
            .explode("_starts")
            .with_columns(
                pl.col("_w")
                .list.slice(pl.col("_starts"), TURN_TOKENS)
                .list.join(" ")
                .alias("turn_text"),
                (pl.col("_starts") // TURN_TOKENS).cast(pl.Int32).alias("turn_idx"),
            )
        )
        doc_id = turns["doc_id"].to_numpy()
        tix = turns["turn_idx"].to_numpy().astype(np.int64)
        role = np.where(tix % 2 == 0, "user", "assistant")
        tool = np.where(tix % 5 == 4, "search", None)
        role = np.where(tix % 5 == 4, "tool", role)
        ts = _EPOCH_US + doc_id.astype(np.int64) * 3_600_000_000 + tix * 30_000_000
        conv_id = pl.Series(doc_id).cast(pl.Utf8).to_numpy()
        return pa.table(
            {
                "conv_id": pa.array([f"doc-{d}" for d in conv_id], pa.string()),
                "turn_idx": pa.array(tix.astype(np.int32), pa.int32()),
                "role": pa.array(role, pa.string()),
                "text": turns["turn_text"].to_arrow().cast(pa.string()),
                "tool": pa.array(tool.tolist(), pa.string()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )

    return ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)


def conversation_stats(ts: "ray.data.Dataset", num_parts: int = 32):
    """Per-conversation profile over the transcript table (input_hint
    schema: conv_id, turn_idx, role, text, tool): turn counts by role,
    tool-turn count and mean turn length in whitespace tokens — the
    corpus-triage aggregate a transcript curation run computes before
    dedup (reference: main_ldu_ldu.py's per-group length stats, D4/A4
    analog over conversations instead of match groups).

    Scale pattern: two-level aggregation — each input batch combines to
    ONE partial row per conv_id it contains (vectorized polars group_by),
    and only those partials enter the hash exchange; the merge sums
    partials per partition.  Shuffle volume is O(distinct convs per
    batch), not O(turns).  The mean derives from int64 sums AFTER the
    merge, so it is bit-exact at any parallelism / merge order.

    Output: (conv_id, n_turns:int64, n_user:int64, n_assistant:int64,
    n_tool:int64, avg_turn_tokens:float64 rounded 6dp half-away-from-zero).
    """
    from record_linkage_ldu_ray.functions.rounding import round6
    from record_linkage_ldu_ray.runtime import partitioned_map

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        df = pl.from_arrow(t.select(["conv_id", "role", "tool"]).append_column("_toks", toks))
        out = (
            df.group_by("conv_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_turns"),
                (pl.col("role") == "user").sum().cast(pl.Int64).alias("n_user"),
                (pl.col("role") == "assistant").sum().cast(pl.Int64).alias("n_assistant"),
                pl.col("tool").is_not_null().sum().cast(pl.Int64).alias("n_tool"),
                pl.col("_toks").sum().alias("_sum_toks"),
            )
            .to_arrow()
        )
        h = fnv1a_hash_strings(out["conv_id"])
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        res = (
            df.group_by("conv_id")
            .agg(
                pl.col("n_turns").sum(),
                pl.col("n_user").sum(),
                pl.col("n_assistant").sum(),
                pl.col("n_tool").sum(),
                pl.col("_sum_toks").sum(),
            )
            .to_arrow()
        )
        avg = round6(
            res["_sum_toks"].to_numpy().astype(np.float64)
            / res["n_turns"].to_numpy().astype(np.float64)
        )
        return res.drop_columns(["_sum_toks"]).append_column(
            "avg_turn_tokens", pa.array(avg, pa.float64())
        )

    return partitioned_map(
        ts.select_columns(["conv_id", "role", "text", "tool"]).map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["part"],
        num_parts,
        _merge,
    )


def role_transition_counts(ts: "ray.data.Dataset", num_parts: int = 32):
    """Corpus-wide role-transition bigram matrix over the transcript table
    (conv_id, turn_idx, role): how often each speaker role follows each
    other within a conversation — the event_transitions pattern
    (lag/shift per key) applied to the BASELINE.json input_hint payload.

    One hash exchange keyed by conv_id (turns of a conversation co-locate),
    per-partition vectorized sort + within-conv shift, then ≤ |roles|²
    partial rows per partition merged driver-side — driver state is
    O(roles² × partitions), never O(turns).

    Output: (role_from, role_to, n:int64), no cross-conversation edges.
    """
    def _part(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["conv_id"])
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _count(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        return (
            df.sort(["conv_id", "turn_idx"])
            .with_columns(pl.col("role").shift(1).over("conv_id").alias("role_from"))
            .drop_nulls("role_from")
            .rename({"role": "role_to"})
            .group_by(["role_from", "role_to"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(["role_from", "role_to", "n"])
            .to_arrow()
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    parts = partitioned_map(
        ts.select_columns(["conv_id", "turn_idx", "role"]).map_batches(
            _part, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["part"],
        num_parts,
        _count,
    )
    tables = [x for r in parts.to_arrow_refs() if len(x := ray.get(r))]
    if not tables:
        return pa.table(
            {
                "role_from": pa.array([], pa.string()),
                "role_to": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    return (
        pl.from_arrow(pa.concat_tables(tables))
        .group_by(["role_from", "role_to"])
        .agg(pl.col("n").sum())
        .to_arrow()
    )


# ---------------------------------------------------------------------------
# global window functions: ROW_NUMBER / NTILE over a full sort


def global_rank(sf_dir: str, num_buckets: int = 10):
    """Exact global ``ROW_NUMBER()`` + ``NTILE(num_buckets)`` over the
    orders table ordered by (totalprice DESC, orderkey ASC).

    The distributed-rank pattern: range-exchange sort → materialize the
    sorted run (fixing block boundaries) → pass 1 emits ONE tiny summary
    row per block (first key, row count) → the driver prefix-sums block
    offsets (driver state is O(#blocks), never O(rows)) → offsets
    broadcast once via ``ray.put`` → pass 2 adds ``offset + arange`` per
    block.  The composite sort key is unique (orderkey is a key), so block
    key ranges are disjoint and the rank is exact at any parallelism.  The
    materialized sorted run is the cost any engine pays for a global
    window; Ray spills it to the object store rather than pinning it on
    one node.

    Reference parity: the LDU scripts globally sort result frames before
    review (score-sorted sheets, ``main_ldu_hw.py:97-146``); this is that
    step as a scale-correct distributed operator.
    """
    from record_linkage_ldu_ray.runtime import configure_exchange

    configure_exchange()
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    sorted_ds = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
    sorted_ds = sorted_ds.materialize()

    def _summary(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "first_cents": pa.array([], pa.int64()),
                    "first_key": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "first_cents": pa.array([_cents(t["o_totalprice"])[0].as_py()], pa.int64()),
                "first_key": pa.array([t["o_orderkey"][0].as_py()], pa.int64()),
                "n": pa.array([len(t)], pa.int64()),
            }
        )

    summ_parts = [
        p
        for p in ray.get(
            sorted_ds.map_batches(
                _summary, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        # a 0-row input never runs the UDF: blocks keep the SOURCE schema
        if "first_cents" in p.schema.names
    ]
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "totalprice_cents": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
            "decile": pa.array([], pa.int32()),
            "percent_rank": pa.array([], pa.float64()),
            "cume_dist": pa.array([], pa.float64()),
        }
    )
    if not summ_parts:
        import ray.data as _rd

        return _rd.from_arrow(empty)
    summ = pa.concat_tables(summ_parts)
    first_cents = summ["first_cents"].to_numpy()
    first_key = summ["first_key"].to_numpy()
    ns = summ["n"].to_numpy()
    # blocks are disjoint sorted runs → ordering by each block's FIRST row
    # under the sort order (cents DESC, key ASC) orders the blocks
    order = np.lexsort((first_key, -first_cents))
    offs = np.zeros(len(ns) + 1, np.int64)
    np.cumsum(ns[order], out=offs[1:])
    total = int(offs[-1])
    offset_by_block = {
        (int(first_cents[b]), int(first_key[b])): int(offs[i])
        for i, b in enumerate(order)
    }
    bcast = ray.put((offset_by_block, total, int(num_buckets)))

    def _rank(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        offsets, n_total, nb = ray.get(bcast)
        cents = _cents(t["o_totalprice"]).to_numpy()
        keys = t["o_orderkey"].to_numpy()
        rn0 = offsets[(int(cents[0]), int(keys[0]))] + np.arange(len(t), dtype=np.int64)
        # NTILE semantics: first (N % nb) buckets hold ceil(N/nb) rows
        q, r = divmod(n_total, nb)
        boundary = r * (q + 1)
        if q == 0:
            bucket = rn0  # N < nb: one row per bucket
        else:
            bucket = np.where(rn0 < boundary, rn0 // (q + 1), r + (rn0 - boundary) // q)
        return pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "totalprice_cents": pa.array(cents, pa.int64()),
                "rnk": pa.array(rn0 + 1, pa.int64()),
                "decile": pa.array((bucket + 1).astype(np.int32), pa.int32()),
                # keys are unique → PERCENT_RANK/CUME_DIST close over rnk
                "percent_rank": pa.array(
                    rn0 / (n_total - 1) if n_total > 1 else np.zeros(len(t)),
                    pa.float64(),
                ),
                "cume_dist": pa.array((rn0 + 1) / n_total, pa.float64()),
            }
        )

    return sorted_ds.map_batches(_rank, batch_format="pyarrow", zero_copy_batch=True)


def top_events_per_user(sf_dir: str, k: int = 3, num_parts: int = 32):
    """Grouped top-k: each user's ``k`` highest-value events
    (value DESC, ties by event_id ASC), with the per-group row number.

    Scale pattern: a per-block COMBINER first shrinks every block to at
    most ``k`` rows per user it contains (vectorized polars group-head),
    so the hash exchange moves ≤ k rows per (user, block) instead of the
    full event stream; the per-partition finalizer re-sorts and takes the
    true top-k per user.  Same partial→merge shape as the reference's
    grouped aggregations (``main_ldu_hw.py`` group stats), expressed as
    the engine's hash-partitioned primitive.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )

    def _topk_frame(df: pl.DataFrame) -> pl.DataFrame:
        return (
            df.sort(["user_id", "value", "event_id"], descending=[False, True, False])
            .group_by("user_id", maintain_order=True)
            .head(k)
        )

    def _partial(t: pa.Table) -> pa.Table:
        out = _topk_frame(pl.from_arrow(t)).to_arrow()
        h = fnv1a_hash_strings(out["user_id"].cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _final(t: pa.Table) -> pa.Table:
        df = _topk_frame(pl.from_arrow(t.drop_columns(["part"])))
        df = df.with_columns(
            (pl.col("value").cum_count().over("user_id")).cast(pl.Int64).alias("rn")
        )
        return df.to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["part"],
        num_parts,
        _final,
    )


# ---------------------------------------------------------------------------
# distributed equi-join: hash-partitioned shuffle join + broadcast dims


def hash_join(left, right, on: str, num_parts: int = 32):
    """Distributed inner equi-join of two Datasets on one key column.

    Both sides are padded to a COMMON schema (missing columns null, plus a
    ``side`` tag), unioned, and hash-partitioned by the key through ONE
    exchange; each partition then joins its co-located halves with a
    single vectorized polars join.  This is the shuffle-join shape that
    scales: the exchange is the only all-to-all, and both sides move
    exactly once regardless of their relative sizes.  (For a dimension
    table that fits in memory, broadcast it instead — see
    ``revenue_by_nation``.)  Key columns must not collide with non-key
    column names across sides.
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    l_schema = left.schema()
    r_schema = right.schema()
    # a mapped 0-row lineage reports schema None: the join is then empty
    if l_schema is None:
        return left
    if r_schema is None:
        return left.limit(0)
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    overlap = (set(l_names) & set(r_names)) - {on}
    if overlap:
        raise ValueError(f"non-key columns collide across sides: {sorted(overlap)}")
    types = {n: t for n, t in zip(l_names, l_schema.types)}
    types.update({n: t for n, t in zip(r_names, r_schema.types)})
    all_names = [on] + [n for n in l_names + r_names if n != on]

    def _pad(side: int, present: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name in all_names:
                if name in present:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, types[name])
            cols["side"] = pa.array(np.full(n, side, np.int8), pa.int8())
            h = fnv1a_hash_strings(pa.table({on: cols[on]})[on].cast(pa.string()))
            cols["part"] = pa.array(
                (h % np.uint64(num_parts)).astype(np.int32), pa.int32()
            )
            return pa.table(cols)

        return _f

    tagged = left.map_batches(
        _pad(0, l_names), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(_pad(1, r_names), batch_format="pyarrow", zero_copy_batch=True)
    )

    keep_l = [n for n in l_names if n != on]
    keep_r = [n for n in r_names if n != on]

    def _join(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        lf = df.filter(pl.col("side") == 0).select([on, *keep_l])
        rf = df.filter(pl.col("side") == 1).select([on, *keep_r])
        return lf.join(rf, on=on, how="inner").to_arrow()

    return partitioned_map(tagged, ["part"], num_parts, _join)


def revenue_by_nation(sf_dir: str, num_parts: int = 32):
    """TPC-H Q5-shaped multi-join: revenue by customer nation.

    Join topology chosen by side size, the way a 100 TB plan would be:
    nation ⋈ region are TINY → read once on the driver and broadcast as a
    custkey-side lookup; customer ⋈ orders and (orders) ⋈ lineitem are
    big-big → the ``hash_join`` shuffle join, each key moving through one
    exchange.  Revenue is exact integer arithmetic:
    ``round(extprice·100) · (100 − round(discount·100))`` summed per
    nation (units of 10⁻⁴ dollars), with a per-block partial aggregate so
    the final exchange carries ≤ |nations| rows per block.
    """
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_arrow_refs()
    nat = pa.concat_tables(ray.get(nation))
    nat_keys = nat["n_nationkey"].to_numpy()
    order = np.argsort(nat_keys)
    nat_ref = ray.put(
        (nat_keys[order], nat["n_name"].take(pa.array(order)).combine_chunks())
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def _cust_nation(t: pa.Table) -> pa.Table:
        keys, names = ray.get(nat_ref)
        nk = t["c_nationkey"].to_numpy()
        idx = np.searchsorted(keys, nk)  # nationkey is a foreign key: always hits
        return pa.table(
            {
                "o_custkey": t["c_custkey"].cast(pa.int64()),
                "n_name": names.take(pa.array(idx)),
            }
        )

    cust_n = cust.map_batches(_cust_nation, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    ord_n = hash_join(orders, cust_n, on="o_custkey", num_parts=num_parts).map_batches(
        lambda t: t.select(["o_orderkey", "n_name"]).rename_columns(
            ["l_orderkey", "n_name"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def _li_rev(t: pa.Table) -> pa.Table:
        ext = _cents(t["l_extendedprice"]).to_numpy()
        disc = _cents(t["l_discount"]).to_numpy()
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "rev": pa.array(ext * (100 - disc), pa.int64()),
            }
        )

    li_rev = li.map_batches(_li_rev, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(li_rev, ord_n, on="l_orderkey", num_parts=num_parts)

    def _partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["n_name", "rev"]))
            .group_by("n_name")
            .agg(pl.col("rev").sum().alias("revenue_c4"))
            .to_arrow()
        )

    partials = joined.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("n_name")
            .agg(pl.col("revenue_c4").sum())
            .sort("n_name")
            .to_arrow()
        )

    parts = [p for p in ray.get(partials.to_arrow_refs()) if len(p)]
    if not parts:
        return pa.table(
            {"n_name": pa.array([], pa.string()), "revenue_c4": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(parts, promote_options="permissive")
    out = _merge(merged)
    return out.set_column(0, "n_name", out["n_name"].cast(pa.string()))


def hopping_window_stats(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 15, num_parts: int = 32
):
    """Hopping (sliding) windowed aggregate: every event contributes to all
    ``window/hop`` overlapping windows it falls in; per (user_id,
    window_start) count + integer-cents value sum.

    Same two-level shape as ``tumbling_window_stats`` with one extra
    VECTORIZED fan-out step: each batch repeats its rows window/hop times
    with shifted window starts (an Arrow take + arithmetic — no Python per
    row), combines locally per (user, window), and only the combined
    partials (≤ distinct user-windows per batch) enter the single hash
    exchange.  Fan-out before combine keeps the exchange O(windows), not
    O(events × windows).

    Output: (user_id, window_start, n_events:int64, sum_value_cents:int64).
    """
    assert window_minutes % hop_minutes == 0, "window must be a multiple of hop"
    k = window_minutes // hop_minutes
    hop_us = np.int64(hop_minutes) * 60 * 1_000_000
    win_us = np.int64(window_minutes) * 60 * 1_000_000

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        n = len(t)
        ts = t["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]")
        us = ts.astype(np.int64)
        uid = t["user_id"].to_numpy()
        cents = _cents(t["value"]).to_numpy()
        # windows containing ts: starts in (ts - window, ts] on the hop grid
        last_start = (us // hop_us) * hop_us  # latest grid start ≤ ts
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        shift = np.tile(np.arange(k, dtype=np.int64), n)
        starts = last_start[idx] - shift * hop_us
        keep = starts > us[idx] - win_us  # window [start, start+win) contains ts
        idx, starts = idx[keep], starts[keep]
        df = pl.DataFrame(
            {
                "user_id": uid[idx],
                "window_start": starts.astype("datetime64[us]"),
                "cents": cents[idx],
            }
        )
        out = (
            df.group_by(["user_id", "window_start"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("cents").sum().alias("sum_value_cents"),
            )
            .to_arrow()
        )
        h = fnv1a_hash_strings(out["user_id"].cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by(["user_id", "window_start"])
            .agg(pl.col("n_events").sum(), pl.col("sum_value_cents").sum())
            .sort(["user_id", "window_start"])
            .to_arrow()
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map(partials, ["part"], num_parts, _merge)


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(status, priority): counts + integer-cents totals at
    all three grains (status×priority, status, grand total).

    Scale shape: the fact table combines per block at the FINEST grain
    (tiny partials), one driver merge, and the coarser rollup levels are
    derived from the finest aggregate — never from a second scan.  NULL
    marks the rolled-up dimension exactly like SQL ROLLUP.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .with_columns((pl.col("o_totalprice") * 100).round(0).cast(pl.Int64).alias("c"))
            .group_by(["o_orderstatus", "o_orderpriority"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_orders"),
                pl.col("c").sum().alias("sum_totalprice_cents"),
            )
            .to_arrow()
        )

    parts = [
        p
        for p in ray.get(
            ds.map_batches(
                _partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if len(p)
    ]
    if not parts:
        return pa.table(
            {
                "o_orderstatus": pa.array([], pa.string()),
                "o_orderpriority": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
                "sum_totalprice_cents": pa.array([], pa.int64()),
            }
        )
    fine = (
        pl.from_arrow(pa.concat_tables(parts, promote_options="permissive"))
        .group_by(["o_orderstatus", "o_orderpriority"])
        .agg(pl.col("n_orders").sum(), pl.col("sum_totalprice_cents").sum())
    )
    by_status = fine.group_by("o_orderstatus").agg(
        pl.col("n_orders").sum(), pl.col("sum_totalprice_cents").sum()
    ).with_columns(pl.lit(None, pl.String).alias("o_orderpriority"))
    total = fine.select(
        pl.col("n_orders").sum(), pl.col("sum_totalprice_cents").sum()
    ).with_columns(
        pl.lit(None, pl.String).alias("o_orderstatus"),
        pl.lit(None, pl.String).alias("o_orderpriority"),
    )
    cols = ["o_orderstatus", "o_orderpriority", "n_orders", "sum_totalprice_cents"]
    out = pl.concat([fine.select(cols), by_status.select(cols), total.select(cols)])
    out = out.sort(cols[:2], nulls_last=True)
    t = out.to_arrow()
    return t.set_column(0, "o_orderstatus", t["o_orderstatus"].cast(pa.string())).set_column(
        1, "o_orderpriority", t["o_orderpriority"].cast(pa.string())
    )


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str, num_parts: int = 32):
    """Pivot the event stream to one wide row per user: a count column per
    event type plus the total value in cents.

    The pivot is a pure combiner shape: each block group-bys to one
    partial row per user it contains (conditional counts vectorized as a
    polars pivot-by-aggregation — the type set is FIXED config, so the
    schema is static and blocks combine independently), and the single
    hash exchange carries wide partials, not events.  A dynamic column set
    would need a first pass to discover types; fixed vocabularies are the
    scale-safe form of pivot.

    Output: (user_id, n_click, n_error, n_purchase, n_signup, n_view,
    sum_value_cents) — all int64.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def _agg(df: pl.DataFrame) -> pl.DataFrame:
        return df.group_by("user_id").agg(
            *[
                (pl.col("event_type") == et).cast(pl.Int64).sum().alias(f"n_{et}")
                for et in _PIVOT_TYPES
            ],
            pl.col("cents").sum().alias("sum_value_cents"),
        )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            (pl.col("value") * 100).round(0).cast(pl.Int64).alias("cents")
        )
        out = _agg(df).to_arrow()
        h = fnv1a_hash_strings(out["user_id"].cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        return (
            df.group_by("user_id")
            .agg(
                *[pl.col(f"n_{et}").sum() for et in _PIVOT_TYPES],
                pl.col("sum_value_cents").sum(),
            )
            .sort("user_id")
            .to_arrow()
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map(partials, ["part"], num_parts, _merge)


def hash_anti_join(left, right, on: str, num_parts: int = 32):
    """Distributed anti-join: rows of ``left`` whose key has NO match in
    ``right`` (SQL ``NOT EXISTS``).

    The right side collapses to DISTINCT keys per block BEFORE the
    exchange (set-membership needs keys, not rows), both sides co-locate
    through the same single hash exchange as ``hash_join``, and each
    partition subtracts with one vectorized ``is_in``.  Exchange volume:
    full left + distinct right keys.
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    l_schema = left.schema()
    if l_schema is None:  # 0-row mapped left: nothing can survive
        return left
    if right.schema() is None:  # empty right: NOT EXISTS keeps every left row
        return left
    l_names = list(l_schema.names)
    types = dict(zip(l_names, l_schema.types))

    def _tag_left(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t[on].cast(pa.string()))
        t = t.append_column("side", pa.array(np.zeros(len(t), np.int8), pa.int8()))
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _tag_right(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[on].combine_chunks())
        cols = {}
        for name in l_names:
            cols[name] = keys if name == on else pa.nulls(len(keys), types[name])
        out = pa.table(cols)
        h = fnv1a_hash_strings(out[on].cast(pa.string()))
        out = out.append_column(
            "side", pa.array(np.ones(len(keys), np.int8), pa.int8())
        )
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    tagged = left.map_batches(
        _tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([on]).map_batches(
            _tag_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def _anti(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy()
        lt = t.filter(pa.array(side == 0)).drop_columns(["side", "part"])
        rt = t.filter(pa.array(side == 1))
        rkeys = pc.unique(rt[on].combine_chunks())
        mask = pc.invert(pc.is_in(lt[on].combine_chunks(), value_set=rkeys))
        return lt.filter(mask)

    return partitioned_map(tagged, ["part"], num_parts, _anti)


def orders_no_bulk_items(sf_dir: str, min_qty: float = 49.5, num_parts: int = 32):
    """Orders with NO bulk line item (every item quantity ≤ ``min_qty``) —
    the anti-join demonstration query: the probe side is the filtered
    lineitem key set (filter pushed before the exchange), the left side the
    full orders table.

    Output: (o_orderkey:int64, totalprice_cents:int64).
    """
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "totalprice_cents": _cents(t["o_totalprice"]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def _bulk_keys(t: pa.Table) -> pa.Table:
        mask = pc.greater(t["l_quantity"], pa.scalar(min_qty))
        return pa.table(
            {"o_orderkey": t.filter(mask)["l_orderkey"].cast(pa.int64())}
        )

    return hash_anti_join(
        orders.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True),
        li.map_batches(_bulk_keys, batch_format="pyarrow", zero_copy_batch=True),
        on="o_orderkey",
        num_parts=num_parts,
    )


def hash_semi_join(left, right, on: str, num_parts: int = 32):
    """Distributed semi-join: rows of ``left`` whose key HAS a match in
    ``right`` (SQL ``EXISTS``) — match multiplicity never multiplies rows.

    Same single-exchange plumbing as ``hash_anti_join`` (right side
    collapses to distinct keys per block before the shuffle); the
    per-partition probe keeps instead of subtracts.
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    l_schema = left.schema()
    if l_schema is None:  # 0-row mapped left: nothing to keep
        return left
    if right.schema() is None:  # empty right: EXISTS matches nothing
        return left.limit(0)
    l_names = list(l_schema.names)
    types = dict(zip(l_names, l_schema.types))

    def _tag_left(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t[on].cast(pa.string()))
        t = t.append_column("side", pa.array(np.zeros(len(t), np.int8), pa.int8()))
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _tag_right(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[on].combine_chunks())
        cols = {}
        for name in l_names:
            cols[name] = keys if name == on else pa.nulls(len(keys), types[name])
        out = pa.table(cols)
        h = fnv1a_hash_strings(out[on].cast(pa.string()))
        out = out.append_column("side", pa.array(np.ones(len(keys), np.int8), pa.int8()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    tagged = left.map_batches(
        _tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.select_columns([on]).map_batches(
            _tag_right, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def _semi(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy()
        lt = t.filter(pa.array(side == 0)).drop_columns(["side", "part"])
        rt = t.filter(pa.array(side == 1))
        rkeys = pc.unique(rt[on].combine_chunks())
        return lt.filter(pc.is_in(lt[on].combine_chunks(), value_set=rkeys))

    return partitioned_map(tagged, ["part"], num_parts, _semi)


def orders_with_bulk_items(sf_dir: str, min_qty: float = 49.5, num_parts: int = 32):
    """Semi-join demonstration: orders having ≥1 bulk line item — each such
    order appears EXACTLY ONCE however many bulk items it has.

    Output: (o_orderkey:int64, totalprice_cents:int64).
    """
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "totalprice_cents": _cents(t["o_totalprice"]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def _bulk_keys(t: pa.Table) -> pa.Table:
        mask = pc.greater(t["l_quantity"], pa.scalar(min_qty))
        return pa.table({"o_orderkey": t.filter(mask)["l_orderkey"].cast(pa.int64())})

    return hash_semi_join(
        orders.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True),
        li.map_batches(_bulk_keys, batch_format="pyarrow", zero_copy_batch=True),
        on="o_orderkey",
        num_parts=num_parts,
    )


def json_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the ``props`` JSON column
    (vectorized ``json_path_match``, no per-row Python), pull the integer
    field ``k`` and aggregate it per event type.

    Combiner shape: each block reduces to ≤ |event types| partial rows
    (count / sum / min / max are all associative), tiny driver merge.

    Output: (event_type, n_events:int64, sum_k:int64, min_k:int64,
    max_k:int64).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "event_type": pl.from_arrow(t["event_type"].combine_chunks()),
                "k": pl.from_arrow(t["props"].combine_chunks())
                .str.json_path_match("$.k")
                .cast(pl.Int64),
            }
        )
        return (
            df.group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("k").sum().alias("sum_k"),
                pl.col("k").min().alias("min_k"),
                pl.col("k").max().alias("max_k"),
            )
            .to_arrow()
        )

    parts = [
        p
        for p in ray.get(
            ds.map_batches(
                _partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if len(p)
    ]
    if not parts:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                "sum_k": pa.array([], pa.int64()),
                "min_k": pa.array([], pa.int64()),
                "max_k": pa.array([], pa.int64()),
            }
        )
    out = (
        pl.from_arrow(pa.concat_tables(parts, promote_options="permissive"))
        .group_by("event_type")
        .agg(
            pl.col("n_events").sum(),
            pl.col("sum_k").sum(),
            pl.col("min_k").min(),
            pl.col("max_k").max(),
        )
        .sort("event_type")
        .to_arrow()
    )
    return out.set_column(0, "event_type", out["event_type"].cast(pa.string()))


def brand_cooccurrence(sf_dir: str, num_parts: int = 32):
    """Market-basket co-occurrence: for every unordered brand pair, the
    number of orders containing BOTH brands (the association-mining /
    co-occurrence-matrix primitive).

    Plan: the part→brand dimension broadcasts once (``ray.put``; parts are
    a bounded catalog, the classic broadcast side), lineitem co-locates by
    order key through ONE hash exchange, each partition reduces its orders
    to distinct (order, brand) rows and enumerates within-order brand
    pairs with the engine's vectorized triangle kernel — emitting only
    per-partition PAIR COUNTS (≤ |brands|² tiny rows), which the driver
    merges.  The raw basket stream is never re-shuffled.

    Output: (brand_a, brand_b, n_orders:int64), brand_a < brand_b.
    """
    from record_linkage_ldu_ray.pipelines.docdedup import _triangle_pairs_sorted
    from record_linkage_ldu_ray.runtime import partitioned_map

    part_tbl = pa.concat_tables(
        ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
            ).to_arrow_refs()
        )
    )
    pk = part_tbl["p_partkey"].to_numpy()
    order = np.argsort(pk)
    # dictionary sorted lexicographically so code order == string order:
    # within-order pairs oriented by code are then brand_a < brand_b
    brand_dict = pc.unique(part_tbl["p_brand"].combine_chunks()).sort()
    brand_codes = pc.index_in(
        part_tbl["p_brand"].combine_chunks(), value_set=brand_dict
    ).to_numpy().astype(np.int32)
    bcast = ray.put((pk[order], brand_codes[order]))
    brands = np.asarray(brand_dict.to_pylist(), dtype=object)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def _tag(t: pa.Table) -> pa.Table:
        keys, codes = ray.get(bcast)
        idx = np.searchsorted(keys, t["l_partkey"].to_numpy())  # FK: always hits
        out = pa.table(
            {
                "o": t["l_orderkey"].cast(pa.int64()),
                "b": pa.array(codes[idx], pa.int32()),
            }
        )
        h = fnv1a_hash_strings(out["o"].cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    nb = len(brands)

    def _pairs(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .unique(["o", "b"])
            .sort(["o", "b"])
        )
        o = df["o"].to_numpy()
        b = df["b"].to_numpy().astype(np.int64)
        i, j = _triangle_pairs_sorted(o)
        if len(i) == 0:
            return pa.table(
                {"code": pa.array([], pa.int64()), "n_orders": pa.array([], pa.int64())}
            )
        # brands sorted within order → b[i] < b[j]; pack pair into one code
        code = b[i] * nb + b[j]
        cnt = np.bincount(code, minlength=nb * nb).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "code": pa.array(nz, pa.int64()),
                "n_orders": pa.array(cnt[nz], pa.int64()),
            }
        )

    tagged = li.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    parts = [
        p
        for p in ray.get(
            partitioned_map(tagged, ["part"], num_parts, _pairs).to_arrow_refs()
        )
        if len(p)
    ]
    if not parts:
        return pa.table(
            {
                "brand_a": pa.array([], pa.string()),
                "brand_b": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    merged = (
        pl.from_arrow(pa.concat_tables(parts, promote_options="permissive"))
        .group_by("code")
        .agg(pl.col("n_orders").sum())
    )
    codes = merged["code"].to_numpy()
    t = pa.table(
        {
            "brand_a": pa.array(brands[(codes // nb).astype(np.int64)], pa.string()),
            "brand_b": pa.array(brands[(codes % nb).astype(np.int64)], pa.string()),
            "n_orders": merged["n_orders"].to_arrow().cast(pa.int64()),
        }
    )
    return t.sort_by([("brand_a", "ascending"), ("brand_b", "ascending")])


def event_transitions(sf_dir: str, num_parts: int = 32):
    """Global first-order event-type transition counts: for each
    (prev_type → next_type) pair, how many consecutive event pairs (per
    user, ordered by ts then event_id) make that transition — the Markov /
    sequence-mining primitive over the event stream.

    Users co-locate through one hash exchange; each partition sorts its
    users once, takes a vectorized shift per user, and emits only the
    ≤ |types|² local transition counts for a tiny driver merge.

    Output: (prev_type, next_type, n_transitions:int64).
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "event_type", "ts"]
    )

    def _tag(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["user_id"].cast(pa.string()))
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _count(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                pl.col("event_type").shift(1).over("user_id").alias("prev_type")
            )
            .drop_nulls("prev_type")
        )
        return (
            df.group_by(["prev_type", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("n_transitions"))
            .rename({"event_type": "next_type"})
            .to_arrow()
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    parts = [
        p
        for p in ray.get(
            partitioned_map(tagged, ["part"], num_parts, _count).to_arrow_refs()
        )
        if len(p)
    ]
    if not parts:
        return pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n_transitions": pa.array([], pa.int64()),
            }
        )
    out = (
        pl.from_arrow(pa.concat_tables(parts, promote_options="permissive"))
        .group_by(["prev_type", "next_type"])
        .agg(pl.col("n_transitions").sum())
        .sort(["prev_type", "next_type"])
        .to_arrow()
    )
    return out.set_column(0, "prev_type", out["prev_type"].cast(pa.string())).set_column(
        1, "next_type", out["next_type"].cast(pa.string())
    )


def customer_running_totals(sf_dir: str, num_parts: int = 32):
    """Per-customer running order total (cumulative window aggregate):
    each order row carries the sum of that customer's order values up to
    and including it, ordered by (o_orderdate, o_orderkey).

    Customers co-locate through one hash exchange; each partition does one
    vectorized sort + grouped cumulative sum.  Completes the engine's
    window-function family (rank/NTILE = ``global_rank``, lag =
    ``event_transitions``, grouped head = ``top_events_per_user``).
    Integer cents keep the running sum bit-exact against SQL at any merge
    order.

    Output: (o_custkey, o_orderkey, o_orderdate, running_cents:int64).
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def _tag(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "cents": _cents(t["o_totalprice"]),
            }
        )
        h = fnv1a_hash_strings(out["o_custkey"].cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _cum(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["o_custkey", "o_orderdate", "o_orderkey"])
            .with_columns(
                pl.col("cents").cum_sum().over("o_custkey").alias("running_cents")
            )
            .drop("cents")
        )
        return df.to_arrow()

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map(tagged, ["part"], num_parts, _cum)


def price_dense_rank(sf_dir: str):
    """``DENSE_RANK()`` over order totalprice (DESC) — tied prices share a
    rank and ranks are gapless.

    The distributed shape: per-block DISTINCT key partials (tiny) → driver
    union → the sorted distinct-key array broadcasts once via ``ray.put``
    (prices are quantized, so the distinct set is bounded however many
    rows exist) → one streaming map does a ``searchsorted`` rank lookup
    per batch.  No sort of the data itself, no exchange at all.

    Output: (o_orderkey, totalprice_cents, drank:int64).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def _distinct(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c": pa.array(np.unique(_cents(t["o_totalprice"]).to_numpy()), pa.int64())}
        )

    parts = [
        p["c"].to_numpy()
        for p in ray.get(
            ds.map_batches(
                _distinct, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if len(p) and "c" in p.schema.names
    ]
    if not parts:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "totalprice_cents": pa.array([], pa.int64()),
                "drank": pa.array([], pa.int64()),
            }
        )
    distinct = np.unique(np.concatenate(parts))  # ascending
    dref = ray.put(distinct)
    n_distinct = len(distinct)

    def _lookup(t: pa.Table) -> pa.Table:
        d = ray.get(dref)
        cents = _cents(t["o_totalprice"]).to_numpy()
        # DESC dense rank: highest price = 1
        drank = n_distinct - np.searchsorted(d, cents)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "totalprice_cents": pa.array(cents, pa.int64()),
                "drank": pa.array(drank.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_lookup, batch_format="pyarrow", zero_copy_batch=True)


def order_share_of_customer(sf_dir: str, num_parts: int = 32):
    """Each order's share of its customer's lifetime order value — the
    unordered full-partition window frame (``SUM() OVER (PARTITION BY)``),
    complementing the ordered cumulative frame of
    ``customer_running_totals``.

    One exchange by customer; each partition computes group totals and the
    per-row ratio vectorized.  The share is an exact float64 division of
    two int64 cents values, so SQL reproduces it bit-for-bit.

    Output: (o_custkey, o_orderkey, totalprice_cents:int64,
    share:float64).
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def _tag(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "totalprice_cents": _cents(t["o_totalprice"]),
            }
        )
        h = fnv1a_hash_strings(out["o_custkey"].cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _share(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"])).with_columns(
            (
                pl.col("totalprice_cents").cast(pl.Float64)
                / pl.col("totalprice_cents").sum().over("o_custkey").cast(pl.Float64)
            ).alias("share")
        )
        return df.to_arrow()

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map(tagged, ["part"], num_parts, _share)
