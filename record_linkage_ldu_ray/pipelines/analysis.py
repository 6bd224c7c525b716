"""Run analysis / review operators (SURVEY §2 A4, A5, D5, D6, S5).

These are the reference's post-decision review tools, re-expressed so the
heavy part stays distributed and only group-level summaries reach the
driver:

- ``cluster_size_stats``     A4  group-length describe (main_ldu_hw.py:93-94)
- ``classify_clusters``      D5  verified / contradicted / unverified per
                                 cluster against the labeled pairs
                                 (main_ldu_hw.py:163-194)
- ``diff_cluster_runs``      D6  A/B diff of two clustering runs by
                                 canonical member-set signature
                                 (compare_matching_methods.py:4-21)
- ``score_histograms``       S5  fixed-bin histograms of score columns
                                 (main_ldu_hw.py:267-327) — the engine
                                 emits histogram DATA; plotting is a
                                 driver-side presentation step
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings, splitmix64
from record_linkage_ldu_ray.runtime import partitioned_map


def _add_cluster_part(num_parts: int):
    def _f(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(t["cluster_id"])
        return t.append_column(
            "kpart", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    return _f


def cluster_sizes(clusters_ds, num_partitions: int = 32):
    """(cluster_id, size) — distributed partial counts, one row per
    cluster."""

    def _count(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["kpart"]))
        return (
            df.group_by("cluster_id")
            .agg(pl.len().cast(pl.Int64).alias("size"))
            .sort("cluster_id")
            .to_arrow()
        )

    withpart = clusters_ds.map_batches(
        _add_cluster_part(num_partitions), batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(withpart, ["kpart"], num_partitions, _count)


def cluster_size_stats(clusters_ds) -> dict:
    """A4 group-length describe: count/mean/max/percentiles of cluster
    sizes — the reference's ``pd.Series(lengths).describe()``
    (main_ldu_hw.py:93-94), also the skew monitor for hot components."""
    sizes = cluster_sizes(clusters_ds).to_pandas()["size"]
    if len(sizes) == 0:
        return {"n_clusters": 0}
    return {
        "n_clusters": int(len(sizes)),
        "n_records": int(sizes.sum()),
        "mean": float(sizes.mean()),
        "p50": float(sizes.quantile(0.5)),
        "p90": float(sizes.quantile(0.9)),
        "p99": float(sizes.quantile(0.99)),
        "max": int(sizes.max()),
        "n_singletons": int((sizes == 1).sum()),
    }


def classify_clusters(clusters_ds, labeled_pairs_path: str) -> dict:
    """D5 ``separate_groups`` analog (main_ldu_hw.py:163-194): classify
    clusters against the labeled pairs — ``verified`` (≥1 labeled positive
    inside, no labeled negative inside), ``contradicted`` (≥1 labeled
    negative pair placed in the same cluster), ``unverified`` (no labeled
    pair inside).

    The labels are tiny → broadcast; the cluster table is filtered
    DISTRIBUTED to labeled conv_ids only, so only |labels| rows reach the
    driver regardless of corpus size.
    """
    labels = pq.read_table(labeled_pairs_path)
    lab_ids = np.unique(
        np.concatenate(
            [
                np.asarray(labels["conv_id_a"].to_pylist(), dtype=object),
                np.asarray(labels["conv_id_b"].to_pylist(), dtype=object),
            ]
        ).astype(str)
    )
    lab_ref = ray.put(np.sort(lab_ids))

    def _filter(t: pa.Table) -> pa.Table:
        ids = ray.get(lab_ref)
        conv = np.asarray(t["conv_id"].to_pylist(), dtype=object).astype(str)
        idx = np.searchsorted(ids, conv)
        idx[idx == len(ids)] = len(ids) - 1
        keep = ids[idx] == conv if len(ids) else np.zeros(len(t), bool)
        return t.filter(pa.array(keep))

    small = clusters_ds.map_batches(
        _filter, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    conv_to_cluster = dict(zip(small["conv_id"], small["cluster_id"]))

    verdict: dict[str, str] = {}
    for a, b, m in zip(
        labels["conv_id_a"].to_pylist(),
        labels["conv_id_b"].to_pylist(),
        labels["is_match"].to_pylist(),
    ):
        ca, cb = conv_to_cluster.get(a), conv_to_cluster.get(b)
        if ca is None or cb is None:
            continue
        if ca == cb:
            if m:
                if verdict.get(ca) != "contradicted":
                    verdict[ca] = "verified"
            else:
                verdict[ca] = "contradicted"
    counts = {"verified": 0, "contradicted": 0}
    for v in verdict.values():
        counts[v] += 1
    n_clusters = cluster_sizes(clusters_ds).count()
    counts["unverified"] = int(n_clusters - len(verdict))
    counts["n_clusters"] = int(n_clusters)
    return counts


def cluster_signatures(clusters_ds, num_partitions: int = 32):
    """(cluster_id, signature) — order-insensitive 64-bit member-set
    signature per cluster (sum of splitmix64(member hash) wraps), computed
    distributed."""

    def _sig(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["kpart"]))
        h = splitmix64(fnv1a_hash_strings(t["conv_id"]))
        df = df.with_columns(pl.Series("h", h.view(np.int64)))
        out = (
            df.group_by("cluster_id")
            .agg(
                pl.col("h").sum().alias("signature"),  # wrapping i64 sum
                pl.len().cast(pl.Int64).alias("size"),
            )
            .sort("cluster_id")
        )
        return out.to_arrow()

    withpart = clusters_ds.map_batches(
        _add_cluster_part(num_partitions), batch_format="pyarrow", zero_copy_batch=True
    )
    return partitioned_map(withpart, ["kpart"], num_partitions, _sig)


def diff_cluster_runs(clusters_a, clusters_b) -> dict:
    """D6 ``compare_matching_methods`` analog: A/B diff of two clustering
    runs by canonical member-set signature — how many clusters are
    identical, how many exist only in one run.  Signatures are computed
    distributed; only (cluster, signature) rows reach the driver."""
    sa = cluster_signatures(clusters_a).to_pandas()
    sb = cluster_signatures(clusters_b).to_pandas()
    set_a = set(sa["signature"])
    set_b = set(sb["signature"])
    return {
        "n_clusters_a": int(len(sa)),
        "n_clusters_b": int(len(sb)),
        "n_common": int(len(set_a & set_b)),
        "n_only_a": int(len(set_a - set_b)),
        "n_only_b": int(len(set_b - set_a)),
    }


def score_histograms(
    scores_ds,
    columns: list[str] | None = None,
    bins: int = 20,
    lo: float = 0.0,
    hi: float = 1.0,
):
    """S5 histogram panels (main_ldu_hw.py:267-327) as DATA: fixed-bin
    counts per score column — partial counts inside map_batches, one tiny
    driver-side merge.  Returns a pandas DataFrame (column, bin_lo, count).
    """
    from record_linkage_ldu_ray.stages.scoring import SCORE_FEATURES

    cols = columns or SCORE_FEATURES
    edges = np.linspace(lo, hi, bins + 1)

    def _partial(t: pa.Table) -> pa.Table:
        out_col, out_bin, out_cnt = [], [], []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            cnt, _ = np.histogram(np.clip(v, lo, hi), bins=edges)
            out_col.extend([c] * bins)
            out_bin.extend(range(bins))
            out_cnt.extend(cnt.tolist())
        return pa.table(
            {
                "column": pa.array(out_col, pa.string()),
                "bin": pa.array(out_bin, pa.int32()),
                "count": pa.array(out_cnt, pa.int64()),
            }
        )

    parts = scores_ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    merged = parts.groupby(["column", "bin"], as_index=False)["count"].sum()
    merged["bin_lo"] = edges[merged["bin"]]
    return merged.sort_values(["column", "bin"]).reset_index(drop=True)


def profile_table(ds: "ray.data.Dataset", columns: list[str], num_parts: int = 32):
    """Exact per-column data profile: row count, null count, distinct count.

    One pass, one exchange: each block emits (a) a tiny counts row per
    column and (b) its per-column DISTINCT value hashes tagged with the
    column index — all columns share a single hash exchange (partitioned by
    value hash), where each partition counts the distinct hashes it
    exclusively owns per column.  Exchange volume is the number of distinct
    (column, value) pairs per block × 8 bytes, never the raw values.
    Distinctness is over the value's string form, which is injective for
    the supported types (ints, strings, timestamps, non-degenerate
    floats) — equal up to 64-bit hash collisions.

    Output: (column:string, n_rows:int64, n_nulls:int64, n_distinct:int64),
    one row per requested column.
    """
    import ray.data as _rd  # noqa: F401  (ds type only)

    cols = list(columns)

    def _partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hs, cidx = [], []
        counts = []
        for i, c in enumerate(cols):
            col = t[c].combine_chunks()
            n_null = int(pc.sum(pc.is_null(col).cast(pa.int8())).as_py() or 0)
            valid = col.drop_null()
            u = pc.unique(valid.cast(pa.string()))
            h = fnv1a_hash_strings(u)
            hs.append(h)
            cidx.append(np.full(len(h), i, np.int8))
            counts.append((i, len(t), n_null))
        h_all = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        meta = pa.table(
            {
                "col": pa.array([c for c, _, _ in counts], pa.int8()),
                "n_rows": pa.array([r for _, r, _ in counts], pa.int64()),
                "n_nulls": pa.array([x for _, _, x in counts], pa.int64()),
                "h": pa.array(np.zeros(len(counts), np.uint64), pa.uint64()),
                "kind": pa.array(np.zeros(len(counts), np.int8), pa.int8()),
                "part": pa.array(np.zeros(len(counts), np.int32), pa.int32()),
            }
        )
        vals = pa.table(
            {
                "col": pa.array(np.concatenate(cidx) if hs else [], pa.int8()),
                "n_rows": pa.array(np.zeros(len(h_all), np.int64), pa.int64()),
                "n_nulls": pa.array(np.zeros(len(h_all), np.int64), pa.int64()),
                "h": pa.array(h_all, pa.uint64()),
                "kind": pa.array(np.ones(len(h_all), np.int8), pa.int8()),
                "part": pa.array(
                    (h_all % np.uint64(num_parts)).astype(np.int32), pa.int32()
                ),
            }
        )
        return pa.concat_tables([meta, vals])

    def _count(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        meta = (
            df.filter(pl.col("kind") == 0)
            .group_by("col")
            .agg(pl.col("n_rows").sum(), pl.col("n_nulls").sum())
        )
        dist = (
            df.filter(pl.col("kind") == 1)
            .unique(["col", "h"])
            .group_by("col")
            .agg(pl.len().cast(pl.Int64).alias("n_distinct"))
        )
        return meta.join(dist, on="col", how="full", coalesce=True).to_arrow()

    part_rows = [
        p
        for p in ray.get(
            partitioned_map(
                ds.select_columns(cols).map_batches(
                    _partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["part"],
                num_parts,
                _count,
            ).to_arrow_refs()
        )
        if len(p)
    ]
    merged = (
        pl.from_arrow(pa.concat_tables(part_rows, promote_options="permissive"))
        .group_by("col")
        .agg(
            pl.col("n_rows").sum(),
            pl.col("n_nulls").sum(),
            pl.col("n_distinct").sum(),
        )
        .sort("col")
    )
    name = pa.array([cols[int(i)] for i in merged["col"].to_numpy()], pa.string())
    out = merged.to_arrow()
    return pa.table(
        {
            "column": name,
            "n_rows": out["n_rows"].cast(pa.int64()),
            "n_nulls": out["n_nulls"].cast(pa.int64()),
            "n_distinct": out["n_distinct"].cast(pa.int64()),
        }
    )


def key_skew_report(
    ds: "ray.data.Dataset", key_col: str, top: int = 10, num_parts: int = 32
):
    """Shuffle-key skew diagnostics: the ``top`` heaviest keys of a column
    with their row counts — the planning pass behind the engine's hot-block
    salting (``stages/blocking.py`` caps + salts blocks above
    ``max_block_records``; this operator is how a user finds WHICH keys
    need it before running a groupby/join keyed on them at 100 TB).

    Combiner shape: per-block partial counts (one row per distinct key per
    block), one 8-byte-hash exchange, per-partition exact local top-k
    (each partition owns its keys), bounded driver merge — identical
    three-level plan to ``vocab_top_tokens``.  Deterministic tie-break:
    count DESC, key ASC.

    Output: (key:string, n_rows:int64), ``top`` rows.
    """

    def _partial(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t.select([key_col]))
            .group_by(key_col)
            .agg(pl.len().cast(pl.Int64).alias("n_rows"))
            .to_arrow()
        )
        key_str = out[key_col].cast(pa.string())
        out = pa.table({"key": key_str, "n_rows": out["n_rows"]})
        h = fnv1a_hash_strings(out["key"].combine_chunks())
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    def _localtop(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("key", pa.string()), ("n_rows", pa.int64())]).empty_table()
        agg = (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by("key")
            .agg(pl.col("n_rows").sum())
            .sort(["n_rows", "key"], descending=[True, False])
            .head(top)
        )
        return agg.to_arrow().cast(
            pa.schema([("key", pa.string()), ("n_rows", pa.int64())])
        )

    parts = [
        p
        for p in ray.get(
            partitioned_map(
                ds.select_columns([key_col]).map_batches(
                    _partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["part"],
                num_parts,
                _localtop,
            ).to_arrow_refs()
        )
        if len(p)
    ]
    if not parts:
        return pa.schema([("key", pa.string()), ("n_rows", pa.int64())]).empty_table()
    merged = pa.concat_tables(parts)
    cnt = merged["n_rows"].to_numpy()
    keys = np.asarray(merged["key"].to_pylist(), dtype=object)
    order = np.lexsort((keys, -cnt))[:top]
    return merged.take(pa.array(order))
