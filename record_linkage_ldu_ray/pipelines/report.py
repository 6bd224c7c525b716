"""S4 presentation rendering — the reference's ``groups_to_df`` analog
(main_ldu_hw.py:97-146): a manual-review frame where each row is an
original record, consecutive rows are one group (same entity), and groups
are separated by blank rows.  "This is meant for easy manual examination
and not for further processing" (main_ldu_hw.py:101-102) — so it is a
bounded DRIVER-SIDE artifact: the cluster selection and per-record summary
run distributed, only the chosen ``max_clusters`` groups materialize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _nonsingleton_clusters(clusters_ds, max_clusters: int) -> list:
    """Cluster ids with ≥2 members, largest first, capped — a distributed
    groupby-count whose OUTPUT is bounded by max_clusters."""
    counts = clusters_ds.groupby("cluster_id", num_partitions=16).count()
    import pyarrow.compute as pc

    multi = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)), batch_format="pyarrow"
    )
    rows = multi.take_all()  # one row per non-singleton CLUSTER (small)
    rows.sort(key=lambda r: (-int(r["count()"]), str(r["cluster_id"])))
    return [r["cluster_id"] for r in rows[:max_clusters]]


def clusters_to_review_frame(
    clusters_ds: "ray.data.Dataset",
    transcripts_ds: "ray.data.Dataset",
    max_clusters: int = 100,
    text_preview_chars: int = 80,
) -> pd.DataFrame:
    """Render matched groups for manual review (groups_to_df shape):

    columns = (cluster_id, conv_id, source, n_turns, ts_min, text_preview,
    group_size); consecutive rows share a cluster; a blank row (empty
    strings / NaN) separates clusters — exactly the reference's reviewer
    format.  ``clusters_ds``: (conv_id, cluster_id) from the dedup flagship
    or (side, conv_id, cluster_id) from bipartite linkage (``side`` becomes
    the ``source`` column, main_ldu_hw.py:122).
    """
    chosen = _nonsingleton_clusters(clusters_ds, max_clusters)
    if not chosen:
        return pd.DataFrame(
            columns=[
                "cluster_id", "conv_id", "source", "n_turns",
                "ts_min", "text_preview", "group_size",
            ]
        )
    chosen_ref = ray.put(pa.array(sorted(map(str, chosen)), pa.string()))

    has_side = "side" in clusters_ds.schema().names

    def _members(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = ray.get(chosen_ref)
        return t.filter(pc.is_in(t["cluster_id"].cast(pa.string()), value_set=sel))

    members = clusters_ds.map_batches(_members, batch_format="pyarrow").to_pandas()
    member_set = ray.put(pa.array(sorted(map(str, set(members["conv_id"]))), pa.string()))

    def _summarize(t: pa.Table) -> pa.Table:
        """Per-conv review summary for member conversations only."""
        import polars as pl
        import pyarrow.compute as pc

        sel = ray.get(member_set)
        sub = t.filter(pc.is_in(t["conv_id"].cast(pa.string()), value_set=sel))
        if len(sub) == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "ts_min": pa.array([], pa.timestamp("us")),
                    "text_preview": pa.array([], pa.string()),
                }
            )
        df = pl.from_arrow(sub.select(["conv_id", "turn_idx", "text", "ts"]))
        out = (
            df.sort(["conv_id", "turn_idx"])
            .group_by("conv_id", maintain_order=True)
            .agg(
                pl.len().alias("n_turns"),
                pl.col("ts").min().alias("ts_min"),
                pl.col("text").first().str.slice(0, text_preview_chars).alias("text_preview"),
            )
        )
        return out.to_arrow()

    summaries = (
        transcripts_ds.map_batches(_summarize, batch_format="pyarrow")
        .to_pandas()
        .groupby("conv_id", as_index=False)
        .agg({"n_turns": "sum", "ts_min": "min", "text_preview": "first"})
    )

    merged = members.merge(summaries, on="conv_id", how="left")
    merged["source"] = merged["side"] if has_side else "transcripts"
    sizes = merged.groupby("cluster_id")["conv_id"].transform("size")
    merged["group_size"] = sizes

    cols = [
        "cluster_id", "conv_id", "source", "n_turns",
        "ts_min", "text_preview", "group_size",
    ]
    blank = {c: ("" if merged[c].dtype == object else np.nan) for c in cols}
    out_rows = []
    order = {c: i for i, c in enumerate(chosen)}
    merged = merged.sort_values(
        by=["cluster_id", "conv_id"],
        key=lambda s: s.map(order) if s.name == "cluster_id" else s,
    )
    for _, grp in merged.groupby("cluster_id", sort=False):
        out_rows.extend(grp[cols].to_dict("records"))
        out_rows.append(dict(blank))
    if out_rows:
        out_rows.pop()  # no trailing separator
    return pd.DataFrame(out_rows, columns=cols)
