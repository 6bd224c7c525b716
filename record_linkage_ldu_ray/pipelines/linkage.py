"""Cross-table (bipartite) record linkage — the reference's PRIMARY pipeline.

The reference links two different tables (LDU ↔ HW): full cross index
(compare_ldu_hw.py:160-162), cross-field comparison map
(compare_ldu_hw.py:27-48), a cross 4-mask decision rule
(main_ldu_hw.py:399-435) and bipartite groups (main_ldu_hw.py:24-61,
validated for uniqueness by main_ldu_hw.py:64-94).

Ray-Data-first design: the two corpora are TAGGED (side prefix on the
conv_id key) and unioned, so the entire self-dedup machinery — normalize →
per-conv features → LSH+prefix blocking with salting/drop → fused
enumerate+score — is reused verbatim; the only differences are

  - pair enumeration restricted to CROSS-side pairs (``cross_only``): the
    side tag makes every A-id sort before every B-id, so the canonical
    ``cid < cid_b`` filter plus a side-inequality keeps exactly the A×B
    pairs (the reference's full cross index, minus blocking misses);
  - the decision rule is the cross 4-mask shape instead of the
    score-threshold self-dedup rule;
  - the transitive grouping runs over the bipartite edge list and emits
    (side, conv_id, cluster_id) — the validated-groups analog.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.stages.blocking import emit_block_rows, hot_key_table
from record_linkage_ldu_ray.stages.cluster import connected_components
from record_linkage_ldu_ray.stages.features import extract_features
from record_linkage_ldu_ray.stages.normalize import normalize_transcripts
from record_linkage_ldu_ray.stages.pairs import enumerate_and_score
from record_linkage_ldu_ray.stages.scoring import SCORE_FEATURES

# side tags: every A-key sorts strictly before every B-key, so canonical
# pair order (cid < cid_b) puts the A record first in every cross pair
SIDE_A = "a:"
SIDE_B = "b:"


@dataclass(frozen=True)
class CrossRuleConfig:
    """Cross-table 4-mask match rule (main_ldu_hw.py:399-435 shape) over
    the transcript feature set.  A pair matches iff ≥1 mask holds:

      1 'contact': a text identity (jw_text | jac_text) AND a sequence
                   feature corroborates (jw_role | jw_tool) — the analog of
                   (name | company_name) & (email | phone);
      2 'context': ALL context features strong (ts, n_turns, minhash est) —
                   the analog of all-location-attributes-match;
      3 'sketch':  decent context AND a near-perfect sketch estimate — the
                   analog of some-location + phone == 1;
      4 'exact':   perfect text match — the analog of name/email == 1.
    """

    # jw_text on token-sorted prefixes is near-1 only for true duplicates,
    # but 0.8-0.9 for overlapping-vocabulary hard negatives — the exact
    # Jaccard branch carries the identity signal, the JW branch only the
    # near-perfect tail (measured: fixture TP jac ≥ 0.66, FP jac ≤ 0.30)
    contact_jw_text: float = 0.95
    contact_jac_text: float = 0.6
    contact_seq: float = 0.8
    ctx_ts: float = 0.9
    ctx_nturns: float = 0.9
    ctx_est: float = 0.7
    weak_ctx: float = 0.8
    weak_est: float = 0.9
    # exact mask: (jac_text == 1) | (jw_text == 1)


@dataclass
class LinkResult:
    matches: "ray.data.Dataset"  # (conv_id_a [A side], conv_id_b [B side], feats, masks)
    groups: "ray.data.Dataset"  # (side, conv_id, cluster_id)
    scores: "ray.data.Dataset"  # all scored cross pairs (tagged ids)
    metrics: dict = field(default_factory=dict)


def _tag_side(ds: "ray.data.Dataset", prefix: str) -> "ray.data.Dataset":
    def _f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cid = pc.binary_join_element_wise(
            pa.array([prefix] * len(t), pa.string()), t["conv_id"].cast(pa.string()), ""
        )
        return t.set_column(t.schema.get_field_index("conv_id"), "conv_id", cid)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def _strip_tag(col: pa.ChunkedArray | pa.Array):
    import pyarrow.compute as pc

    return pc.utf8_slice_codeunits(col, len(SIDE_A))


def decide_cross_matches(scores_ds, rules: CrossRuleConfig):
    """Scored cross pairs → matched edges under the 4-mask cross rule.

    Emits per-mask flags (x1..x4) so mask cardinalities can be aggregated
    as counters — the reference prints exactly these (main_ldu_hw.py:422-429).
    Ids keep their side tags (the grouping stage needs collision-free keys).
    """

    def _decide(t: pa.Table) -> pa.Table:
        g = lambda c: t[c].to_numpy(zero_copy_only=False)  # noqa: E731
        jac, jw_t = g("jac_text"), g("jw_text")
        jw_r, jw_o = g("jw_role"), g("jw_tool")
        ts, nt, est = g("ts_sim"), g("nturns_sim"), g("minhash_est")

        x1 = ((jw_t >= rules.contact_jw_text) | (jac >= rules.contact_jac_text)) & (
            (jw_r >= rules.contact_seq) | (jw_o >= rules.contact_seq)
        )
        x2 = (ts >= rules.ctx_ts) & (nt >= rules.ctx_nturns) & (est >= rules.ctx_est)
        x3 = (ts >= rules.weak_ctx) & (nt >= rules.weak_ctx) & (est >= rules.weak_est)
        x4 = (jac >= 1.0) | (jw_t >= 1.0)
        match = x1 | x2 | x3 | x4

        out = t.append_column("x1", pa.array(x1)).append_column("x2", pa.array(x2))
        out = out.append_column("x3", pa.array(x3)).append_column("x4", pa.array(x4))
        return out.filter(pa.array(match))

    return scores_ds.map_batches(_decide, batch_format="pyarrow", zero_copy_batch=True)


def _untag_matches(matches_ds):
    """Strip side tags from the matched edge list: conv_id_a is always the
    A-side record (side tags force A < B in canonical pair order)."""

    def _f(t: pa.Table) -> pa.Table:
        cols = {
            "conv_id_a": _strip_tag(t["conv_id_a"]),
            "conv_id_b": _strip_tag(t["conv_id_b"]),
        }
        for c in SCORE_FEATURES + ["total", "x1", "x2", "x3", "x4"]:
            cols[c] = t[c]
        return pa.table(cols)

    return matches_ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def link_datasets(
    transcripts_a,
    transcripts_b,
    cfg: PipelineConfig | None = None,
    cross_rules: CrossRuleConfig | None = None,
) -> LinkResult:
    """Link two transcript corpora (input_hint schema each); returns the
    matched A×B edge list, bipartite groups, and all scored cross pairs.

    ``transcripts_a`` / ``transcripts_b``: parquet path or Dataset.
    """
    from record_linkage_ldu_ray.pipelines.dedup import load_transcripts
    from record_linkage_ldu_ray.runtime import configure_exchange

    configure_exchange()
    cfg = cfg or PipelineConfig()
    rules = cross_rules or CrossRuleConfig()
    metrics: dict = {"config_hash": cfg.config_hash()}

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = _tag_side(load_transcripts(transcripts_a, columns=cols), SIDE_A)
    b = _tag_side(load_transcripts(transcripts_b, columns=cols), SIDE_B)
    union = a.union(b)

    # identical machinery to the self-dedup flagship from here on — one
    # feature exchange, two-pass blocking, one fused enumerate+score
    # exchange — except enumeration keeps only cross-side pairs
    features = extract_features(normalize_transcripts(union, cfg), cfg).materialize()
    hot, dropped = hot_key_table(features, cfg)
    metrics["hot_blocks"] = {str(k): v for k, v in sorted(hot.items())}
    metrics["dropped_blocks"] = {str(k): v for k, v in sorted(dropped.items())}

    scores = enumerate_and_score(
        emit_block_rows(features, cfg, hot, dropped), cfg, dropped, cross_only=True
    ).materialize()

    tagged_matches = decide_cross_matches(scores, rules).materialize()
    matches = _untag_matches(tagged_matches)

    # bipartite transitive grouping: connected components over the tagged
    # edge list (tags keep A/B key spaces collision-free), then emit
    # (side, conv_id, cluster_id); every record lands in exactly one group —
    # the property the reference's validate_groups checks after the fact
    all_ids = features.select_columns(["conv_id"])
    edges = tagged_matches.select_columns(["conv_id_a", "conv_id_b"])
    clusters, rounds = connected_components(edges, all_ids, cfg)
    metrics["unionfind_rounds"] = rounds

    def _split_side(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = pc.utf8_slice_codeunits(t["conv_id"], 0, 1)
        return pa.table(
            {
                "side": side,
                "conv_id": _strip_tag(t["conv_id"]),
                "cluster_id": _strip_tag(t["cluster_id"]),
            }
        )

    groups = clusters.map_batches(_split_side, batch_format="pyarrow", zero_copy_batch=True)

    from record_linkage_ldu_ray.runtime import publish_metrics

    publish_metrics("link_datasets", metrics)
    return LinkResult(matches=matches, groups=groups, scores=scores, metrics=metrics)


def link_increment(
    existing_ts,
    existing_clusters,
    delta_ts,
    cfg: PipelineConfig | None = None,
    cross_rules: CrossRuleConfig | None = None,
    matches=None,
):
    """Incremental linkage — the production "append a new batch to an
    already-clustered corpus" shape (the reference re-runs the full LDU↔HW
    cross compare per delivery; this is its streaming replacement).

    Every NEW (delta) conversation is scored against the EXISTING corpus
    with the full bipartite machinery (:func:`link_datasets`: shared
    blocking, cross-only enumeration, cross 4-mask rule); a delta record
    that matches ≥1 existing record inherits the MINIMUM matched existing
    cluster id (deterministic), otherwise it opens a fresh singleton
    cluster named by its own conv_id.

    Policy note (documented, matches the append-only index semantics):
    delta↔delta pairs are NOT scored — two new records that both match the
    same existing cluster still co-assign, but a brand-new duplicate family
    arriving entirely inside one delta lands as separate singletons; run
    the self-dedup flagship over the delta first when that matters.

    ``existing_clusters``: Dataset (conv_id, cluster_id) — the output of a
    previous ``dedup_transcripts`` / ``link_increment`` run.

    ``matches``: optional pre-computed existing↔delta match edges
    (Dataset with ``conv_id_a`` = existing key, ``conv_id_b`` = delta key).
    When given, the built-in bipartite matcher (:func:`link_datasets`) is
    skipped and only the ASSIGNMENT rule runs — this is how the
    SQL-expressible-matcher oracle variant (``link_increment_exact``)
    proves the assignment rule hash-exact, and how a caller plugs in a
    custom matcher (e.g. an exact-key join) without paying for LSH.

    Returns Dataset (conv_id, cluster_id, is_new_cluster:bool) — one row
    per DELTA conversation.  Two narrow hash exchanges beyond the linkage
    itself (matches ⨝ cluster map on the existing key; min-per-delta +
    universe fallback on the delta key).
    """
    from record_linkage_ldu_ray.runtime import partitioned_map

    cfg = cfg or PipelineConfig()
    if matches is None:
        matches = link_datasets(existing_ts, delta_ts, cfg, cross_rules).matches
    num_parts = cfg.feature_partitions

    from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings

    def _with_part(col: str):
        def _f(t: pa.Table) -> pa.Table:
            h = fnv1a_hash_strings(t[col].cast(pa.string()))
            return t.append_column(
                "part",
                pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32()),
            )

        return _f

    # exchange 1: resolve matched existing conv → its cluster id
    cmap = existing_clusters.select_columns(["conv_id", "cluster_id"]).map_batches(
        lambda t: pa.table(
            {
                "key": t["conv_id"].cast(pa.string()),
                "cluster_id": t["cluster_id"].cast(pa.string()),
                "delta_id": pa.nulls(len(t), pa.string()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    medges = matches.select_columns(["conv_id_a", "conv_id_b"]).map_batches(
        lambda t: pa.table(
            {
                "key": t["conv_id_a"].cast(pa.string()),
                "cluster_id": pa.nulls(len(t), pa.string()),
                "delta_id": t["conv_id_b"].cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    both = cmap.union(medges).map_batches(
        _with_part("key"), batch_format="pyarrow", zero_copy_batch=True
    )

    def _resolve(t: pa.Table) -> pa.Table:
        import polars as pl

        out_schema = pa.schema([("delta_id", pa.string()), ("cluster_id", pa.string())])
        if len(t) == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"]))
        cm = df.filter(pl.col("cluster_id").is_not_null()).select(["key", "cluster_id"])
        me = df.filter(pl.col("delta_id").is_not_null()).select(["key", "delta_id"])
        j = me.join(cm, on="key", how="inner").select(["delta_id", "cluster_id"])
        return j.to_arrow().cast(out_schema)

    resolved = partitioned_map(both, ["part"], num_parts, _resolve)

    # exchange 2: min cluster per delta; unmatched deltas open singletons
    delta_ids = (
        delta_ts
        if hasattr(delta_ts, "map_batches")
        else ray.data.read_parquet(delta_ts, columns=["conv_id"])
    ).select_columns(["conv_id"])
    def _distinct_ids(t: pa.Table) -> pa.Table:
        # transcripts carry one row per TURN — reduce to distinct conv ids
        # locally; cross-batch repeats collapse in _assign's group_by
        ids = (
            pa.table({"delta_id": t["conv_id"].cast(pa.string())})
            .group_by("delta_id")
            .aggregate([])
        )
        return ids.append_column("cluster_id", pa.nulls(len(ids), pa.string()))

    universe = delta_ids.map_batches(
        _distinct_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    allrows = universe.union(resolved).map_batches(
        _with_part("delta_id"), batch_format="pyarrow", zero_copy_batch=True
    )

    def _assign(t: pa.Table) -> pa.Table:
        import polars as pl

        out_schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("cluster_id", pa.string()),
                ("is_new_cluster", pa.bool_()),
            ]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"]))
        # universe rows are distinct by construction; matched rows add
        # candidate clusters — min per delta, null (no match) sorts last
        agg = (
            df.group_by("delta_id")
            .agg(cluster_id=pl.col("cluster_id").drop_nulls().min())
            .with_columns(
                is_new_cluster=pl.col("cluster_id").is_null(),
            )
        )
        agg = agg.with_columns(
            cluster_id=pl.coalesce(pl.col("cluster_id"), pl.col("delta_id")),
            conv_id=pl.col("delta_id"),
        )
        return agg.select(["conv_id", "cluster_id", "is_new_cluster"]).to_arrow().cast(
            out_schema
        )

    return partitioned_map(allrows, ["part"], num_parts, _assign)


def cross_mask_counters(matches_ds) -> dict:
    """Per-mask match cardinalities (main_ldu_hw.py:422-429 analog)."""
    import pyarrow.compute as pc

    def _part(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: [int(pc.sum(t[c]).as_py() or 0)] for c in ("x1", "x2", "x3", "x4")}
            | {"matches": [len(t)]}
        )

    parts = matches_ds.map_batches(_part, batch_format="pyarrow").to_pandas()
    if "matches" not in parts.columns:
        return {"x1": 0, "x2": 0, "x3": 0, "x4": 0, "matches": 0}
    return {c: int(parts[c].sum()) for c in parts.columns}
