"""Labeled-pair evaluation (A6 / J4): pairwise precision / recall / F1.

The reference verifies predicted matches against a labeled column with
driver-side point lookups (main_ldu_hw.py:197-264).  Here the labeled-pair
table is small by definition, so it is BROADCAST (ray.put once) and each
match batch classifies itself in a vectorized semi-join — no shuffle.

F1 is computed over the labeled pairs only ("at the reference blocking
key", BASELINE.json): predicted ∩ labeled vs is_match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from record_linkage_ldu_ray.functions.hashing import pair_hash as _pair_hash


def pairwise_metrics(matches_ds, labeled_pairs_path: str) -> dict:
    """Precision / recall / F1 of the match decisions on the labeled pairs."""
    labels = pq.read_table(labeled_pairs_path)
    lab_hash = np.sort(_pair_hash(labels["conv_id_a"], labels["conv_id_b"]))
    lab_ref = ray.put(lab_hash)

    def _filter_to_labeled(t: pa.Table) -> pa.Table:
        lh = ray.get(lab_ref)
        h = _pair_hash(t["conv_id_a"], t["conv_id_b"])
        idx = np.searchsorted(lh, h)
        idx[idx == len(lh)] = len(lh) - 1
        keep = lh[idx] == h if len(lh) else np.zeros(len(t), bool)
        return t.select(["conv_id_a", "conv_id_b"]).filter(pa.array(keep))

    predicted = matches_ds.map_batches(
        _filter_to_labeled, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    pred = set(zip(predicted["conv_id_a"], predicted["conv_id_b"]))

    tp = fp = fn = tn = 0
    for a, b, m in zip(
        labels["conv_id_a"].to_pylist(),
        labels["conv_id_b"].to_pylist(),
        labels["is_match"].to_pylist(),
    ):
        p = (a, b) in pred
        if m and p:
            tp += 1
        elif m and not p:
            fn += 1
        elif not m and p:
            fp += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_labeled": len(labels),
    }


def clusters_equal(clusters_ds, expected_path: str) -> tuple[bool, dict]:
    """Golden check: exact (conv_id → cluster-set) equality with the
    expected components (cluster ids themselves must agree too, since both
    use min-conv_id labels)."""
    got = clusters_ds.to_pandas().sort_values("conv_id").reset_index(drop=True)
    exp = (
        pq.read_table(expected_path)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    same = got.equals(exp)
    diff = {}
    if not same:
        g = dict(zip(got["conv_id"], got["cluster_id"]))
        e = dict(zip(exp["conv_id"], exp["cluster_id"]))
        wrong = {k: (g.get(k), e.get(k)) for k in set(g) | set(e) if g.get(k) != e.get(k)}
        diff = {"n_wrong": len(wrong), "sample": dict(list(wrong.items())[:10])}
    return same, diff


def threshold_curve(pairs, score_col: str, label_col: str,
                    num_parts: int | None = None):
    """Decision-threshold sweep over scored candidate pairs: one row per
    DISTINCT score value s with the confusion counts and P/R/F1 of the
    rule "predict match iff score >= s".

    The reference picks its weighted-sum threshold by eyeballing score
    histograms (analyze.py histogram sheets, README.md:210); this is that
    calibration step as an exact distributed operator — the full
    precision-recall curve, not a binned sketch.

    Scale shape: per-batch (score → n_pos, n_tot) partials → one hash
    exchange merges partials per score → range-exchange sort by score
    DESC → per-block summaries (first score, block tp/fp sums) → driver
    prefix-sums O(#blocks) offsets, broadcast once → pass 2 adds
    offset + within-block cumsum.  Driver state is O(#blocks); rows
    scale with DISTINCT scores, not pairs.

    Output: (threshold, tp, fp, fn, precision, recall, f1), 6dp ratios;
    recall defined as 1.0 when there are no positive labels.
    """
    from record_linkage_ldu_ray.functions.rounding import round6
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts

    def _partial(t: pa.Table) -> pa.Table:
        s = t[score_col].combine_chunks().to_numpy()
        y = t[label_col].combine_chunks().to_numpy(zero_copy_only=False)
        y = y.astype(np.int64) & 1
        uniq, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=y).astype(np.int64)
        ntot = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "threshold": pa.array(uniq, pa.float64()),
                "np_": pa.array(npos, pa.int64()),
                "nn_": pa.array(ntot - npos, pa.int64()),
            }
        )

    partials = pairs.select_columns([score_col, label_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "threshold": pa.array([], pa.float64()),
                    "np_": pa.array([], pa.int64()),
                    "nn_": pa.array([], pa.int64()),
                }
            )
        s = t["threshold"].combine_chunks().to_numpy()
        uniq, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=t["np_"].combine_chunks().to_numpy())
        nneg = np.bincount(inv, weights=t["nn_"].combine_chunks().to_numpy())
        return pa.table(
            {
                "threshold": pa.array(uniq, pa.float64()),
                "np_": pa.array(npos.astype(np.int64), pa.int64()),
                "nn_": pa.array(nneg.astype(np.int64), pa.int64()),
            }
        )

    per_score = partitioned_map(partials, ["threshold"], P, _merge)
    sorted_ds = per_score.sort("threshold", descending=True).materialize()

    def _summary(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "first_s": pa.array([], pa.float64()),
                    "tp": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "first_s": pa.array([t["threshold"][0].as_py()], pa.float64()),
                "tp": pa.array([int(t["np_"].combine_chunks().to_numpy().sum())], pa.int64()),
                "fp": pa.array([int(t["nn_"].combine_chunks().to_numpy().sum())], pa.int64()),
            }
        )

    empty = pa.table(
        {
            "threshold": pa.array([], pa.float64()),
            "tp": pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
            "fn": pa.array([], pa.int64()),
            "precision": pa.array([], pa.float64()),
            "recall": pa.array([], pa.float64()),
            "f1": pa.array([], pa.float64()),
        }
    )
    summ_parts = [
        p
        for p in ray.get(
            sorted_ds.map_batches(
                _summary, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if "first_s" in p.schema.names
    ]
    import ray.data as _rd

    if not summ_parts:
        return _rd.from_arrow(empty)
    summ = pa.concat_tables(summ_parts)
    first_s = summ["first_s"].to_numpy()
    tps = summ["tp"].to_numpy()
    fps = summ["fp"].to_numpy()
    order = np.argsort(-first_s, kind="stable")
    tp_off = np.zeros(len(order) + 1, np.int64)
    fp_off = np.zeros(len(order) + 1, np.int64)
    np.cumsum(tps[order], out=tp_off[1:])
    np.cumsum(fps[order], out=fp_off[1:])
    total_pos = int(tp_off[-1])
    offset_by_block = {
        float(first_s[b]): (int(tp_off[i]), int(fp_off[i]))
        for i, b in enumerate(order)
    }
    bcast = ray.put((offset_by_block, total_pos))

    def _finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        offsets, n_pos = ray.get(bcast)
        s = t["threshold"].combine_chunks().to_numpy()
        npos = t["np_"].combine_chunks().to_numpy()
        nneg = t["nn_"].combine_chunks().to_numpy()
        o_tp, o_fp = offsets[float(s[0])]
        tp = o_tp + np.cumsum(npos)
        fp = o_fp + np.cumsum(nneg)
        fn = n_pos - tp
        prec = tp / np.maximum(tp + fp, 1)
        rec = tp / n_pos if n_pos > 0 else np.ones_like(prec)
        denom = prec + rec
        f1 = np.where(denom > 0, 2 * prec * rec / np.maximum(denom, 1e-300), 0.0)
        return pa.table(
            {
                "threshold": pa.array(s, pa.float64()),
                "tp": pa.array(tp, pa.int64()),
                "fp": pa.array(fp, pa.int64()),
                "fn": pa.array(fn, pa.int64()),
                "precision": pa.array(round6(prec), pa.float64()),
                "recall": pa.array(round6(np.asarray(rec, dtype=np.float64)), pa.float64()),
                "f1": pa.array(round6(f1), pa.float64()),
            }
        )

    return sorted_ds.map_batches(
        _finalize, batch_format="pyarrow", zero_copy_batch=True
    )


def bcubed_metrics(assignments, pred_col: str, true_col: str,
                   num_parts: int | None = None):
    """B-cubed precision / recall / F1 of a predicted clustering against
    gold classes (Bagga & Baldwin 1998, "Algorithms for scoring
    coreference chains" — the standard extrinsic ER clustering metric):

      B³ precision = (1/N) Σ_records |pred(r) ∩ true(r)| / |pred(r)|
                   = (1/N) Σ_{(p,t) cells} c² / |p|
      B³ recall    = symmetric with |t|

    Scale shape: per-batch (pred, true) cell partials → ONE exchange
    merges cells (rows = distinct cluster×class pairs, ≪ records) →
    the small cell table is materialized once and re-keyed by pred and
    by true; each partition owns whole groups, so the per-group
    Σc²/Σc reduces to a SINGLE scalar partial per partition and the
    driver sums O(#partitions) numbers.  Cell counts are reduced in
    float64 (Σc² overflows int64 near 10¹⁰-record clusters).

    Output: ONE row (n_records, bcubed_precision, bcubed_recall,
    bcubed_f1), ratios 6dp.
    """
    import polars as pl

    from record_linkage_ldu_ray.functions.rounding import round6
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts

    def _cell_partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([pred_col, true_col]))
        g = df.group_by([pred_col, true_col]).len(name="c")
        out = g.to_arrow()
        return out.set_column(
            out.schema.get_field_index("c"), "c", out["c"].cast(pa.int64())
        )

    partials = assignments.select_columns([pred_col, true_col]).map_batches(
        _cell_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _cell_merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        df = pl.from_arrow(t)
        return df.group_by([pred_col, true_col]).agg(
            pl.col("c").sum()
        ).to_arrow()

    cells = partitioned_map(partials, [pred_col, true_col], P, _cell_merge)
    cells = cells.materialize()  # small aggregate: distinct cluster×class

    def _group_contrib(key: str):
        def _f(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table(
                    {
                        "contrib": pa.array([], pa.float64()),
                        "n": pa.array([], pa.float64()),
                    }
                )
            df = pl.from_arrow(t)
            c = pl.col("c").cast(pl.Float64)
            g = df.group_by(key).agg(
                s=c.sum(), q=(c * c).sum()
            )
            return pa.table(
                {
                    "contrib": pa.array(
                        [float((g["q"] / g["s"]).sum())], pa.float64()
                    ),
                    "n": pa.array([float(g["s"].sum())], pa.float64()),
                }
            )

        return _f

    prec_parts = partitioned_map(cells, [pred_col], P, _group_contrib(pred_col))
    rec_parts = partitioned_map(cells, [true_col], P, _group_contrib(true_col))

    def _sum(parts) -> tuple[float, float]:
        tot_c, tot_n = 0.0, 0.0
        for b in parts.iter_batches(batch_format="pyarrow"):
            if "contrib" not in b.schema.names:
                continue
            tot_c += float(np.asarray(b["contrib"]).sum())
            tot_n += float(np.asarray(b["n"]).sum())
        return tot_c, tot_n

    pc, n1 = _sum(prec_parts)
    rc, n2 = _sum(rec_parts)
    n = n1  # == n2: both sum every cell count once
    if n == 0:
        prec = rec = f1 = 1.0
    else:
        prec = pc / n
        rec = rc / n
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    import ray.data as _rd

    arr = np.array([prec, rec, f1], dtype=np.float64)
    r = round6(arr)
    return _rd.from_arrow(
        pa.table(
            {
                "n_records": pa.array([int(n)], pa.int64()),
                "bcubed_precision": pa.array([r[0]], pa.float64()),
                "bcubed_recall": pa.array([r[1]], pa.float64()),
                "bcubed_f1": pa.array([r[2]], pa.float64()),
            }
        )
    )


def split_leakage_report(clusters, splits, id_col: str = "doc_id",
                         cluster_col: str = "rep_id",
                         split_col: str = "split",
                         num_parts: int | None = None):
    """Dedup-aware train/val/test leakage audit: how many duplicate
    CLUSTERS span more than one split — the contamination mode a purely
    row-level splitter cannot see (a near-duplicate of a training
    document sitting in the eval split).  Standard LLM-data hygiene
    (e.g. Lee et al. arXiv:2107.06499 §5 measure train/eval overlap of
    duplicates); the fix is routing whole clusters, this operator is the
    audit that says whether you must.

    Scale shape: one shuffle join aligns (id → cluster) with (id →
    split); ONE exchange keyed by the cluster id co-locates each
    cluster; each partition reduces to a single partial row (cluster /
    doc totals + leaky counts) and the driver sums O(#partitions) rows.

    Output: ONE row — (n_clusters, n_leaky_clusters, n_docs,
    n_leaky_docs, cluster_leak_ratio, doc_leak_ratio), ratios 6dp
    (0.0 when there are no clusters).
    """
    import polars as pl

    from record_linkage_ldu_ray.functions.rounding import round6
    from record_linkage_ldu_ray.pipelines.relational import hash_join
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts
    joined = hash_join(clusters, splits, on=id_col)

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nc": pa.array([], pa.int64()),
                "nlc": pa.array([], pa.int64()),
                "nd": pa.array([], pa.int64()),
                "nld": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        df = pl.from_arrow(t.select([cluster_col, split_col]))
        g = df.group_by(cluster_col).agg(
            nd=pl.len().cast(pl.Int64),
            ns=pl.col(split_col).n_unique().cast(pl.Int64),
        )
        leaky = g.filter(pl.col("ns") > 1)
        return pa.table(
            {
                "nc": pa.array([g.height], pa.int64()),
                "nlc": pa.array([leaky.height], pa.int64()),
                "nd": pa.array([int(g["nd"].sum())], pa.int64()),
                "nld": pa.array([int(leaky["nd"].sum() or 0)], pa.int64()),
            }
        )

    parts = partitioned_map(joined, [cluster_col], P, _partial)
    nc = nlc = nd = nld = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        if "nc" not in b.schema.names:
            continue
        nc += int(np.asarray(b["nc"]).sum())
        nlc += int(np.asarray(b["nlc"]).sum())
        nd += int(np.asarray(b["nd"]).sum())
        nld += int(np.asarray(b["nld"]).sum())
    ratios = round6(
        np.array(
            [nlc / nc if nc else 0.0, nld / nd if nd else 0.0], np.float64
        )
    )
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table(
            {
                "n_clusters": pa.array([nc], pa.int64()),
                "n_leaky_clusters": pa.array([nlc], pa.int64()),
                "n_docs": pa.array([nd], pa.int64()),
                "n_leaky_docs": pa.array([nld], pa.int64()),
                "cluster_leak_ratio": pa.array([ratios[0]], pa.float64()),
                "doc_leak_ratio": pa.array([ratios[1]], pa.float64()),
            }
        )
    )
