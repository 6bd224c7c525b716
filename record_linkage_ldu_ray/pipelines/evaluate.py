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
