"""S6 — score combination + match decision (vectorized, stateless).

``calc_combined_scores`` (main_ldu_hw.py:330-382 / main_ldu_ldu.py:199-233):
``score = Σ_f value_f * multiplier_f * (value_f >= threshold_f)`` — the
reference's weighted-threshold rule, bit-faithful in numpy over the graft
feature set.

``match`` (main_ldu_ldu.py:255-289): disjunction of four masks —
 1. score ≥ score_high                            (combined score alone)
 2. score ≥ score_mid ∧ jac_text ≥ jac_text_mid ∧ a sequence feature
    corroborates (jw_role/jw_tool/jw_text ≥ seq_corroborate)
 3. score ≥ score_mid ∧ all context features strong (ts, n_turns, jw_text)
 4. perfect text match (jac_text == 1 ∨ jw_text == 1)

Per-mask cardinalities are emitted as counter columns (m1..m4) so the
pipeline can aggregate them into stage metrics (A5, main_ldu_hw.py:422-429).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.stages.scoring import SCORE_FEATURES


def combined_score_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Append the weighted-threshold ``score`` column (A3)."""
    sc = cfg.scoring
    score = np.zeros(len(batch), dtype=np.float32)
    for f in SCORE_FEATURES:
        v = batch[f].to_numpy(zero_copy_only=False)
        thr = sc.thresholds[f]
        mult = sc.multipliers[f]
        score += v * np.float32(mult) * (v >= thr)
    return batch.append_column("score", pa.array(score))


def decide_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Filter to matched pairs; emit edge rows + per-mask flags."""
    r = cfg.rules
    g = lambda c: batch[c].to_numpy(zero_copy_only=False)  # noqa: E731
    score = g("score")
    jac = g("jac_text")
    jw_t = g("jw_text")
    jw_r = g("jw_role")
    jw_o = g("jw_tool")
    ts = g("ts_sim")
    nt = g("nturns_sim")

    m1 = score >= r.score_high
    m2 = (
        (score >= r.score_mid)
        & (jac >= r.jac_text_mid)
        & (
            (jw_r >= r.seq_corroborate)
            | (jw_o >= r.seq_corroborate)
            | (jw_t >= r.seq_corroborate)
        )
    )
    m3 = (
        (score >= r.score_mid)
        & (ts >= r.ctx_ts)
        & (nt >= r.ctx_nturns)
        & (jw_t >= r.ctx_jw_text)
    )
    m4 = (jac >= 1.0) | (jw_t >= 1.0)
    match = m1 | m2 | m3 | m4

    out = batch.append_column("m1", pa.array(m1)).append_column("m2", pa.array(m2))
    out = out.append_column("m3", pa.array(m3)).append_column("m4", pa.array(m4))
    return out.filter(pa.array(match))


def decide_matches(scores_ds, cfg: PipelineConfig):
    """Scores → matched edges (conv_id_a, conv_id_b, score, masks)."""
    ds = scores_ds.map_batches(
        combined_score_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"cfg": cfg},
    )
    return ds.map_batches(
        decide_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"cfg": cfg},
    )


def mask_counters(matches_ds) -> dict:
    """A5 — per-rule match cardinalities (aggregate over tiny bool cols)."""
    import pyarrow.compute as pc

    def _part(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "m1": [int(pc.sum(t["m1"]).as_py() or 0)],
                "m2": [int(pc.sum(t["m2"]).as_py() or 0)],
                "m3": [int(pc.sum(t["m3"]).as_py() or 0)],
                "m4": [int(pc.sum(t["m4"]).as_py() or 0)],
                "matches": [len(t)],
            }
        )

    parts = matches_ds.map_batches(_part, batch_format="pyarrow").to_pandas()
    if "matches" not in parts.columns:  # zero blocks (no matches at all)
        return {"m1": 0, "m2": 0, "m3": 0, "m4": 0, "matches": 0}
    return {c: int(parts[c].sum()) for c in parts.columns}
