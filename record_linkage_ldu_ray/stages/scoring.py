"""S5 — pairwise scoring on a stateful actor pool (the compute core).

Reference semantics (compare_ldu_hw.py:79-115, compare_ldu_ldu.py:43-67):
per mapped field pair, missing-either → 0 (README.md:169); long multi-token
fields scored sequence-wise, short fields edit-distance-wise
(compare_ldu_hw.py:66-76); a ``total`` row-sum appended per pair
(compare_ldu_hw.py:152).

Graft feature set (north star): token-set Jaccard + Jaro-Winkler on
normalized text, Jaro-Winkler on role/tool sequences, timestamp-gap and
turn-count features, MinHash Jaccard estimate.

The scorer is a callable CLASS → Ray actor pool: similarity kernels,
comparison plan and config are built once per actor in ``__init__``
(reference instead pickles both FULL DataFrames into every worker process,
compare_ldu_hw.py:170-177 — the anti-pattern this engine replaces: here
records travel inside the shuffled pair rows).

Cheap vectorized features (MinHash estimate, ts/turn-count) run first; the
expensive per-pair kernels (exact Jaccard, Jaro-Winkler) run only where the
MinHash estimate clears ``est_floor`` — below it no decision mask can fire
(score bound < score_mid and jac bound < jac_text_mid), so decisions are
unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.functions.sim import (
    STRING_KERNELS,
    gather_list_segments,
    jaccard_sorted_u64_batch,
    minmax_ratio,
)

SCORE_FEATURES = [
    "jac_text",
    "jw_text",
    "jw_role",
    "jw_tool",
    "ts_sim",
    "nturns_sim",
    "minhash_est",
]


def _np_u64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


class PairScorer:
    """map_batches(PairScorer, concurrency=(min,max), batch_format='pyarrow')."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.k = cfg.minhash.num_perm
        self.jw_max = cfg.scoring.jw_text_max_chars
        self.tau = cfg.scoring.ts_tau_seconds
        # §2.11 registry dispatch + J3/P2 comparison map, resolved ONCE per
        # actor: feature → batch kernel, feature → (left, *right variants)
        self.kernels = {
            f: STRING_KERNELS[name] for f, name in cfg.scoring.string_kernels.items()
        }
        self.cmap = cfg.scoring.compare_map
        # MinHash-estimate floor below which no mask can fire (see module
        # docstring); shared with pair enumeration, which nulls the heavy
        # feature payload of gated-out pairs.  Validated against the rule
        # thresholds — falls back to 0 (no gating) if the invariant breaks.
        self.est_floor = cfg.effective_est_floor()

    def _string_gated(self, batch: pa.Table, feat: str, take_idx: pa.Array) -> np.ndarray:
        """Batched string similarity for one feature on the gated subset,
        fed straight from the Arrow columns (no Python string lists).

        Implements the reference's comparison-map semantics: the feature's
        LEFT column compares against EVERY right-side variant column and
        the scores fold by elementwise max (phone = max(phone, phone2,
        phone3), compare_ldu_hw.py:51-59); missing-either → 0 per variant
        (README.md:169), so a missing variant simply never wins the fold.
        Per-feature calls (rather than one stacked call) keep short columns
        at their own shorter iteration count in the O(L) bit-parallel loop."""
        import pyarrow.compute as pc

        def _gated(col: str) -> pa.Array:
            c = batch[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            return c.take(take_idx)

        kern = self.kernels[feat]
        variants = self.cmap[feat]
        max_len = min(self.jw_max, 64) if feat == "jw_text" else 64
        ga = _gated(f"{variants[0]}_a")
        la = pc.utf8_length(pc.fill_null(ga, "")).to_numpy(zero_copy_only=False)
        # candidate pairs repeat string payloads massively (every pair in a
        # near-duplicate block carries one of a handful of distinct role /
        # tool sequences, and text prefixes collide across pairs): dictionary-
        # encode both sides, run the O(L)-per-pair kernel once per DISTINCT
        # (a, b) string combo, and scatter scores back through the inverse.
        # Kernel semantics are preserved exactly (null ≡ "" on both the key
        # and the kernel's pad path, and the missing-either→0 mask below
        # stays per-row on the full arrays).
        enc_a = pc.dictionary_encode(pc.fill_null(ga, ""))
        ia = enc_a.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        best: np.ndarray | None = None
        for v in variants:
            gb = _gated(f"{v}_b")
            enc_b = pc.dictionary_encode(pc.fill_null(gb, ""))
            ib = enc_b.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            # skip the dedup sort when it cannot win: |A|x|B| bounds the
            # distinct-combo count from above, so with bound >= n the
            # O(n log n) np.unique would mostly re-discover unique rows
            # (mostly-unique relational text); hot near-duplicate blocks —
            # the case dedup targets — have tiny dictionaries and take the
            # dedup path as before
            if len(enc_a.dictionary) * len(enc_b.dictionary) >= len(ia):
                out = kern(ga, gb, max_len=max_len)
            else:
                combo = ia * np.int64(len(enc_b.dictionary) + 1) + ib
                _, rep, inv = np.unique(combo, return_index=True, return_inverse=True)
                if len(rep) < len(combo):
                    rep_idx = pa.array(rep, pa.int64())
                    out = kern(ga.take(rep_idx), gb.take(rep_idx), max_len=max_len)[inv]
                else:
                    out = kern(ga, gb, max_len=max_len)
            lb = pc.utf8_length(pc.fill_null(gb, "")).to_numpy(zero_copy_only=False)
            s = np.where((la > 0) & (lb > 0), out, np.float32(0.0)).astype(np.float32)
            best = s if best is None else np.maximum(best, s)
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}

        # ---- vectorized cheap features -------------------------------
        # MinHash estimate was computed at pair-enumeration time (both
        # signatures in hand there; they do not travel in pair rows)
        est = batch["minhash_est"].to_numpy(zero_copy_only=False).astype(np.float32)
        cols["minhash_est"] = est

        ts_a = batch["ts_min_a"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts_b = batch["ts_min_b"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        delta_s = (ts_a - ts_b) / 1e6
        cols["ts_sim"] = np.exp(-np.abs(delta_s) / self.tau).astype(np.float32)

        nt_a = batch["n_turns_a"].to_numpy(zero_copy_only=False)
        nt_b = batch["n_turns_b"].to_numpy(zero_copy_only=False)
        cols["nturns_sim"] = minmax_ratio(nt_a, nt_b).astype(np.float32)

        # ---- expensive per-pair kernels, gated by the estimate -------
        tok_a = _np_u64(batch["tok_hashes_a"])
        tok_b = _np_u64(batch["tok_hashes_b"])
        off_a = tok_a.offsets.to_numpy().astype(np.int64)
        off_b = tok_b.offsets.to_numpy().astype(np.int64)
        val_a = tok_a.values.to_numpy(zero_copy_only=False)
        val_b = tok_b.values.to_numpy(zero_copy_only=False)

        jac = np.zeros(n, dtype=np.float32)
        jw_t = np.zeros(n, dtype=np.float32)
        jw_r = np.zeros(n, dtype=np.float32)
        jw_o = np.zeros(n, dtype=np.float32)
        active = np.nonzero(est >= self.est_floor)[0]
        if len(active):
            # exact Jaccard over the gated subset: gather each side's token
            # segments into flat layout and run ONE vectorized batch kernel
            ga_vals, ga_off = gather_list_segments(val_a, off_a, active)
            gb_vals, gb_off = gather_list_segments(val_b, off_b, active)
            jac[active] = jaccard_sorted_u64_batch(ga_vals, ga_off, gb_vals, gb_off)
            take_idx = pa.array(active, pa.int64())
            jw_t[active] = self._string_gated(batch, "jw_text", take_idx)
            jw_r[active] = self._string_gated(batch, "jw_role", take_idx)
            jw_o[active] = self._string_gated(batch, "jw_tool", take_idx)
        cols["jac_text"] = jac
        cols["jw_text"] = jw_t
        cols["jw_role"] = jw_r
        cols["jw_tool"] = jw_o

        # total = row-sum of all field scores (compare_ldu_hw.py:152)
        total = np.zeros(n, dtype=np.float32)
        for f in SCORE_FEATURES:
            total += cols[f]

        out = pa.table(
            {
                "conv_id_a": batch["conv_id_a"],
                "conv_id_b": batch["conv_id_b"],
                **{f: pa.array(cols[f]) for f in SCORE_FEATURES},
                "total": pa.array(total),
            }
        )
        return out


def score_pairs(pairs_ds, cfg: PipelineConfig):
    """Wide pair rows → narrow score rows (ids + float32 features + total)."""
    if cfg.scorer_concurrency is None:
        # auto-size the pool to the cluster: the scorer is the compute core
        # and must be able to occupy most cores when pairs dominate
        import ray

        try:
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        cmin, cmax = 2, max(4, cpus)
    else:
        cmin, cmax = cfg.scorer_concurrency
    return pairs_ds.map_batches(
        PairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        zero_copy_batch=True,
        concurrency=(cmin, cmax),
        num_cpus=1,
    )
