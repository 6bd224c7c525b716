"""Probabilistic record linkage: Fellegi–Sunter match weights with EM
parameter estimation.

The reference engine scores pairs with HAND-TUNED per-field weights and a
fixed threshold (compare_ldu_hw.py:96 ``weights`` dict → weighted sum →
``threshold``; README.md:210 table of weights).  Fellegi & Sunter ("A
Theory for Record Linkage", JASA 1969) is the standard probabilistic
replacement: each comparison field i has

  m_i = P(field agrees | pair is a true match)
  u_i = P(field agrees | pair is a non-match)

and a pair's evidence is the log-likelihood ratio ("match weight")

  W = Σ_i  a_i·log2(m_i/u_i) + (1−a_i)·log2((1−m_i)/(1−u_i))

with a_i the observed binary agreement.  m, u and the match prevalence p
are estimated UNSUPERVISED with EM over the agreement-pattern histogram
(Winkler 1988, "Using the EM algorithm for weight computation in the
Fellegi-Sunter model" — public), assuming conditional independence of
fields given match status (the classic naive-Bayes latent-class model).

Scale shape — the whole point of the pattern-histogram formulation:

- pass 1 (distributed) histograms agreement PATTERNS: each batch packs
  its K agreement bits into an integer and bincounts — partials are
  ≤ 2^K rows per batch, so the driver-side merge handles a bounded
  table no matter how many pairs exist (10¹² pairs still yield ≤ 2^K
  distinct patterns).
- EM runs on the driver over that ≤ 2^K-row histogram: microseconds,
  independent of corpus size, bit-reproducible (fixed iteration count,
  deterministic init, float64).
- pass 2 (distributed) attaches weights: the converged per-pattern
  weight/posterior tables (2^K floats) are closure-captured — every
  batch does one bit-pack + two array lookups.  NOTE: ``pairs`` is a
  lazy Dataset consumed twice (histogram + annotate); checkpoint it
  first when pair generation is expensive.

K is capped at 16 (2^16 histogram rows); real linkage uses 3–15 fields.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.functions.rounding import round6


def block_pairs(
    ds: "ray.data.Dataset",
    block_col: str,
    id_col: str,
    payload_cols: list[str],
    num_parts: int | None = None,
):
    """All unordered within-block record pairs, with payload columns
    carried as ``<col>_a`` / ``<col>_b`` — the generic candidate
    generator for comparison-vector pipelines (the reference's
    "matching countries" blocking, README.md:245, generalised).

    One hash exchange on ``block_col`` co-locates each block; pairs are
    enumerated with the vectorized segment-offset triangle (no Python
    loop over blocks).  O(block²) per block — pick keys accordingly, or
    pre-salt oversized blocks as the LSH stages do."""
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts
    fields = [(f"{c}_a", f"{c}_b", c) for c in payload_cols]
    schema_obj = ds.schema()
    if schema_obj is None:
        # mapped 0-row lineage reports no schema: payload dtypes are
        # unknowable — emit a typed empty pair set (id columns only)
        return ray.data.from_arrow(
            pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64())]
            ).empty_table()
        )
    in_schema = schema_obj.base_schema  # parquet metadata — no execution
    out_fields = [pa.field("id_a", pa.int64()), pa.field("id_b", pa.int64())]
    for name_a, name_b, c in fields:
        typ = in_schema.field(c).type
        out_fields.extend([pa.field(name_a, typ), pa.field(name_b, typ)])
    schema = pa.schema(out_fields)

    def _pairs(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return schema.empty_table()
        blk = t[block_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(blk, kind="stable")
        blk = blk[order]
        starts = np.flatnonzero(np.r_[True, blk[1:] != blk[:-1]])
        counts = np.diff(np.r_[starts, n])
        ends = np.repeat(starts + counts, counts)
        reps = ends - 1 - np.arange(n, dtype=np.int64)
        total = int(reps.sum())
        if total == 0:
            return schema.empty_table()
        ii = np.repeat(np.arange(n, dtype=np.int64), reps)
        seg_off = np.cumsum(reps) - reps
        jj = ii + 1 + (np.arange(total, dtype=np.int64) - seg_off[ii])
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
        a_first = ids[ii] <= ids[jj]
        ia = np.where(a_first, ii, jj)
        ib = np.where(a_first, jj, ii)
        cols: dict[str, pa.Array] = {
            "id_a": pa.array(ids[ia], pa.int64()),
            "id_b": pa.array(ids[ib], pa.int64()),
        }
        ordered = pa.array(order)
        for name_a, name_b, c in fields:
            col = t[c].combine_chunks().take(ordered)
            cols[name_a] = col.take(pa.array(ia))
            cols[name_b] = col.take(pa.array(ib))
        return pa.table(cols, schema=schema)

    return partitioned_map(ds, [block_col], P, _pairs)


@dataclass(frozen=True)
class FSParams:
    """Converged Fellegi–Sunter parameters (one entry per field)."""

    m: np.ndarray
    u: np.ndarray
    p: float
    pattern_counts: np.ndarray  # len 2^K histogram the EM ran on


def _pack_bits(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Pack K binary agreement columns into one integer per row
    (col 0 = least-significant bit)."""
    out = np.zeros(len(t), dtype=np.int64)
    for i, c in enumerate(cols):
        bits = t[c].combine_chunks().to_numpy(zero_copy_only=False)
        out |= (bits.astype(np.int64) & 1) << i
    return out


def em_fit(counts: np.ndarray, n_fields: int, iters: int = 30,
           init_m: float = 0.9, init_u: float = 0.1, init_p: float = 0.1
           ) -> FSParams:
    """EM over a 2^K agreement-pattern histogram — deterministic: fixed
    iteration count, fixed init, float64 throughout (matches the DuckDB
    recursive-CTE oracle to ~1e-15)."""
    K = n_fields
    pats = np.arange(1 << K, dtype=np.int64)
    a = ((pats[:, None] >> np.arange(K)) & 1).astype(np.float64)  # (2^K, K)
    c = counts.astype(np.float64)
    total = c.sum()
    if total == 0:
        raise ValueError("empty pair set: nothing to fit")
    m = np.full(K, init_m)
    u = np.full(K, init_u)
    p = float(init_p)
    for _ in range(iters):
        num = p * np.prod(np.where(a == 1, m, 1 - m), axis=1)
        den = (1 - p) * np.prod(np.where(a == 1, u, 1 - u), axis=1)
        w = num / (num + den)
        wm = (c * w).sum()
        wu = (c * (1 - w)).sum()
        m = (c[:, None] * w[:, None] * a).sum(axis=0) / wm
        u = (c[:, None] * (1 - w)[:, None] * a).sum(axis=0) / wu
        p = wm / total
    return FSParams(m=m, u=u, p=p, pattern_counts=counts)


def pattern_histogram(pairs: "ray.data.Dataset", agreement_cols: list[str]
                      ) -> np.ndarray:
    """Distributed agreement-pattern histogram: per-batch bincount
    partials (≤ 2^K rows each), merged on the driver — the ONLY
    driver-side collect in this pipeline, provably bounded by 2^K."""
    K = len(agreement_cols)
    size = 1 << K

    def _partial(t: pa.Table) -> pa.Table:
        cnt = np.bincount(_pack_bits(t, agreement_cols), minlength=size)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "pattern": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
            }
        )

    partials = pairs.select_columns(agreement_cols).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    hist = np.zeros(size, dtype=np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        # np.add.at: a streamed batch concatenates MANY per-block partials,
        # so the same pattern id repeats — buffered fancy `+=` would keep
        # only the last occurrence
        np.add.at(hist, b["pattern"].to_numpy(), b["cnt"].to_numpy())
    return hist


def fs_match_weights(
    pairs: "ray.data.Dataset",
    agreement_cols: list[str],
    iters: int = 30,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
):
    """Annotate a candidate-pair Dataset with Fellegi–Sunter
    ``match_weight`` (base-2 log-likelihood ratio) and ``posterior``
    (P(match | pattern)) columns, with m/u/p estimated by EM over the
    pattern histogram.  Returns ``(annotated_dataset, FSParams)``.

    Degenerate fields (converged m or u exactly 0/1) yield ±inf weights
    for the affected patterns — mathematically faithful; pre-drop fields
    that are constant within the candidate set.
    """
    K = len(agreement_cols)
    if not 1 <= K <= 16:
        raise ValueError("need 1..16 agreement columns")
    hist = pattern_histogram(pairs, agreement_cols)
    params = em_fit(hist, K, iters=iters, init_m=init_m, init_u=init_u,
                    init_p=init_p)

    pats = np.arange(1 << K, dtype=np.int64)
    a = ((pats[:, None] >> np.arange(K)) & 1).astype(np.float64)
    with np.errstate(divide="ignore"):
        agree_w = np.log2(params.m / params.u)
        disagree_w = np.log2((1 - params.m) / (1 - params.u))
    weight = (a * agree_w + (1 - a) * disagree_w).sum(axis=1)
    num = params.p * np.prod(np.where(a == 1, params.m, 1 - params.m), axis=1)
    den = (1 - params.p) * np.prod(np.where(a == 1, params.u, 1 - params.u),
                                   axis=1)
    posterior = num / (num + den)

    def _annotate(t: pa.Table) -> pa.Table:
        pat = _pack_bits(t, agreement_cols)
        return t.append_column(
            "match_weight", pa.array(round6(weight[pat]), pa.float64())
        ).append_column(
            "posterior", pa.array(round6(posterior[pat]), pa.float64())
        )

    out = pairs.map_batches(_annotate, batch_format="pyarrow",
                            zero_copy_batch=True)
    return out, params


def phonetic_block_stats(ds: "ray.data.Dataset", name_col: str,
                         num_parts: int | None = None):
    """Phonetic (Soundex) blocking-key profile of a name column: one row
    per code with the records it would co-locate and the distinct first
    tokens behind it — the audit you run before choosing the flagship's
    ``prefix_key_kind="soundex"`` blocking (stages/blocking.py; the
    reference's "matching countries" key, README.md:245, generalised to
    name data).

    Key = Soundex of the first whitespace token of the lower-cased name,
    non-alpha stripped (functions/text.py soundex — the classic 4-char
    code).  Scale shape: per-batch (code, token) partials — the Python
    soundex runs once per DISTINCT token via soundex_array's memoized
    take, not per row — then ONE exchange keyed by code; per-partition
    merge counts records and distinct tokens vectorized."""
    import polars as pl

    from record_linkage_ldu_ray.functions.text import soundex_array
    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    P = default_num_parts() if num_parts is None else num_parts

    def _prep(t: pa.Table) -> pa.Table:
        s = (
            pl.from_arrow(t[name_col].combine_chunks())
            .cast(pl.String)
            .fill_null("")
            .str.to_lowercase()
            .str.split(" ")
            .list.first()
            .fill_null("")
            .str.replace_all(r"[^a-z]", "")
        )
        df = pl.DataFrame({"tk": s}).group_by("tk").len(name="cnt")
        tks = df["tk"].to_numpy()
        codes = soundex_array(tks) if len(tks) else np.empty(0, object)
        return pa.table(
            {
                "code": pa.array(codes.astype(str), pa.string()),
                "tk": pa.array(tks.astype(str), pa.string()),
                "cnt": pa.array(df["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    partials = ds.select_columns([name_col]).map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True
    )

    def _agg(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "code": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        df = pl.from_arrow(t)
        g = df.group_by("code").agg(
            n_records=pl.col("cnt").sum(),
            n_tokens=pl.col("tk").n_unique(),
        )
        return pa.table(
            {
                "code": g["code"].to_arrow().cast(pa.string()),
                "n_records": pa.array(g["n_records"].to_numpy().astype(np.int64), pa.int64()),
                "n_tokens": pa.array(g["n_tokens"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return partitioned_map(partials, ["code"], P, _agg)


def fs_decisions(
    pairs: "ray.data.Dataset",
    agreement_cols: list[str],
    mu: float = 0.001,
    lam: float = 0.001,
    iters: int = 30,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
):
    """The full Fellegi–Sunter decision rule: classify every candidate
    pair into ``match`` / ``possible`` / ``non_match`` using the optimal
    two-threshold rule at designated error rates (Fellegi & Sunter 1969
    §3: the rule minimising the possible-match region subject to
    P(link | U) <= mu and P(non-link | M) <= lam).

    Patterns ordered by (weight DESC, pattern ASC) join the MATCH region
    while their cumulative u-probability stays <= mu; ordered by (weight
    ASC, pattern ASC) they join the NON-MATCH region while cumulative
    m-probability stays <= lam; everything else is ``possible`` (sent to
    clerical review — the reference's manual-review sheet population,
    README.md:258).  m/u/p come from the same EM fit as
    :func:`fs_match_weights`; the decision lookup is 2^K small, applied
    per batch as one bit-pack + take.  Returns (annotated_dataset,
    FSParams)."""
    K = len(agreement_cols)
    if not 1 <= K <= 16:
        raise ValueError("need 1..16 agreement columns")
    hist = pattern_histogram(pairs, agreement_cols)
    params = em_fit(hist, K, iters=iters, init_m=init_m, init_u=init_u,
                    init_p=init_p)

    pats = np.arange(1 << K, dtype=np.int64)
    a = ((pats[:, None] >> np.arange(K)) & 1).astype(np.float64)
    pm = np.prod(np.where(a == 1, params.m, 1 - params.m), axis=1)
    pu = np.prod(np.where(a == 1, params.u, 1 - params.u), axis=1)
    with np.errstate(divide="ignore"):
        agree_w = np.log2(params.m / params.u)
        disagree_w = np.log2((1 - params.m) / (1 - params.u))
    weight = (a * agree_w + (1 - a) * disagree_w).sum(axis=1)

    # match region: greedy by (weight desc, pattern asc) under Σ pu <= mu
    order_hi = np.lexsort((pats, -weight))
    cum_u = np.cumsum(pu[order_hi])
    is_match = np.zeros(1 << K, dtype=bool)
    is_match[order_hi[cum_u <= mu]] = True
    # non-match region: greedy by (weight asc, pattern asc) under Σ pm <= lam
    order_lo = np.lexsort((pats, weight))
    cum_m = np.cumsum(pm[order_lo])
    is_non = np.zeros(1 << K, dtype=bool)
    is_non[order_lo[cum_m <= lam]] = True
    decision = np.where(is_match, "match",
                        np.where(is_non, "non_match", "possible"))

    def _annotate(t: pa.Table) -> pa.Table:
        pat = _pack_bits(t, agreement_cols)
        return t.append_column(
            "match_weight", pa.array(round6(weight[pat]), pa.float64())
        ).append_column(
            "decision", pa.array(decision[pat], pa.string())
        )

    out = pairs.map_batches(_annotate, batch_format="pyarrow",
                            zero_copy_batch=True)
    return out, params
