"""Text analysis operators for training-data curation.

Extends the reference's per-field normalizer family (pre_processing.py:48-79)
with the per-document statistics a 100 TB text pipeline filters on: token
counts, quality scores, language ID, content fingerprints.  Every operator is
one vectorized ``map_batches`` (zero-copy Arrow in, Arrow out) — stateless,
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import polars as pl
import pyarrow as pa

import ray.data

from record_linkage_ldu_ray.functions.hashing import fnv1a_hash_strings, splitmix64
from record_linkage_ldu_ray.functions.rounding import round6

# BPE-ish pre-tokenizer: word pieces or single non-space symbols (the common
# GPT-2-style pre-split shape, public knowledge)
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

# Tiny high-frequency marker lists per language (public stopword knowledge) —
# the classic n-gram/wordlist language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "una", "por", "con", "para"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "pour", "que"),
}
_LANG_ORDER = ("en", "de", "es", "fr")  # deterministic tie-break order

_EN_STOP_SMALL = LANG_MARKERS["en"]


def token_counts(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Whitespace + BPE-ish token counts per document.

    Output: (doc_id, n_ws_tokens, n_bpe_tokens, n_chars) — all int64.
    """

    def _count(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        ws = (
            s.str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
            .list.len()
        )
        bpe = s.str.extract_all(BPE_ISH_PATTERN).list.len()
        nchars = s.str.len_chars()
        return pa.table(
            {
                id_col: t[id_col],
                "n_ws_tokens": ws.cast(pl.Int64).to_arrow(),
                "n_bpe_tokens": bpe.cast(pl.Int64).to_arrow(),
                "n_chars": nchars.cast(pl.Int64).to_arrow(),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _count, batch_format="pyarrow", zero_copy_batch=True
    )


def unigram_logprob_scores(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int | None = None,
):
    """Unigram-LM quality signal (the CCNet idea — Wenzek et al. 2019,
    arXiv:1911.00359 — with the corpus's own unigram distribution standing
    in for the external KenLM): per document, the mean natural-log
    probability of its tokens under the global token frequency
    distribution.  Low (very negative) scores flag rare-token noise; high
    scores flag boilerplate-like text.

    Two passes, raw tokens never shuffle:
    1. Global token counts via two-level aggregation on 8-byte token
       hashes — each batch emits one partial row per distinct hash, one
       exchange keyed by hash, merge sums.  The merged vocab (sorted hash,
       count) broadcasts once via ``ray.put`` — O(distinct tokens), tiny
       vs the corpus (shard the broadcast by hash range at 100 TB if the
       vocab outgrows worker heap).
    2. One map pass: searchsorted hash→count lookup per token,
       ``ln(count) − ln(N)`` summed per document with a vectorized
       ``reduceat`` over the flat token stream (deterministic in-doc
       order), mean over n_tokens, rounded 6dp.

    Output: (``id_col``, n_tokens:int64, mean_token_logprob:float64).
    """
    import ray

    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()

    def _flat_tokens(t: pa.Table):
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        s = pl.from_arrow(texts).fill_null("")
        lists = s.str.split(" ")
        dlen = lists.list.len().to_numpy().astype(np.int64)
        return lists.explode(), dlen

    def _vocab_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "th": pa.array([], pa.uint64()),
                    "c": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                }
            )
        flat, _ = _flat_tokens(t)
        th = fnv1a_hash_strings(flat.to_arrow())
        uu, cnt = np.unique(th, return_counts=True)
        return pa.table(
            {
                "th": pa.array(uu, pa.uint64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array((uu % np.uint64(n_parts)).astype(np.int32), pa.int32()),
            }
        )

    def _vocab_merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        return df.group_by("th").agg(pl.col("c").sum()).to_arrow()

    vocab_ds = partitioned_map(
        ds.select_columns([id_col, text_col]).map_batches(
            _vocab_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["part"],
        n_parts,
        _vocab_merge,
    )
    tables = [x for r in vocab_ds.to_arrow_refs() if len(x := ray.get(r))]
    if tables:
        cat = pa.concat_tables(tables)
        th_all = cat["th"].to_numpy()
        srt = np.argsort(th_all)
        vh, vc = th_all[srt], cat["c"].to_numpy()[srt].astype(np.float64)
    else:
        vh, vc = np.empty(0, np.uint64), np.empty(0, np.float64)
    n_total = float(vc.sum()) if len(vc) else 1.0
    vocab_ref = ray.put((vh, np.log(vc) - np.log(n_total) if len(vc) else vc))

    def _score(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "mean_token_logprob": pa.array([], pa.float64()),
                }
            )
        vh_b, vlp_b = ray.get(vocab_ref)
        flat, dlen = _flat_tokens(t)
        th = fnv1a_hash_strings(flat.to_arrow())
        total = int(dlen.sum())
        offs = np.concatenate(([0], np.cumsum(dlen)))
        lp = vlp_b[np.searchsorted(vh_b, th)] if total else np.empty(0, np.float64)
        dsum = (
            np.add.reduceat(lp, np.minimum(offs[:-1], total - 1))
            if total
            else np.zeros(n, np.float64)
        )
        dsum = np.where(dlen == 0, 0.0, dsum)
        mean = round6(dsum / np.maximum(dlen, 1))
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(dlen, pa.int64()),
                "mean_token_logprob": pa.array(mean, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def corpus_report(
    ds: "ray.data.Dataset",
    short_tokens: int = 50,
    source_col: str = "source",
    text_col: str = "text",
    num_parts: int | None = None,
):
    """Per-source corpus triage card — the one-page summary a curation run
    prints before deciding filters (doc/token volume, short-doc tail,
    exact-duplicate rate per source; reference analog: main_ldu_ldu.py's
    group-length stats, aggregated per corpus slice instead of per match
    group).

    Two independent distributed reductions, merged driver-side over
    O(#sources) rows:
    - metrics: each batch combines to ≤ #sources partial rows (vectorized
      polars group_by) — counts, token sums/max, short-doc tally;
    - dup rate: distinct-text counting via one hash exchange keyed by the
      8-byte text hash (the ``exact_dedup`` exchange shape) — each
      partition emits ≤ #sources rows of distinct-hash counts.
    Raw text never shuffles; driver state never exceeds
    O(#sources × #partitions).

    Output: (source, n_docs:int64, total_tokens:int64,
    mean_tokens:float64 6dp, max_tokens:int64, n_short_docs:int64,
    n_dup_docs:int64, dup_frac:float64 6dp), one row per source.
    """
    import pyarrow.compute as pc

    import ray

    from record_linkage_ldu_ray.runtime import default_num_parts, partitioned_map

    n_parts = num_parts if num_parts is not None else default_num_parts()
    src = ds.select_columns([source_col, text_col])

    def _metric_partial(t: pa.Table) -> pa.Table:
        nt = pc.cast(pc.add(pc.count_substring(pc.fill_null(t[text_col], ""), " "), 1), pa.int64())
        df = pl.from_arrow(
            pa.table({"source": t[source_col], "nt": nt})
        )
        return (
            df.group_by("source")
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("nt").sum().alias("total_tokens"),
                pl.col("nt").max().alias("max_tokens"),
                (pl.col("nt") < short_tokens).sum().cast(pl.Int64).alias("n_short_docs"),
            )
            .to_arrow()
        )

    def _dup_partial(t: pa.Table) -> pa.Table:
        h = fnv1a_hash_strings(pc.fill_null(t[text_col], ""))
        df = (
            pl.DataFrame(
                {"source": pl.from_arrow(t[source_col]), "h": h}
            )
            .unique(["source", "h"])
            .with_columns((pl.col("h") % n_parts).cast(pl.Int32).alias("part"))
        )
        return df.to_arrow()

    def _dup_merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["part"]))
        return (
            df.unique(["source", "h"])
            .group_by("source")
            .agg(pl.len().cast(pl.Int64).alias("n_distinct"))
            .to_arrow()
        )

    metric_ds = src.map_batches(_metric_partial, batch_format="pyarrow", zero_copy_batch=True)
    dup_ds = partitioned_map(
        src.map_batches(_dup_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["part"],
        n_parts,
        _dup_merge,
    )
    mt = [x for r in metric_ds.to_arrow_refs() if len(x := ray.get(r))]
    dt = [x for r in dup_ds.to_arrow_refs() if len(x := ray.get(r))]
    if not mt:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "total_tokens": pa.array([], pa.int64()),
                "mean_tokens": pa.array([], pa.float64()),
                "max_tokens": pa.array([], pa.int64()),
                "n_short_docs": pa.array([], pa.int64()),
                "n_dup_docs": pa.array([], pa.int64()),
                "dup_frac": pa.array([], pa.float64()),
            }
        )
    m = (
        pl.from_arrow(pa.concat_tables(mt))
        .group_by("source")
        .agg(
            pl.col("n_docs").sum(),
            pl.col("total_tokens").sum(),
            pl.col("max_tokens").max(),
            pl.col("n_short_docs").sum(),
        )
    )
    d = (
        pl.from_arrow(pa.concat_tables(dt))
        .group_by("source")
        .agg(pl.col("n_distinct").sum())
    )
    out = m.join(d, on="source", how="left").with_columns(
        pl.col("n_distinct").fill_null(0)
    )
    res = out.to_arrow()
    n_docs = res["n_docs"].to_numpy()
    total = res["total_tokens"].to_numpy()
    n_dup = n_docs - res["n_distinct"].to_numpy()
    return pa.table(
        {
            "source": res["source"],
            "n_docs": res["n_docs"],
            "total_tokens": res["total_tokens"],
            "mean_tokens": pa.array(
                round6(total / np.maximum(n_docs, 1)), pa.float64()
            ),
            "max_tokens": res["max_tokens"],
            "n_short_docs": res["n_short_docs"],
            "n_dup_docs": pa.array(n_dup.astype(np.int64), pa.int64()),
            "dup_frac": pa.array(
                round6(n_dup / np.maximum(n_docs, 1)), pa.float64()
            ),
        }
    )


def quality_scores(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Heuristic quality features: length, word stats, punctuation and
    stopword ratios (the usual pre-training filter signals).

    Output: (doc_id, n_chars:int64, n_words:int64, avg_word_len:double,
    punct_ratio:double, stopword_ratio:double) — ratios rounded to 6dp so a
    SQL oracle can reproduce them exactly.
    """
    stop = list(_EN_STOP_SMALL)

    def _score(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        words = (
            s.str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
        )
        n_words = words.list.len().cast(pl.Int64)
        n_chars = s.str.len_chars().cast(pl.Int64)
        total_word_chars = words.list.eval(pl.element().str.len_chars()).list.sum().cast(
            pl.Int64
        )
        n_punct = s.str.count_matches(r"[^A-Za-z0-9\s]").cast(pl.Int64)
        n_stop = (
            words.list.eval(pl.element().filter(pl.element().str.to_lowercase().is_in(stop)))
            .list.len()
            .cast(pl.Int64)
        )
        nw = n_words.to_numpy().astype(np.float64)
        nc = n_chars.to_numpy().astype(np.float64)
        safe_w = np.where(nw == 0, 1.0, nw)
        safe_c = np.where(nc == 0, 1.0, nc)
        avg_wl = round6(total_word_chars.to_numpy() / safe_w)
        punct_ratio = round6(n_punct.to_numpy() / safe_c)
        stop_ratio = round6(n_stop.to_numpy() / safe_w)
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": n_chars.to_arrow(),
                "n_words": n_words.to_arrow(),
                "avg_word_len": pa.array(avg_wl, pa.float64()),
                "punct_ratio": pa.array(punct_ratio, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Wordlist language ID: count marker-word hits per language over the
    document's lower-cased token set; argmax with deterministic tie-break
    (en > de > es > fr, 'und' when zero hits everywhere).

    Output: (doc_id, lang_pred:string, lang_hits:int64).
    """

    def _lid(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        toks = (
            s.str.to_lowercase()
            .str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
            .list.unique()
        )
        hits = {}
        for lang in _LANG_ORDER:
            markers = list(LANG_MARKERS[lang])
            hits[lang] = (
                toks.list.eval(pl.element().filter(pl.element().is_in(markers)))
                .list.len()
                .to_numpy()
                .astype(np.int64)
            )
        mat = np.stack([hits[lang] for lang in _LANG_ORDER], axis=1)
        best = mat.argmax(axis=1)  # first max wins → _LANG_ORDER tie-break
        best_hits = mat[np.arange(len(mat)), best]
        langs = np.array(_LANG_ORDER, dtype=object)[best]
        langs[best_hits == 0] = "und"
        return pa.table(
            {
                id_col: t[id_col],
                "lang_pred": pa.array(langs, pa.string()),
                "lang_hits": pa.array(best_hits, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _lid, batch_format="pyarrow", zero_copy_batch=True
    )


def content_fingerprints(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Exact content fingerprint: SHA-256 hex of the raw text (stable,
    SQL-verifiable).  Output: (doc_id, sha256:string, n_bytes:int64)."""

    def _fp(t: pa.Table) -> pa.Table:
        texts = t[text_col].combine_chunks()
        hexes = [
            hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
            for v in texts.to_pylist()
        ]
        nbytes = pl.from_arrow(texts).str.len_bytes().cast(pl.Int64).to_arrow()
        return pa.table(
            {
                id_col: t[id_col],
                "sha256": pa.array(hexes, pa.string()),
                "n_bytes": nbytes,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow", zero_copy_batch=True
    )


def vocab_top_tokens(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    num_parts: int = 32,
):
    """Corpus vocabulary heavy-hitters: the ``k`` most frequent whitespace
    tokens with total occurrence and document-frequency counts (the vocab /
    stopword-discovery pass of a pre-training pipeline).

    Three-level aggregation so no stage ever sees the full token stream:
    (1) per-batch partial counts (one vectorized polars explode+group_by —
    the exchange carries one row per DISTINCT token per batch, not one row
    per occurrence), (2) one hash exchange keyed by token with per-partition
    sum + LOCAL top-k (each partition owns its tokens exclusively, so its
    local top-k is exact), (3) bounded driver merge of ``num_parts × k``
    rows.  Deterministic tie-break: count DESC, token ASC.

    A document's rows never split across batches, so summing per-batch
    distinct-doc counts gives the exact document frequency.

    Output: (token:string, n_occurrences:int64, n_docs:int64), exactly
    ``k`` rows (fewer if the vocabulary is smaller).
    """

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "doc": pl.from_arrow(t[id_col].combine_chunks()),
                "token": pl.from_arrow(t[text_col].combine_chunks()).str.extract_all(
                    r"\S+"
                ),
            }
        )
        agg = (
            df.explode("token")
            .drop_nulls("token")
            .group_by("token")
            .agg(
                n_occurrences=pl.len().cast(pl.Int64),
                n_docs=pl.col("doc").n_unique().cast(pl.Int64),
            )
        )
        out = agg.to_arrow()
        h = fnv1a_hash_strings(out["token"].combine_chunks())
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    partials = ds.select_columns([id_col, text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("token", pa.string()), ("n_occurrences", pa.int64()), ("n_docs", pa.int64())]
            ).empty_table()
        agg = (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by("token")
            .agg(pl.col("n_occurrences").sum(), pl.col("n_docs").sum())
            .sort(["n_occurrences", "token"], descending=[True, False])
            .head(k)
        )
        return agg.to_arrow().cast(
            pa.schema(
                [("token", pa.string()), ("n_occurrences", pa.int64()), ("n_docs", pa.int64())]
            )
        )

    from record_linkage_ldu_ray.runtime import partitioned_map

    parts = ray.get(partitioned_map(partials, ["part"], num_parts, _merge).to_arrow_refs())
    parts = [p for p in parts if len(p)]
    if not parts:
        return pa.schema(
            [("token", pa.string()), ("n_occurrences", pa.int64()), ("n_docs", pa.int64())]
        ).empty_table()
    merged = pa.concat_tables(parts)
    occ = merged["n_occurrences"].to_numpy()
    toks = np.asarray(merged["token"].to_pylist(), dtype=object)
    order = np.lexsort((toks, -occ))[:k]
    return merged.take(pa.array(order))


def source_length_quantiles(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    num_parts: int = 16,
):
    """Per-group EXACT discrete quantiles of document word count — the
    length-distribution audit a curation pipeline runs per corpus shard.

    Exact quantiles normally need every value of a group in one place; for
    an integer-valued statistic the distribution compresses losslessly:
    (1) per-batch partial histogram (one row per distinct (group, n_words)
    per batch — the exchange carries counts, never documents), (2) one hash
    exchange keyed by group, (3) per-partition quantile read-off from the
    merged histogram.  Matches DuckDB ``quantile_disc`` exactly (element at
    ``max(1, ceil(p*N))``, 1-based, verified for all N≤400).

    Output: (group_col, n_docs:int64, p50_words/p90_words/p99_words:int64).
    """
    pnames = [f"p{str(p)[2:].ljust(2, '0')}_words" for p in ps]  # 0.5 → p50_words

    def _partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        n = (
            s.str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
            .list.len()
            .cast(pl.Int64)
        )
        df = pl.DataFrame({group_col: pl.from_arrow(t[group_col].combine_chunks()), "n": n})
        agg = df.group_by([group_col, "n"]).agg(cnt=pl.len().cast(pl.Int64))
        out = agg.to_arrow()
        h = fnv1a_hash_strings(out[group_col].combine_chunks().cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    partials = ds.select_columns([group_col, text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    out_schema = pa.schema(
        [(group_col, pa.string()), ("n_docs", pa.int64())]
        + [(nm, pa.int64()) for nm in pnames]
    )

    def _quantiles(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .group_by([group_col, "n"])
            .agg(pl.col("cnt").sum())
            .sort([group_col, "n"])
        )
        groups = df[group_col].to_numpy()
        ns = df["n"].to_numpy()
        cnts = df["cnt"].to_numpy()
        new = np.ones(len(df), bool)
        new[1:] = groups[1:] != groups[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(df))
        rows = {group_col: [], "n_docs": [], **{nm: [] for nm in pnames}}
        for s0, e0 in zip(starts, ends):  # one iteration per GROUP (≤ #sources)
            cum = np.cumsum(cnts[s0:e0])
            total = int(cum[-1])
            rows[group_col].append(groups[s0])
            rows["n_docs"].append(total)
            for p, nm in zip(ps, pnames):
                target = max(1, int(np.ceil(np.float64(p) * total)))
                rows[nm].append(int(ns[s0 + np.searchsorted(cum, target, side="left")]))
        return pa.table(rows, schema=out_schema)

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(partials, ["part"], num_parts, _quantiles)


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 1,
    max_vocab: int = 1_000_000,
):
    """Per-document top-``k`` TF-IDF terms (smooth IDF,
    ``tf * (ln((1+N)/(1+df)) + 1)`` — the sklearn formulation, public).

    Two-pass broadcast pattern: (1) document frequencies aggregate exactly
    like :func:`vocab_top_tokens` (per-batch partials → one hash exchange →
    bounded driver merge) pruned to ``df >= min_df`` and the ``max_vocab``
    most frequent terms, (2) the (token → df) table is put in the object
    store ONCE (``ray.put``) and every scoring task reads the same copy —
    never re-pickled per batch, never a shuffle join.  Scale knobs: at
    100 TB the vocabulary must be pruned (min_df / max_vocab) to stay
    broadcastable — the standard practice this mirrors.

    Output: (doc_id, token:string, tf:int64, tfidf:double rounded 6dp),
    ≤ k rows per document, ties broken by token ASC.
    """
    # ---- pass 1: document frequencies + corpus size ------------------------
    n_total = ds.count()
    df_tbl = vocab_top_tokens(ds, id_col=id_col, text_col=text_col, k=max_vocab)
    if min_df > 1:
        import pyarrow.compute as pc

        df_tbl = df_tbl.filter(pc.greater_equal(df_tbl["n_docs"], pa.scalar(min_df)))
    df_ref = ray.put(
        pl.DataFrame(
            {
                "token": pl.from_arrow(df_tbl["token"].combine_chunks()),
                "df": pl.from_arrow(df_tbl["n_docs"].combine_chunks()),
            }
        )
    )

    # ---- pass 2: per-batch score + per-doc top-k ---------------------------
    def _score(t: pa.Table) -> pa.Table:
        dfmap: pl.DataFrame = ray.get(df_ref)
        toks = (
            pl.DataFrame(
                {
                    id_col: pl.from_arrow(t[id_col].combine_chunks()),
                    "token": pl.from_arrow(t[text_col].combine_chunks()).str.extract_all(
                        r"\S+"
                    ),
                }
            )
            .explode("token")
            .drop_nulls("token")
        )
        tf = toks.group_by([id_col, "token"]).agg(tf=pl.len().cast(pl.Int64))
        joined = tf.join(dfmap, on="token", how="inner")
        dfv = joined["df"].to_numpy().astype(np.float64)
        tfv = joined["tf"].to_numpy().astype(np.float64)
        tfidf = tfv * (np.log((1.0 + n_total) / (1.0 + dfv)) + 1.0)
        # rank by the raw double (as SQL's row_number does), output rounded
        scored = joined.with_columns(
            pl.Series("_raw", tfidf), pl.Series("tfidf", round6(tfidf))
        )
        top = (
            scored.sort([id_col, "_raw", "token"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .head(k)
            .select([id_col, "token", "tf", "tfidf"])
        )
        return top.to_arrow()

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def filter_short_docs(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    p: float = 0.5,
):
    """Relative-length quality filter: keep documents whose word count is at
    least their group's ``p``-quantile (default: per-source median) — the
    "drop the short tail per corpus shard" curation rule, with the cutoff
    LEARNED from the data in the same job.

    Composition pattern: the per-group quantile table (tiny — one row per
    source, from :func:`source_length_quantiles`'s histogram exchange) is
    computed first, put in the object store ONCE, and the filter pass is a
    pure broadcast-lookup ``map_batches`` — no second shuffle.

    Output: (doc_id, ``group_col``, n_words:int64) for kept documents.
    """
    q = source_length_quantiles(
        ds, group_col=group_col, id_col=id_col, text_col=text_col, ps=(p,)
    )
    qt = pa.concat_tables([t for t in ray.get(q.to_arrow_refs()) if len(t)])
    cutoff_col = qt.column_names[-1]
    cut_ref = ray.put(dict(zip(qt[group_col].to_pylist(), qt[cutoff_col].to_pylist())))

    def _filter(t: pa.Table) -> pa.Table:
        cuts: dict = ray.get(cut_ref)
        s = pl.from_arrow(t[text_col].combine_chunks())
        n = (
            s.str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
            .list.len()
            .cast(pl.Int64)
        )
        df = pl.DataFrame(
            {
                id_col: pl.from_arrow(t[id_col].combine_chunks()),
                group_col: pl.from_arrow(t[group_col].combine_chunks()),
                "n_words": n,
            }
        )
        cut_df = pl.DataFrame(
            {group_col: list(cuts), "_cut": pl.Series(list(cuts.values()), dtype=pl.Int64)}
        )
        out = (
            df.join(cut_df, on=group_col, how="left")
            .filter(pl.col("n_words") >= pl.col("_cut"))
            .select([id_col, group_col, "n_words"])
        )
        return out.to_arrow()

    return ds.select_columns([id_col, group_col, text_col]).map_batches(
        _filter, batch_format="pyarrow", zero_copy_batch=True
    )


# PII patterns (public, simple shapes chosen to behave identically under
# rust-regex (polars) and RE2 (DuckDB): no backrefs, no lookaround)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d -]{7,}\d"


def redact_pii(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """PII scrub: replace emails → ``<EMAIL>``, IPv4 addresses → ``<IP>``,
    phone-like digit runs → ``<PHONE>`` (applied in that order so an
    email's digits are never phone-matched), and count each on the ORIGINAL
    text.  One vectorized ``map_batches`` — compiled-regex kernels, no
    shuffle, no Python row loop; the standard pre-training scrub pass.

    Output: (id_col, text_redacted:string, n_emails/n_ips/n_phones:int64).
    """

    def _scrub(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        red = (
            s.str.replace_all(PII_EMAIL, "<EMAIL>")
            .str.replace_all(PII_IP, "<IP>")
            .str.replace_all(PII_PHONE, "<PHONE>")
        )
        return pa.table(
            {
                id_col: t[id_col],
                "text_redacted": red.to_arrow(),
                "n_emails": s.str.count_matches(PII_EMAIL).cast(pl.Int64).to_arrow(),
                "n_ips": s.str.count_matches(PII_IP).cast(pl.Int64).to_arrow(),
                "n_phones": s.str.count_matches(PII_PHONE).cast(pl.Int64).to_arrow(),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _scrub, batch_format="pyarrow", zero_copy_batch=True
    )


def pack_documents(
    ds: "ray.data.Dataset",
    budget_words: int = 256,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 16,
):
    """Deterministic shard packing: within each group, documents in id
    order are assigned to consecutive bins of ~``budget_words`` words —
    ``bin_id = (running_sum_before_doc) // budget`` — the "pack the corpus
    into fixed-budget training shards" step, reproducible across runs and
    cluster sizes because the scan order is the key order, not arrival
    order.

    One hash exchange keyed by group, one vectorized per-partition
    sort + windowed cumulative sum.  Output: (doc_id, group_col,
    n_words:int64, bin_id:int64).
    """

    def _partial(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t[text_col].combine_chunks())
        n = (
            s.str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
            .list.len()
            .cast(pl.Int64)
        )
        out = pa.table(
            {
                id_col: t[id_col],
                group_col: t[group_col],
                "n_words": n.to_arrow(),
            }
        )
        h = fnv1a_hash_strings(out[group_col].combine_chunks().cast(pa.string()))
        return out.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32())
        )

    partials = ds.select_columns([id_col, group_col, text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _pack(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [
                    (id_col, pa.int64()),
                    (group_col, pa.string()),
                    ("n_words", pa.int64()),
                    ("bin_id", pa.int64()),
                ]
            ).empty_table()
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort([group_col, id_col])
            .with_columns(
                bin_id=(
                    (pl.col("n_words").cum_sum().over(group_col) - pl.col("n_words"))
                    // budget_words
                ).cast(pl.Int64)
            )
        )
        return df.to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(partials, ["part"], num_parts, _pack)


def distinct_tokens_exact(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    num_parts: int = 32,
):
    """Exact distinct-token count per group.  Per-batch local distinct
    (group, token-hash) pairs first, ONE hash exchange keyed by the token
    hash (8 bytes — the token string never shuffles), per-partition distinct
    → partial counts, tiny final merge per group.  The exact baseline the
    HLL sketch below is gated against.

    Token identity is the 64-bit FNV hash: collisions would undercount at
    ~n²/2⁶⁴ — negligible below ~10⁹ distinct tokens (document the bound
    rather than shuffle strings).

    Output: (group_col, n_distinct:int64).
    """

    def _pairs(t: pa.Table) -> pa.Table:
        df = (
            pl.DataFrame(
                {
                    group_col: pl.from_arrow(t[group_col].combine_chunks()),
                    "token": pl.from_arrow(t[text_col].combine_chunks()).str.extract_all(
                        r"\S+"
                    ),
                }
            )
            .explode("token")
            .drop_nulls("token")
        )
        out = df.unique([group_col, "token"]).to_arrow()
        h = fnv1a_hash_strings(out["token"].combine_chunks())
        return pa.table(
            {
                group_col: out[group_col],
                "th": pa.array(h, pa.uint64()),
                "part": pa.array((h % np.uint64(num_parts)).astype(np.int32), pa.int32()),
            }
        )

    partials = ds.select_columns([group_col, text_col]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def _count(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([(group_col, pa.string()), ("n_partial", pa.int64())]).empty_table()
        agg = (
            pl.from_arrow(t.drop_columns(["part"]))
            .unique([group_col, "th"])
            .group_by(group_col)
            .agg(n_partial=pl.len().cast(pl.Int64))
        )
        return agg.to_arrow()

    from record_linkage_ldu_ray.runtime import partitioned_map

    parts = partitioned_map(partials, ["part"], num_parts, _count)
    tbls = [t for t in ray.get(parts.to_arrow_refs()) if len(t)]
    if not tbls:
        return pa.schema([(group_col, pa.string()), ("n_distinct", pa.int64())]).empty_table()
    merged = pl.from_arrow(pa.concat_tables(tbls))
    out = (
        merged.group_by(group_col)
        .agg(n_distinct=pl.col("n_partial").sum())
        .sort(group_col)
    )
    return out.to_arrow()


_HLL_P = 12  # 4096 registers → ~1.6% relative standard error


def distinct_tokens_hll(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    num_parts: int = 16,
):
    """Approximate distinct-token count per group via HyperLogLog
    (Flajolet et al. 2007, public): the 100 TB path where the exact
    operator's distinct-pair exchange is itself too wide.  The sketch is a
    4096-byte register array per group; per-batch partial sketches merge by
    ELEMENTWISE MAX — fully associative, so the estimate is exactly
    invariant to batching, partitioning, and cluster size (asserted in
    pytest).  Exchange volume: one 4 KB row per (group, batch) regardless
    of token count.

    Output: (group_col, n_distinct_est:int64, n_registers:int64).
    """
    m = 1 << _HLL_P

    def _sketch(t: pa.Table) -> pa.Table:
        df = (
            pl.DataFrame(
                {
                    group_col: pl.from_arrow(t[group_col].combine_chunks()),
                    "token": pl.from_arrow(t[text_col].combine_chunks()).str.extract_all(
                        r"\S+"
                    ),
                }
            )
            .explode("token")
            .drop_nulls("token")
        )
        out_schema = pa.schema(
            [
                (group_col, pa.string()),
                ("regs", pa.list_(pa.uint8(), m)),
                ("part", pa.int32()),
            ]
        )
        if len(df) == 0:
            return out_schema.empty_table()
        h = splitmix64(fnv1a_hash_strings(df["token"].to_arrow()))
        garr = df[group_col].to_arrow()
        if isinstance(garr, pa.ChunkedArray):
            garr = garr.combine_chunks()
        enc = garr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ngroups = len(enc.dictionary)
        reg = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        low = (h & np.uint64((1 << (64 - _HLL_P)) - 1)).astype(np.float64)
        _, exp = np.frexp(low)  # bit length of the low 52 bits (0 for 0)
        rank = ((64 - _HLL_P) - exp + 1).astype(np.uint8)  # 1..53
        regs = np.zeros(ngroups * m, np.uint8)
        np.maximum.at(regs, codes * m + reg, rank)
        groups = enc.dictionary.to_pylist()
        hparts = fnv1a_hash_strings(pa.array(groups, pa.string()))
        return pa.table(
            {
                group_col: pa.array(groups, pa.string()),
                "regs": pa.FixedSizeListArray.from_arrays(pa.array(regs, pa.uint8()), m),
                "part": pa.array(
                    (hparts % np.uint64(num_parts)).astype(np.int32), pa.int32()
                ),
            },
            schema=out_schema,
        )

    partials = ds.select_columns([group_col, text_col]).map_batches(
        _sketch, batch_format="pyarrow", zero_copy_batch=True
    )

    alpha = 0.7213 / (1.0 + 1.079 / m)

    def _estimate(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                (group_col, pa.string()),
                ("n_distinct_est", pa.int64()),
                ("n_registers", pa.int64()),
            ]
        )
        if len(t) == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"]))
        rows = {group_col: [], "n_distinct_est": [], "n_registers": []}
        for (g,), sub in df.group_by(group_col):  # ≤ a handful of groups/partition
            mat = np.stack([np.asarray(r, np.uint8) for r in sub["regs"].to_list()])
            regs = mat.max(axis=0)
            # Exact-integer denominator: sum(2^-reg) scaled by 2^53 is a sum
            # of integer powers of two (rank <= 53), so S below is the
            # INFINITELY-PRECISE sum — no float-summation-order dependence,
            # which makes the estimate bit-identical at any partitioning AND
            # replayable in SQL (the oracle computes the same S in HUGEINT).
            counts = np.bincount(regs.astype(np.int64), minlength=54)
            S = sum(int(c) << (53 - r) for r, c in enumerate(counts.tolist()) if c)
            est = alpha * m * m * 9007199254740992.0 / S
            zeros = int(counts[0])
            if est <= 2.5 * m and zeros:
                # math.log (libm), not np.log: numpy's vectorized log can be
                # 1 ulp off libm, and the SQL oracle's ln() IS libm.
                est = m * math.log(m / zeros)  # linear-counting small-range fix
            rows[group_col].append(g)
            rows["n_distinct_est"].append(int(round(est)))
            rows["n_registers"].append(m)
        return pa.table(rows, schema=out_schema)

    from record_linkage_ldu_ray.runtime import partitioned_map

    return partitioned_map(partials, ["part"], num_parts, _estimate)


def winnowing_fingerprints(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
):
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): rolling
    k-gram hashes over characters, minimum per sliding window, deduped —
    robust partial-overlap fingerprint.  Output: (doc_id,
    fingerprints:list<uint64>, n_fp:int64).  Deterministic; no SQL oracle
    (rows-only check)."""

    def _fp(t: pa.Table) -> pa.Table:
        """Vectorized across the WHOLE batch: one rolling-hash pass over the
        concatenated utf8 buffer, one global sliding-window min, doc-aware
        masks — no per-document Python loop (the flat-values/offsets scheme
        used by every other kernel in this engine)."""
        import pyarrow.compute as pc

        texts = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        texts = pc.fill_null(texts, "")
        n = len(texts)
        width = 8 if pa.types.is_large_string(texts.type) else 4
        odt = np.int64 if width == 8 else np.int32
        offs = np.frombuffer(
            texts.buffers()[1], dtype=odt, count=n + 1, offset=texts.offset * width
        ).astype(np.int64)
        data = np.frombuffer(texts.buffers()[2], np.uint8)[offs[0] : offs[-1]]
        offs = offs - offs[0]
        dlen = offs[1:] - offs[:-1]
        total = int(dlen.sum())

        # rolling polynomial k-gram hash over the FLAT byte buffer; k-gram
        # start positions inside doc d live at flat [offs[d], offs[d]+m_d)
        m_flat = max(total - k + 1, 0)
        b = data.astype(np.uint64)
        h = np.zeros(m_flat, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(k):
                h = h * np.uint64(0x100000001B3) + b[i : i + m_flat]
            h = splitmix64(h)
        m_doc = np.maximum(dlen - k + 1, 0)  # docs shorter than k → none

        sel_vals: list[np.ndarray] = []
        sel_docs: list[np.ndarray] = []
        # long docs: window-min per sliding window — ONE global sliding-min
        # over the flat hash array; windows that stay inside a doc never see
        # another doc's (or a boundary-straddling) hash
        wcnt = np.where(m_doc > window, m_doc - window + 1, 0)
        if m_flat >= window and int(wcnt.sum()):
            W = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            tot_w = int(wcnt.sum())
            starts = np.cumsum(wcnt) - wcnt
            flat_idx = np.repeat(offs[:-1], wcnt) + (
                np.arange(tot_w, dtype=np.int64) - np.repeat(starts, wcnt)
            )
            sel_vals.append(W[flat_idx])
            sel_docs.append(np.repeat(np.arange(n, dtype=np.int64), wcnt))
        # short docs (1 ≤ m ≤ window): single fingerprint = min over the
        # doc's k-gram segment — gather the segments contiguously, then one
        # reduceat gives each doc's min exactly
        short = np.nonzero((m_doc >= 1) & (m_doc <= window))[0]
        if len(short):
            reps = m_doc[short]
            tot_s = int(reps.sum())
            sstarts = np.cumsum(reps) - reps
            sidx = np.repeat(offs[:-1][short], reps) + (
                np.arange(tot_s, dtype=np.int64) - np.repeat(sstarts, reps)
            )
            sel_vals.append(np.minimum.reduceat(h[sidx], sstarts))
            sel_docs.append(short)

        if sel_vals:
            vals = np.concatenate(sel_vals)
            docs = np.concatenate(sel_docs)
            # per-doc sorted-unique fingerprints
            order = np.lexsort((vals, docs))
            vals, docs = vals[order], docs[order]
            keep = np.ones(len(vals), bool)
            if len(vals) > 1:
                keep[1:] = ~((vals[1:] == vals[:-1]) & (docs[1:] == docs[:-1]))
            vals, docs = vals[keep], docs[keep]
            counts = np.bincount(docs, minlength=n)
        else:
            vals = np.empty(0, np.uint64)
            counts = np.zeros(n, np.int64)
        fp_offs = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=fp_offs[1:])
        fps = pa.LargeListArray.from_arrays(
            pa.array(fp_offs, pa.int64()), pa.array(vals, pa.uint64())
        ).cast(pa.list_(pa.uint64()))
        return pa.table(
            {
                id_col: t[id_col],
                "fingerprints": fps,
                "n_fp": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_scores(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style within-document repetition signals, per document:

    - ``n_tokens``        whitespace token count
    - ``dup_token_frac``  1 − distinct/total tokens
    - ``dup_2gram_frac``  1 − distinct/total word 2-grams
    - ``top_2gram_frac``  occurrences of the most frequent 2-gram ÷ total

    Embarrassingly parallel (one ``map_batches``, no shuffle): tokens are
    hashed once per batch (the same fnv1a kernel as the dedup suite), the
    2-gram key is a rolling combine of adjacent token hashes, and both
    distinct counts and the per-doc most-frequent-gram count come from ONE
    two-level vectorized polars group-by — no Python per row.  These are
    the repetition filters of Rae et al. 2021 ("Scaling Language Models",
    Gopher §A1.1) used by every large-scale curation stack.

    Docs with no tokens (or a single token → no 2-grams) score 0.0 on the
    affected fractions rather than NaN.
    """

    def _scores(t: pa.Table) -> pa.Table:
        texts = t[text_col].combine_chunks()
        s = (
            pl.from_arrow(texts)
            .str.strip_chars()
            .str.replace_all(r"\s+", " ")
            .str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
        )
        arr = s.to_arrow()
        if pa.types.is_large_list(arr.type):
            arr = arr.cast(pa.list_(pa.string()))
        arr = arr.fill_null([])
        offs = arr.offsets.to_numpy().astype(np.int64)
        lens = offs[1:] - offs[:-1]
        ndocs = len(arr)
        flat = arr.flatten()
        th = fnv1a_hash_strings(flat) if len(flat) else np.empty(0, np.uint64)
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)

        # distinct tokens per doc: sort (doc, hash), count run starts
        n_distinct = np.zeros(ndocs, np.int64)
        if len(th):
            order = np.lexsort((th, doc_of))
            sh, sd = th[order], doc_of[order]
            new = np.ones(len(sh), bool)
            new[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
            np.add.at(n_distinct, sd[new], 1)

        # 2-gram hashes: rolling combine of adjacent token hashes
        n_tok = lens.astype(np.int64)
        total2 = np.maximum(n_tok - 1, 0)
        distinct2 = np.zeros(ndocs, np.int64)
        top2 = np.zeros(ndocs, np.int64)
        if len(th) > 1:
            with np.errstate(over="ignore"):
                comb = splitmix64(th * np.uint64(0x100000001B3) ^ np.roll(th, -1))
            pos = np.arange(len(th), dtype=np.int64) - np.repeat(offs[:-1], lens)
            valid = pos < np.repeat(lens, lens) - 1
            g, gd = comb[valid], doc_of[valid]
            if len(g):
                cnt = (
                    pl.DataFrame({"d": gd, "g": g})
                    .group_by("d", "g")
                    .len()
                    .group_by("d")
                    .agg(
                        pl.len().cast(pl.Int64).alias("distinct2"),
                        pl.col("len").max().cast(pl.Int64).alias("top2"),
                    )
                )
                dix = cnt["d"].to_numpy()
                distinct2[dix] = cnt["distinct2"].to_numpy()
                top2[dix] = cnt["top2"].to_numpy()

        tok_f = np.where(n_tok > 0, 1.0 - n_distinct / np.maximum(n_tok, 1), 0.0)
        g_f = np.where(total2 > 0, 1.0 - distinct2 / np.maximum(total2, 1), 0.0)
        t_f = np.where(total2 > 0, top2 / np.maximum(total2, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "dup_token_frac": pa.array(tok_f, pa.float64()),
                "dup_2gram_frac": pa.array(g_f, pa.float64()),
                "top_2gram_frac": pa.array(t_f, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _scores, batch_format="pyarrow", zero_copy_batch=True
    )


def value_quantile_sketch(
    sf_dir: str, k: int = 512, qs: tuple = (0.5, 0.9, 0.99)
):
    """Approximate per-event-type quantiles of ``value`` via a MERGEABLE
    deterministic bottom-k sample sketch.

    Each block keeps, per group, the ``k`` rows with the smallest hash
    priority (``splitmix64(fnv1a(event_id))`` — a deterministic uniform
    permutation of the rows); merging partials = keep the k smallest
    priorities again.  The result is the SAME uniform-without-replacement
    sample at any batching / partitioning / cluster size — the property
    that makes the sketch usable as a distributed aggregate (same
    associative-merge contract as the HLL sketch).  Quantiles read off the
    sample with the ``quantile_disc`` rule; rank error is O(1/√k).

    Exchange volume is O(groups × k × blocks) tiny partial rows; the raw
    stream is never shuffled.  Rows-only driver check (sampling has no SQL
    twin); pytest pins accuracy vs exact quantiles AND partition
    invariance.

    Output: (event_type, n_sample:int64, q50_est, q90_est, q99_est).
    """
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        pri = splitmix64(
            fnv1a_hash_strings(t["event_id"].cast(pa.string()))
        ).astype(np.uint64)
        df = pl.DataFrame(
            {
                "event_type": pl.from_arrow(t["event_type"].combine_chunks()),
                "pri": pri,
                "value": pl.from_arrow(t["value"].combine_chunks()),
            }
        )
        return (
            df.sort("pri")
            .group_by("event_type", maintain_order=True)
            .head(k)
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
                "n_sample": pa.array([], pa.int64()),
                **{f"q{int(q * 100)}_est": pa.array([], pa.float64()) for q in qs},
            }
        )
    merged = (
        pl.from_arrow(pa.concat_tables(parts, promote_options="permissive"))
        .sort("pri")
        .group_by("event_type", maintain_order=True)
        .head(k)
    )

    # quantile_disc read-off: sorted sample element at max(1, ceil(p*n))
    out = (
        merged.sort(["event_type", "value"])
        .group_by("event_type", maintain_order=True)
        .agg(
            pl.len().cast(pl.Int64).alias("n_sample"),
            *[
                pl.col("value")
                .sort()
                .get(
                    (pl.len().cast(pl.Float64) * q).ceil().cast(pl.Int64).clip(1) - 1
                )
                .alias(f"q{int(q * 100)}_est")
                for q in qs
            ],
        )
        .sort("event_type")
    )
    t = out.to_arrow()
    return t.set_column(0, "event_type", t["event_type"].cast(pa.string()))


def vocab_coverage_scores(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_v: int = 1000,
):
    """Per-document vocabulary coverage: the fraction of a doc's tokens
    that belong to the corpus top-``top_v`` vocabulary — the cheap
    LM-free fluency/quality proxy (garbled or non-language docs score low).

    Two phases, both scale-shaped: (1) the vocabulary comes from the
    ``vocab_top_tokens`` three-level aggregation (exchange carries distinct
    tokens per batch, never the stream; deterministic count-DESC/token-ASC
    tie-break), (2) the top-V token HASH set (8 bytes × V) is broadcast
    once via ``ray.put`` and the corpus streams through one vectorized
    searchsorted membership pass — the same broadcast-probe shape as
    decontamination.

    Output: (doc_id, n_tokens:int64, n_in_vocab:int64,
    vocab_coverage:float64 — 0.0 for empty docs).
    """
    import ray

    vocab = vocab_top_tokens(ds, id_col=id_col, text_col=text_col, k=top_v)
    vh = np.sort(fnv1a_hash_strings(vocab["token"])) if len(vocab) else np.empty(0, np.uint64)
    vref = ray.put(vh)

    def _cover(t: pa.Table) -> pa.Table:
        vset = ray.get(vref)
        s = (
            pl.from_arrow(t[text_col].combine_chunks())
            .str.extract_all(r"\S+")
        )
        arr = s.to_arrow()
        if pa.types.is_large_list(arr.type):
            arr = arr.cast(pa.list_(pa.string()))
        arr = arr.fill_null([])
        offs = arr.offsets.to_numpy().astype(np.int64)
        lens = offs[1:] - offs[:-1]
        flat = arr.flatten()
        th = fnv1a_hash_strings(flat) if len(flat) else np.empty(0, np.uint64)
        if len(vset) and len(th):
            pos = np.searchsorted(vset, th)
            pos[pos == len(vset)] = 0
            hit = vset[pos] == th
        else:
            hit = np.zeros(len(th), bool)
        cs = np.concatenate(([0], np.cumsum(hit, dtype=np.int64)))
        n_in = cs[offs[1:]] - cs[offs[:-1]]
        n_tok = lens.astype(np.int64)
        cov = np.where(n_tok > 0, n_in / np.maximum(n_tok, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_in_vocab": pa.array(n_in, pa.int64()),
                "vocab_coverage": pa.array(cov, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _cover, batch_format="pyarrow", zero_copy_batch=True
    )


def token_freq_cms(
    sf_dir: str, k: int = 20, d: int = 4, w: int = 1 << 14
):
    """Heavy-hitter token frequencies cross-checked by a Count-Min sketch:
    for the corpus's exact top-``k`` tokens, the exact occurrence count
    next to the CMS estimate.

    The CMS side shows the one-exchange-free aggregation path: each block
    builds a LOCAL (d×w) sketch over its token-hash stream (vectorized
    ``np.add.at``), the driver sums the ≤ blocks × d×w counters — sketch
    merge is exact and associative, so the result is bit-identical at any
    batching/partitioning, and estimate ≥ truth always (pytest-pinned
    with the 2N/w bound).  The exact side reuses ``vocab_top_tokens``.

    Output: (token, n_occurrences:int64, cms_estimate:int64).
    """
    import ray

    from record_linkage_ldu_ray.functions.countmin import cms_build, cms_estimate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _sketch(t: pa.Table) -> pa.Table:
        toks = (
            pl.from_arrow(t["text"].combine_chunks()).str.extract_all(r"\S+").explode()
        )
        toks = toks.drop_nulls()
        h = fnv1a_hash_strings(toks.to_arrow().cast(pa.string()))
        m = cms_build(h, d=d, w=w)
        return pa.table({"m": pa.array([m.ravel()], pa.list_(pa.int64()))})

    parts = [
        p
        for p in ray.get(
            ds.map_batches(_sketch, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
        if len(p)
    ]
    m = np.zeros(d * w, np.int64)
    for p in parts:
        flat = p["m"].combine_chunks()
        vals = flat.flatten().to_numpy().reshape(len(flat), d * w)
        m += vals.sum(axis=0)
    m = m.reshape(d, w)

    top = vocab_top_tokens(ds, k=k)
    th = fnv1a_hash_strings(top["token"])
    est = cms_estimate(m, th)
    return pa.table(
        {
            "token": top["token"].combine_chunks().cast(pa.string()),
            "n_occurrences": top["n_occurrences"].combine_chunks().cast(pa.int64()),
            "cms_estimate": pa.array(est, pa.int64()),
        }
    )


def chunk_documents(
    ds: "ray.data.Dataset",
    chunk_tokens: int = 16,
    stride: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Split documents into overlapping token windows — the RAG/embedding
    chunking step (chunk of ``chunk_tokens`` tokens every ``stride``
    tokens; the final partial window is kept so no suffix is lost).

    Pure per-batch explode (polars int_ranges + list.slice — no Python per
    row, no shuffle): chunk boundaries depend only on the document itself,
    so output is identical at any batching/partitioning and the operator
    streams at input speed.  1→N fan-out inside ``map_batches`` is the
    same shape as the video frame-sample stage.

    Output: (doc_id, chunk_idx:int32, n_chunk_tokens:int64, chunk:string).
    """

    def _explode(t: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                id_col: pl.from_arrow(t[id_col].combine_chunks()),
                "w": pl.from_arrow(t[text_col].combine_chunks())
                .str.strip_chars()
                .str.replace_all(r"\s+", " ")
                .str.split(" ")
                .list.eval(pl.element().filter(pl.element() != "")),
            }
        )
        out = (
            df.with_columns(
                pl.int_ranges(
                    0, pl.max_horizontal(pl.col("w").list.len(), 1), stride
                ).alias("_starts")
            )
            .explode("_starts")
            # windows starting past the end exist only for len%stride edge:
            # keep starts strictly inside the doc (or 0 for empty docs)
            .filter(
                (pl.col("_starts") < pl.col("w").list.len())
                | (pl.col("_starts") == 0)
            )
            .with_columns(
                pl.col("w")
                .list.slice(pl.col("_starts"), chunk_tokens)
                .alias("_chunk_toks"),
                (pl.col("_starts") // stride).cast(pl.Int32).alias("chunk_idx"),
            )
            .with_columns(
                pl.col("_chunk_toks").list.len().cast(pl.Int64).alias("n_chunk_tokens"),
                pl.col("_chunk_toks").list.join(" ").alias("chunk"),
            )
            .select([id_col, "chunk_idx", "n_chunk_tokens", "chunk"])
        )
        a = out.to_arrow()
        return a.cast(
            pa.schema(
                [
                    (id_col, a.schema.field(id_col).type),
                    ("chunk_idx", pa.int32()),
                    ("n_chunk_tokens", pa.int64()),
                    ("chunk", pa.string()),
                ]
            )
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True
    )
