"""Vectorized text normalizers (reference semantics: pre_processing.py:48-79).

The reference applies per-cell Python normalizers with ``Series.apply``
(pre_processing.py:176-213).  Here the same semantics run vectorized in
polars/Arrow over whole batches — lower-case → strip non-alphanumeric →
tokenize → stopword-filter → (optionally) sort tokens → join — with Arrow
nulls propagated (missing stays missing; missing → similarity 0 downstream,
README.md:169).

Both the sorted variant (``normalize_name``/``normalize_address``,
pre_processing.py:48-65) and the unsorted variant (``normalize_email``,
pre_processing.py:73-79) exist; ``normalize_number`` (digits only,
pre_processing.py:68-70) is ``extract_digits``.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from record_linkage_ldu_ray.config import NormalizerConfig

_NON_ALNUM = r"[^a-z0-9]+"


def _to_polars(arr) -> pl.Series:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, type=pa.string())
    return pl.from_arrow(arr)


def normalize_tokens(arr, cfg: NormalizerConfig = NormalizerConfig()) -> pl.Series:
    """String array → list<string> of normalized tokens (polars Series).

    Vectorized polars pipeline; null in → null out.
    """
    s = _to_polars(arr)
    if cfg.lowercase:
        s = s.str.to_lowercase()
    s = s.str.replace_all(_NON_ALNUM, " ").str.strip_chars()
    toks = s.str.split(" ")
    stop = list(cfg.stopwords)
    expr = pl.element().filter(
        (~pl.element().is_in(stop))
        & (pl.element().str.len_chars() >= max(1, cfg.min_token_len))
    )
    toks = toks.list.eval(expr)
    if cfg.sort_tokens:
        toks = toks.list.sort()
    return toks


def normalize_text(arr, cfg: NormalizerConfig = NormalizerConfig()) -> pa.Array:
    """Full normalizer: tokens re-joined with single spaces (Arrow out)."""
    joined = normalize_tokens(arr, cfg).list.join(" ")
    out = joined.to_arrow()
    return out.cast(pa.string()) if not pa.types.is_string(out.type) else out


def extract_digits(arr) -> pa.Array:
    """normalize_number analog: keep digits only (pre_processing.py:68-70)."""
    s = _to_polars(arr).str.replace_all(r"[^0-9]", "")
    out = s.to_arrow()
    return out.cast(pa.string()) if not pa.types.is_string(out.type) else out


def strip_float_suffix(arr) -> pa.Array:
    """validate_strings analog: cast to str, strip a trailing '.0'
    (main_ldu_hw.py:17-21).  Kept only for reference-parity fixtures —
    typed Arrow schemas make it unnecessary in the engine proper."""
    s = _to_polars(arr).cast(pl.Utf8).str.replace(r"\.0$", "")
    out = s.to_arrow()
    return out.cast(pa.string()) if not pa.types.is_string(out.type) else out


_SOUNDEX_MAP = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(token: str) -> str:
    """Classic 4-char Soundex of a lower-case token; '' for empty/non-alpha.

    Used for the phonetic/prefix blocking key (graft of the reference's
    'only matching countries' blocking advice, README.md:245).
    """
    t = [c for c in token.lower() if c.isalpha()]
    if not t:
        return ""
    first = t[0]
    digits = [_SOUNDEX_MAP.get(c, "") for c in t]
    out = [first.upper()]
    prev = digits[0]
    for d in digits[1:]:
        if d and d != prev:
            out.append(d)
        prev = d
        if len(out) == 4:
            break
    return ("".join(out) + "000")[:4]


def soundex_array(tokens: np.ndarray | list[str]) -> np.ndarray:
    """Soundex over an array of tokens with memoization (vocabulary is much
    smaller than the row count, so the Python soundex runs once per unique
    token, then a vectorized take)."""
    arr = np.asarray(tokens, dtype=object)
    uniq, inv = np.unique(arr.astype(str), return_inverse=True)
    codes = np.array([soundex(u) for u in uniq], dtype=object)
    return codes[inv]


def merge_columns(a, b, sep: str = " ") -> pa.Array:
    """M18 ``merge_columns`` (pre_processing.py:88-111): fuse two string
    columns into one — both present → concat with ``sep``; one missing →
    the other; both missing → null.  Vectorized Arrow kernel."""
    import pyarrow.compute as pc

    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    a = a.cast(pa.string())
    b = b.cast(pa.string())
    both = pc.and_(a.is_valid(), b.is_valid())
    joined = pc.binary_join_element_wise(a, b, sep)
    either = pc.coalesce(a, b)
    return pc.if_else(both, joined, either)


# §2.11 per-field normalizer registry — the reference picks a normalizer
# per column in its apply sweep (pre_processing.py:176-213: name/address
# sorted, email unsorted, phone/zip digits-only).  ``normalize_columns``
# applies a {column → registry name} plan in ONE batch UDF.
def _registry_identity(arr, cfg):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


NORMALIZERS = {
    "text_sorted": lambda arr, cfg: normalize_text(
        arr, __import__("dataclasses").replace(cfg, sort_tokens=True)
    ),
    "text_unsorted": lambda arr, cfg: normalize_text(
        arr, __import__("dataclasses").replace(cfg, sort_tokens=False)
    ),
    "digits": lambda arr, cfg: extract_digits(arr),
    "strip_float": lambda arr, cfg: strip_float_suffix(arr),
    "identity": _registry_identity,
}


def normalize_columns(ds, plan: dict[str, str], cfg: NormalizerConfig = NormalizerConfig(), suffix: str = "_norm"):
    """Apply a per-column normalizer plan to a Dataset: each ``col`` in
    ``plan`` gains ``<col><suffix>`` = ``NORMALIZERS[plan[col]]`` applied
    vectorized; originals pass through untouched (the reference keeps raw
    beside processed, pre_processing.py:172-173)."""

    def _f(t: pa.Table) -> pa.Table:
        for col, name in plan.items():
            t = t.append_column(f"{col}{suffix}", NORMALIZERS[name](t[col], cfg))
        return t

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def canonicalize_lookup(arr, mapping: dict[str, str]) -> pa.Array:
    """M7/M8 ``fix_state``/``fix_country`` analog (pre_processing.py:32-45):
    map values through a canonicalization table, PASS-THROUGH on miss,
    nulls stay null.  The lookup is a small dict built once per worker —
    never a shuffle join."""
    s = _to_polars(arr).cast(pl.Utf8)
    out = s.replace(mapping)  # pass-through for keys not in the mapping
    res = out.to_arrow()
    return res.cast(pa.string()) if not pa.types.is_string(res.type) else res
