"""Similarity kernels (reference: compare_ldu_hw.py:66-76 dispatch —
``td.ratcliff_obershelp`` for long multi-token fields, normalized
Levenshtein for short fields; both in [0, 1]).

Graft additions per the north star: token-set Jaccard (long-field analog),
Jaro-Winkler (short-field analog), timestamp-gap similarity.  All are plain
deterministic functions; the scorer actor (stages/scoring.py) holds the
dispatch table as state.
"""

from __future__ import annotations

import math
import sys
from difflib import SequenceMatcher

import numpy as np

# _lev_core packs 64 bool columns into one uint64 word per pair via
# np.packbits(...).view(np.uint64); the view reassembles 8 bytes in HOST
# byte order, so bitorder="little" is only correct on a little-endian
# host.  Fail loudly at import rather than silently corrupt distances.
if sys.byteorder != "little":  # pragma: no cover - no BE host in CI
    raise ImportError(
        "record_linkage_ldu_ray.functions.sim requires a little-endian "
        "host: the bit-parallel Levenshtein kernel packs Eq masks with "
        "np.packbits(bitorder='little').view(np.uint64), which assembles "
        "bytes in host order.  Port _lev_core (byteswap after the view) "
        "before running on big-endian."
    )


def ratcliff_obershelp(s1: str, s2: str) -> float:
    """Ratcliff/Obershelp similarity — same algorithm difflib implements
    (the reference uses textdistance's, compare_ldu_hw.py:69).
    ``autojunk=False`` because textdistance has no junk heuristic, so this
    stays bit-equal to the reference (and to the batched kernel) at every
    string length, not only below difflib's 200-char autojunk cutoff."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return SequenceMatcher(None, s1, s2, autojunk=False).ratio()


def levenshtein_normalized(s1: str, s2: str) -> float:
    """1 - levenshtein(s1, s2) / max(len); vectorized DP over numpy rows."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    if n1 < n2:
        s1, s2, n1, n2 = s2, s1, n2, n1
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    m = len(b)
    jr = np.arange(m + 1)
    prev = jr.astype(np.int64)
    for i, ca in enumerate(a, 1):
        # deletion/substitution candidates, vectorized
        t = np.minimum(prev[1:] + 1, prev[:-1] + (b != ca))
        # insertion chain cur[j] = min_{k<=j} (u[k] + (j-k)) via cumulative min
        u = np.concatenate(([i], t))
        prev = np.minimum.accumulate(u - jr) + jr
    dist = int(prev[-1])
    return 1.0 - dist / max(n1, n2)


def jaro(s1: str, s2: str) -> float:
    n1, n2 = len(s1), len(s2)
    if n1 == 0 and n2 == 0:
        return 1.0
    if n1 == 0 or n2 == 0:
        return 0.0
    match_dist = max(n1, n2) // 2 - 1
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    b_matched = np.zeros(n2, dtype=bool)
    a_match_idx = np.full(n1, -1, dtype=np.int64)
    for i in range(n1):
        lo = max(0, i - match_dist)
        hi = min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == a[i]:
                b_matched[j] = True
                a_match_idx[i] = j
                break
    m_idx = a_match_idx[a_match_idx >= 0]
    m = len(m_idx)
    if m == 0:
        return 0.0
    # transpositions: matched chars of a, in order, vs matched chars of b in order
    t = int(np.count_nonzero(a[a_match_idx >= 0] != b[np.sort(m_idx)])) // 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler(
    s1: str,
    s2: str,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.0,
) -> float:
    """Jaro-Winkler in [0, 1] (prefix boost over plain Jaro).

    ``boost_threshold``: apply the Winkler prefix boost only when the plain
    Jaro similarity exceeds it.  The engine default (0.0) boosts every
    nonzero Jaro, matching the reference's textdistance behavior; 0.7 is
    the classic Winkler constant and what DuckDB's
    ``jaro_winkler_similarity`` uses (the SQL-oracle-parity mode)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    ell = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        ell += 1
    return j + ell * prefix_weight * (1.0 - j)


_U64_ONE = np.uint64(1)
_U64_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)

# 64-bit De Bruijn sequence: index of an isolated set bit b is
# TABLE[(b * CONST) >> 58] — the classic public bit-hack, integer-exact
_DB_CONST = np.uint64(0x03F79D71B4CB0A89)
_DB_TABLE = np.zeros(64, dtype=np.int64)
for _k in range(64):
    _DB_TABLE[((1 << _k) * 0x03F79D71B4CB0A89 % (1 << 64)) >> 58] = _k
del _k


def _mask_below(k: np.ndarray) -> np.ndarray:
    """uint64 masks with bits [0, k) set; k in [0, 64] (vectorized)."""
    k = np.clip(k, 0, 64)
    kk = np.where(k >= 64, 0, k).astype(np.uint64)
    m = (_U64_ONE << kk) - _U64_ONE
    return np.where(k >= 64, _U64_FULL, m)


def _pad_codes(strs: list, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of strings into an (n, L) uint32 code-point matrix +
    lengths (truncated to L).  None → empty."""
    n = len(strs)
    out = np.zeros((n, L), dtype=np.uint32)
    lens = np.zeros(n, dtype=np.int64)
    for i, s in enumerate(strs):
        if not s:
            continue
        s = s[:L]
        lens[i] = len(s)
        out[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return out, lens


def pad_codes_arrow(arr, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (n, L) uint32 code-point matrix + code-point
    lengths, with NO per-row Python: slice to L code points with an Arrow
    kernel, decode the contiguous utf8 buffer once (C-speed), scatter into
    the padded matrix with one fancy-index store.  Nulls → empty."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    out = np.zeros((n, L), dtype=np.uint32)
    lens = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out, lens
    arr = pc.fill_null(arr, "")
    sliced = pc.utf8_slice_codeunits(arr, 0, L)  # codepoints, per Arrow docs
    if isinstance(sliced, pa.ChunkedArray):
        sliced = sliced.combine_chunks()
    lens = pc.utf8_length(sliced).to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return out, lens
    width = 8 if pa.types.is_large_string(sliced.type) else 4
    odt = np.int64 if width == 8 else np.int32
    offs = np.frombuffer(
        sliced.buffers()[1], dtype=odt, count=n + 1, offset=sliced.offset * width
    )
    data = sliced.buffers()[2].slice(int(offs[0]), int(offs[-1] - offs[0])).to_pybytes()
    codes = np.frombuffer(data.decode("utf-8").encode("utf-32-le"), dtype=np.uint32)
    starts = np.cumsum(lens) - lens
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    out[rows, pos] = codes
    return out, lens


def jaro_winkler_batch(
    strs_a: list,
    strs_b: list,
    max_len: int = 64,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
) -> np.ndarray:
    """Vectorized Jaro-Winkler over n string pairs — see ``_jw_core``.
    Strings longer than ``max_len`` are truncated; None → empty."""
    n = len(strs_a)
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    L = min(max_len, 64)
    A, la = _pad_codes(strs_a, L)
    B, lb = _pad_codes(strs_b, L)
    return _jw_core(A, la, B, lb, prefix_weight, max_prefix)


def jaro_winkler_batch_arrow(
    arr_a,
    arr_b,
    max_len: int = 64,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.0,
    empty_empty: float = 1.0,
    out_dtype=np.float32,
    clamp_window: bool = False,
) -> np.ndarray:
    """``jaro_winkler_batch`` fed directly from Arrow string arrays — the
    padded code matrices come from Arrow buffers (``pad_codes_arrow``), so
    the scorer's hot path never materializes Python strings.

    ``boost_threshold=0.7, empty_empty=0.0, out_dtype=np.float64,
    clamp_window=True`` is the SQL-oracle-parity configuration (DuckDB
    ``jaro_winkler_similarity`` semantics, verified bit-equal on random
    pairs and the test corpora); the defaults keep the engine's
    reference-parity semantics and float32 hot path."""
    n = len(arr_a)
    if n == 0:
        return np.zeros(0, dtype=out_dtype)
    L = min(max_len, 64)
    A, la = pad_codes_arrow(arr_a, L)
    B, lb = pad_codes_arrow(arr_b, L)
    return _jw_core(
        A,
        la,
        B,
        lb,
        prefix_weight,
        max_prefix,
        boost_threshold,
        empty_empty,
        out_dtype,
        clamp_window,
    )


def ratcliff_obershelp_batch_arrow(arr_a, arr_b, max_len: int = 64) -> np.ndarray:
    """Vectorized Ratcliff/Obershelp over n Arrow string pairs — the batch
    form of :func:`ratcliff_obershelp` (bit-equal per pair; hypothesis-
    tested), so the reference's long-field default algorithm
    (compare_ldu_hw.py:69) no longer falls off the vectorized path when
    selected in ``ScoringConfig.string_kernels``.

    Scheme (same style as the JW batching): pad both sides into (n, L)
    uint32 code-point matrices from the Arrow buffers, then replicate
    difflib's matching-block recursion as WAVES of subproblems.  Every
    wave runs one vectorized longest-common-substring DP over ALL active
    (pair, a-window, b-window) subproblems at once: for each row i the
    diagonal run lengths update as ``M[j] = E[j] * (M_prev[j-1] + 1)``
    across the whole subproblem batch, and the difflib tie-break (first
    strictly-longer block in ascending (i, j) scan) falls out of taking
    the first row that beats the best plus ``argmax``'s first-max rule.
    Matched blocks split their window into left/right children for the
    next wave; waves end when no subproblem remains.  No per-pair Python
    anywhere.
    """
    n = len(arr_a)
    out = np.zeros(n, dtype=np.float32)
    if n == 0:
        return out
    L = max_len
    A, la = pad_codes_arrow(arr_a, L)
    B, lb = pad_codes_arrow(arr_b, L)
    total = la + lb
    out[total == 0] = 1.0  # both empty → 1.0 (scalar-kernel convention)

    matched = np.zeros(n, dtype=np.int64)
    live = (la > 0) & (lb > 0)
    pid = np.nonzero(live)[0]
    alo = np.zeros(len(pid), np.int64)
    ahi = la[pid].copy()
    blo = np.zeros(len(pid), np.int64)
    bhi = lb[pid].copy()

    while len(pid):
        S = len(pid)
        # compact every subproblem's (a-window × b-window) into left-aligned
        # matrices of this wave's max window size — windows shrink fast as
        # the recursion splits, so late waves cost (max window)², not L²
        ha, wb = ahi - alo, bhi - blo
        H, W = int(ha.max()), int(wb.max())
        ar = np.arange(H, dtype=np.int64)[None, :]
        br = np.arange(W, dtype=np.int64)[None, :]
        rows_idx = np.minimum(alo[:, None] + ar, L - 1)
        cols_idx = np.minimum(blo[:, None] + br, L - 1)
        Asub = np.take_along_axis(A[pid], rows_idx, axis=1)
        Bsub = np.take_along_axis(B[pid], cols_idx, axis=1)
        # out-of-window cells get two DISTINCT sentinels above any real code
        # point, so the equality test alone encodes the window masks (saves
        # two boolean passes per DP row)
        Asub[ar >= ha[:, None]] = np.uint32(0xFFFFFFFF)
        Bsub[br >= wb[:, None]] = np.uint32(0xFFFFFFFE)
        m_prev = np.zeros((S, W), np.int32)
        m_cur = np.zeros((S, W), np.int32)
        best_k = np.zeros(S, np.int32)
        best_i = np.zeros(S, np.int64)
        best_j = np.zeros(S, np.int64)
        for i in range(H):
            eq = Asub[:, i][:, None] == Bsub
            np.add(m_prev[:, :-1], 1, out=m_cur[:, 1:])
            m_cur[~eq] = 0
            m_cur[:, 0] = eq[:, 0]
            j_end = np.argmax(m_cur, axis=1)  # first max = difflib tie-break
            row_max = np.take_along_axis(m_cur, j_end[:, None], axis=1)[:, 0]
            upd = row_max > best_k
            if upd.any():
                best_k = np.where(upd, row_max, best_k)
                best_i = np.where(upd, i, best_i)
                best_j = np.where(upd, j_end, best_j)
            m_prev, m_cur = m_cur, m_prev
        hit = best_k > 0
        np.add.at(matched, pid[hit], best_k[hit].astype(np.int64))
        # back to absolute coordinates, then split into children:
        # [alo, block_start) × [blo, block_start_j) and
        # (block_end, ahi) × (block_end_j, bhi)
        best_i = best_i + alo
        best_j = best_j + blo
        k = best_k.astype(np.int64)
        ia0, jb0 = best_i - k + 1, best_j - k + 1
        left = hit & (ia0 > alo) & (jb0 > blo)
        right = hit & (best_i + 1 < ahi) & (best_j + 1 < bhi)
        pid = np.concatenate([pid[left], pid[right]])
        alo, ahi, blo, bhi = (
            np.concatenate([alo[left], best_i[right] + 1]),
            np.concatenate([ia0[left], ahi[right]]),
            np.concatenate([blo[left], best_j[right] + 1]),
            np.concatenate([jb0[left], bhi[right]]),
        )

    nz = total > 0
    out[nz] = (2.0 * matched[nz] / total[nz]).astype(np.float32)
    return out


def levenshtein_batch_arrow(arr_a, arr_b, max_len: int = 64) -> np.ndarray:
    """Vectorized normalized Levenshtein over n Arrow string pairs — the
    batch form of :func:`levenshtein_normalized` (bit-equal per pair), so
    the reference's SHORT-field default algorithm (compare_ldu_hw.py:72,
    ``td.levenshtein.normalized_similarity``) runs vectorized when
    selected in ``ScoringConfig.string_kernels``.

    Scheme: see :func:`_lev_core` (Myers/Hyyrö bit-parallel DP).
    """
    n = len(arr_a)
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    score, la, lb = _lev_core(arr_a, arr_b, max_len)
    out = np.zeros(n, dtype=np.float64)
    nz = la > 0  # la >= lb after the swap; la == 0 → both empty
    out[nz] = 1.0 - score[nz] / la[nz]
    out[~nz] = 1.0  # both empty → 1.0 (scalar s1 == s2 fast path)
    out[(la > 0) & (lb == 0)] = 0.0  # one side empty → 0.0
    return out.astype(np.float32)


def levenshtein_distance_batch_arrow(arr_a, arr_b, max_len: int = 64) -> np.ndarray:
    """Raw integer Levenshtein edit distance over n Arrow string pairs
    (int64) — exact-integer output, so it is the natural SQL-oracle-parity
    kernel (DuckDB ``levenshtein``) with zero float-rounding surface.
    Strings are clamped to ``max_len`` (≤ 64) code points like every other
    batch kernel here; feed pre-sliced fields when parity matters."""
    n = len(arr_a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    score, _, _ = _lev_core(arr_a, arr_b, max_len)
    return score


def _lev_core(arr_a, arr_b, max_len: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared Myers/Hyyrö bit-parallel edit-distance DP: returns
    (distance:int64, la, lb) with la/lb the (possibly swapped) code-point
    lengths, la >= lb.

    The pattern's 64-bit state vectors (VP/VN) are held as numpy uint64
    ARRAYS over the whole pair batch — each text position advances every
    pair with ~12 vectorized word ops.  The per-position Eq masks come
    from one padded code-matrix comparison per column (same
    ``pad_codes_arrow`` buffers as the JW kernel).  Patterns are clamped
    to 64 code points (one machine word); ``max_len`` beyond 64 clamps
    like the JW kernel.
    """
    n = len(arr_a)
    L = min(max_len, 64)
    A, la = pad_codes_arrow(arr_a, L)
    B, lb = pad_codes_arrow(arr_b, L)

    # pattern = the LONGER side (scalar kernel swaps so n1 >= n2); Myers
    # wants the pattern in the bitmask, the text walked column-by-column
    swap = la < lb
    if swap.any():
        A2 = np.where(swap[:, None], B, A)
        B = np.where(swap[:, None], A, B)
        A = A2
        la2 = np.where(swap, lb, la)
        lb = np.where(swap, la, lb)
        la, lb = la2, lb

    one = np.uint64(1)
    score = la.astype(np.int64).copy()
    VP = _mask_below(la)
    VN = np.zeros(n, dtype=np.uint64)
    top = np.zeros(n, dtype=np.uint64)
    pos = la > 0
    top[pos] = one << (la[pos] - 1).astype(np.uint64)
    # Eq pack scratch: 64 bool columns (zero-padded past L) packed to one
    # uint64 word per pair via packbits — ~9× faster than the shift+sum
    # reduction it replaces, and it dominates this kernel's runtime
    bits64 = np.zeros((n, 64), dtype=bool)
    with np.errstate(over="ignore"):
        for j in range(int(lb.max()) if n else 0):
            active = j < lb
            if not active.any():
                break
            # Eq: bit i set iff pattern[i] == text[j] (column compare + pack)
            np.equal(A, B[:, j][:, None], out=bits64[:, :L])
            Eq = np.packbits(bits64, axis=1, bitorder="little").view(np.uint64).ravel()
            Xv = Eq | VN
            Xh = (((Eq & VP) + VP) ^ VP) | Eq
            Ph = VN | ~(Xh | VP)
            Mh = VP & Xh
            delta = ((Ph & top) != 0).astype(np.int64) - ((Mh & top) != 0).astype(np.int64)
            score = np.where(active, score + delta, score)
            Ph = (Ph << one) | one
            Mh = Mh << one
            nVP = Mh | ~(Xv | Ph)
            nVN = Ph & Xv
            VP = np.where(active, nVP, VP)
            VN = np.where(active, nVN, VN)

    return score, la, lb


def packed_trigram_sets(C: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat sorted-unique packed character trigrams, offsets) per row of a
    padded (n, L) uint32 code matrix (see ``pad_codes_arrow``).

    Trigram identity is EXACT, not hashed: three code points (< 0x110000,
    21 bits each) pack losslessly into one uint64.  Per-row
    ``np.sort(axis=1)`` with a top-bit sentinel (real grams use 63 bits,
    so the sentinel never collides) — much cheaper than a global lexsort
    of the flat gram stream."""
    n, Lc = C.shape
    if Lc < 3:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    packed = (
        (C[:, :-2].astype(np.uint64) << np.uint64(42))
        | (C[:, 1:-1].astype(np.uint64) << np.uint64(21))
        | C[:, 2:].astype(np.uint64)
    )
    cnt = np.maximum(lens - 2, 0)
    pos = np.arange(Lc - 2, dtype=np.int64)[None, :]
    packed[pos >= cnt[:, None]] = np.uint64(0xFFFFFFFFFFFFFFFF)
    packed.sort(axis=1)  # valid grams ascend; sentinels sink to the end
    keep = pos < cnt[:, None]
    keep[:, 1:] &= packed[:, 1:] != packed[:, :-1]
    uniq_cnt = keep.sum(axis=1)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(uniq_cnt, out=offs[1:])
    return packed[keep], offs  # row-major bool index → per-row ascending


def set_overlap_u64_batch(
    val_a: np.ndarray,
    off_a: np.ndarray,
    val_b: np.ndarray,
    off_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact (intersection, union) SIZES over n pairs of SORTED-UNIQUE
    uint64 lists given as (flat values, offsets) — the integer-output
    sibling of :func:`jaccard_sorted_u64_batch` (same one-lexsort scheme),
    for report columns that must stay float-free for SQL-oracle parity."""
    n = len(off_a) - 1
    la = (off_a[1:] - off_a[:-1]).astype(np.int64)
    lb = (off_b[1:] - off_b[:-1]).astype(np.int64)
    inter = np.zeros(n, dtype=np.int64)
    total = int(la.sum() + lb.sum())
    if total == 0:
        return inter, la + lb
    pid = np.empty(total, dtype=np.int64)
    allv = np.empty(total, dtype=np.uint64)
    ta = int(la.sum())
    pid[:ta] = np.repeat(np.arange(n, dtype=np.int64), la)
    pid[ta:] = np.repeat(np.arange(n, dtype=np.int64), lb)
    allv[:ta] = _gather_flat(val_a, off_a, la)
    allv[ta:] = _gather_flat(val_b, off_b, lb)
    order = np.lexsort((allv, pid))
    sv = allv[order]
    sp = pid[order]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    np.add.at(inter, sp[1:][dup], 1)
    return inter, la + lb - inter


def ngram_jaccard_batch_arrow(arr_a, arr_b, max_len: int = 64) -> np.ndarray:
    """Vectorized character-trigram Jaccard over n Arrow string pairs —
    the batch form of :func:`ngram_jaccard` (n=3; bit-equal per pair).

    Trigram identity is EXACT, not hashed: three code points (< 0x110000,
    21 bits each) pack losslessly into one uint64, so set equality over
    packed trigrams equals string-trigram equality.  Per-row sorted-unique
    gram lists are built with one lexsort over the whole batch and fed to
    :func:`jaccard_sorted_u64_batch` — no per-pair Python.
    """
    import pyarrow.compute as pc

    n_pairs = len(arr_a)
    out = np.zeros(n_pairs, dtype=np.float32)
    if n_pairs == 0:
        return out
    L = max_len
    A, la = pad_codes_arrow(arr_a, L)
    B, lb = pad_codes_arrow(arr_b, L)

    va, oa = packed_trigram_sets(A, la)
    vb, ob = packed_trigram_sets(B, lb)
    out = jaccard_sorted_u64_batch(va, oa, vb, ob).astype(np.float32)
    # scalar conventions: s1 == s2 → 1.0 (covers equal short strings);
    # exactly one side gram-less → 0.0; both gram-less & unequal → 1.0
    ca, cb = np.maximum(la - 2, 0), np.maximum(lb - 2, 0)
    both_empty = (ca == 0) & (cb == 0)
    one_empty = (ca == 0) != (cb == 0)
    out[both_empty] = 1.0
    out[one_empty] = 0.0
    eq = pc.equal(
        pc.fill_null(_to_single(arr_a), ""), pc.fill_null(_to_single(arr_b), "")
    ).to_numpy(zero_copy_only=False)
    out[eq] = 1.0
    return out


def _to_single(arr):
    import pyarrow as pa

    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _jw_core(
    A: np.ndarray,
    la: np.ndarray,
    B: np.ndarray,
    lb: np.ndarray,
    prefix_weight: float = 0.1,
    max_prefix: int = 4,
    boost_threshold: float = 0.0,
    empty_empty: float = 1.0,
    out_dtype=np.float32,
    clamp_window: bool = False,
) -> np.ndarray:
    """Bit-parallel batched Jaro-Winkler over padded (n, L) uint32 code
    matrices — one uint64 position mask per (pair, character), the public
    technique rapidfuzz uses for ≤64-char strings, so the per-batch cost is
    O(L) numpy passes instead of O(n · L²) Python loops.

    Semantics match the scalar ``jaro_winkler`` exactly (including the
    classic ``match_dist = max(len)//2 - 1`` edge case for 1-char strings).
    """
    n, L = A.shape

    # alphabet: ASCII fast path (normalized text is [a-z0-9 ]) indexes PMB
    # directly by code point; rare non-ASCII batches fall back to np.unique.
    if A.max(initial=0) < 128 and B.max(initial=0) < 128:
        K = 128
        Aid = A.astype(np.int64)
        Bid = B.astype(np.int64)
    else:
        uniq, inv = np.unique(np.concatenate([A.ravel(), B.ravel()]), return_inverse=True)
        K = len(uniq)
        Aid = inv[: n * L].reshape(n, L)
        Bid = inv[n * L :].reshape(n, L)

    # PMB[i, c] = bitmask of positions j < lb[i] with B[i, j] == c.
    # Column-at-a-time scatter-OR: within one column each row index appears
    # once, so fancy ``|=`` is collision-free (and ~50× faster than
    # ``np.bitwise_or.at`` over the flattened matrix).
    PMB = np.zeros((n, K), dtype=np.uint64)
    rng_rows = np.arange(n)
    Lb_max = int(lb.max(initial=0))
    # per-(column, row) scatter bits precomputed in one broadcast; the loop
    # body is then a single fancy scatter-OR per column
    BITS = np.where(
        np.arange(Lb_max, dtype=np.int64)[:, None] < lb[None, :],
        _U64_ONE << np.arange(Lb_max, dtype=np.uint64)[:, None],
        np.uint64(0),
    )
    BidT = np.ascontiguousarray(Bid.T)
    for jcol in range(Lb_max):
        PMB[rng_rows, BidT[jcol]] |= BITS[jcol]

    md = np.maximum(la, lb) // 2 - 1  # may be -1 (empty window), per scalar
    if clamp_window:
        # SQL-parity mode: DuckDB's jaro keeps a one-slot window for 1-char
        # strings (verified: jaro('b','b') = 1.0 there, 0.0 classic)
        md = np.maximum(md, 0)

    Lmax = int(la.max(initial=0))
    # search-window masks for every iteration, precomputed OUTSIDE the loop:
    # the window depends only on (i, md) and md takes ≤ 33 distinct values,
    # so build a tiny (n_md, Lmax) table and gather per row; the ``i < la``
    # validity mask folds straight into the window
    md_vals, md_inv = np.unique(md, return_inverse=True)
    iv = np.arange(Lmax, dtype=np.int64)[None, :]
    lo = np.clip(iv - md_vals[:, None], 0, 64)
    hi = np.clip(iv + md_vals[:, None] + 1, 0, 64)
    Wtab = _mask_below(hi) & ~_mask_below(lo)
    Wtab = np.where(hi > lo, Wtab, np.uint64(0))  # (n_md, Lmax)
    WT = np.ascontiguousarray(Wtab[md_inv].T)  # (Lmax, n)
    if Lmax:
        WT &= np.where(
            np.arange(Lmax, dtype=np.int64)[:, None] < la[None, :], _U64_FULL, np.uint64(0)
        )

    usedB = np.zeros(n, dtype=np.uint64)
    gotT = np.zeros((Lmax, n), dtype=bool)  # did A-position i match?
    AidT = np.ascontiguousarray(Aid.T)  # contiguous per-iteration rows
    # in-place loop body over preallocated scratch — fresh numpy temporaries
    # per op would cost allocation + page-zero DRAM traffic every iteration,
    # which is what limits many-core scaling of this kernel
    rowbase = np.arange(n, dtype=np.intp) * K
    idx = np.empty(n, dtype=np.intp)
    cand = np.empty(n, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    bit = np.empty(n, dtype=np.uint64)
    PMB_flat = PMB.reshape(-1)
    ZERO = np.zeros(n, dtype=np.uint64)
    for i in range(Lmax):
        np.add(rowbase, AidT[i], out=idx)
        np.take(PMB_flat, idx, out=cand)
        np.invert(usedB, out=tmp)
        np.bitwise_and(tmp, WT[i], out=tmp)
        np.bitwise_and(cand, tmp, out=cand)
        np.subtract(ZERO, cand, out=tmp)  # two's complement: isolate low bit
        np.bitwise_and(cand, tmp, out=bit)
        np.bitwise_or(usedB, bit, out=usedB)
        np.not_equal(bit, 0, out=gotT[i])

    matched = gotT.T  # (n, Lmax)
    m = matched.sum(axis=1)

    # transpositions: matched A chars in i-order vs matched B chars in
    # ascending-j order.  The matched B positions are exactly the set bits
    # of usedB, and np.nonzero's row-major order yields both sequences in
    # the right order with matching per-row counts — no sort needed.
    r_idx, c_idx = np.nonzero(matched)  # i-ascending per row
    a_chars = Aid[r_idx, c_idx]
    matchedB = (usedB[:, None] >> np.arange(L, dtype=np.uint64)[None, :]) & _U64_ONE
    rb, jb = np.nonzero(matchedB)  # j-ascending per row
    b_chars = Bid[rb, jb]
    t = np.zeros(n, dtype=np.int64)
    np.add.at(t, r_idx, (a_chars != b_chars).astype(np.int64))
    t //= 2

    with np.errstate(divide="ignore", invalid="ignore"):
        mf = m.astype(np.float64)
        j = (mf / np.maximum(la, 1) + mf / np.maximum(lb, 1) + (mf - t) / np.maximum(mf, 1)) / 3.0
    j = np.where(m == 0, 0.0, j)
    j = np.where((la == 0) & (lb == 0), 1.0, j)

    # Winkler prefix boost — only where jaro exceeds ``boost_threshold``
    # (0.0 default boosts every nonzero jaro, matching the scalar / the
    # reference's textdistance; 0.7 with empty_empty=0.0 and
    # out_dtype=float64 is bit-parity with DuckDB jaro_winkler_similarity)
    P = min(max_prefix, L)
    eq = (Aid[:, :P] == Bid[:, :P]) & (np.arange(P)[None, :] < np.minimum(la, lb)[:, None])
    ell = np.cumprod(eq, axis=1).sum(axis=1)
    jw = np.where(j > boost_threshold, j + ell * prefix_weight * (1.0 - j), j)
    jw = np.where((la == 0) & (lb == 0), empty_empty, jw)
    return jw.astype(out_dtype)


def jaccard_sorted_u64_batch(
    val_a: np.ndarray,
    off_a: np.ndarray,
    val_b: np.ndarray,
    off_b: np.ndarray,
) -> np.ndarray:
    """Vectorized Jaccard over n pairs of SORTED-UNIQUE uint64 hash lists
    given as (flat values, offsets) — no per-pair Python loop.

    Intersection counting is one lexsort of the concatenated (pair_id,
    value) pairs of both sides: within a pair each side is unique, so a
    value that appears twice under the same pair id is an intersection hit.
    O(T log T) over the total token count of the batch, all in numpy.
    """
    n = len(off_a) - 1
    la = (off_a[1:] - off_a[:-1]).astype(np.int64)
    lb = (off_b[1:] - off_b[:-1]).astype(np.int64)
    out = np.zeros(n, dtype=np.float32)
    out[(la == 0) & (lb == 0)] = 1.0
    total = int(la.sum() + lb.sum())
    if total == 0:
        return out
    pid = np.empty(total, dtype=np.int64)
    allv = np.empty(total, dtype=np.uint64)
    ta = int(la.sum())
    pid[:ta] = np.repeat(np.arange(n, dtype=np.int64), la)
    pid[ta:] = np.repeat(np.arange(n, dtype=np.int64), lb)
    # offsets may address a larger flat buffer (e.g. list offsets of an
    # Arrow batch) — gather each side's segments into exact flat layout
    allv[:ta] = _gather_flat(val_a, off_a, la)
    allv[ta:] = _gather_flat(val_b, off_b, lb)
    order = np.lexsort((allv, pid))
    sv = allv[order]
    sp = pid[order]
    dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
    inter = np.zeros(n, dtype=np.int64)
    np.add.at(inter, sp[1:][dup], 1)
    denom = la + lb - inter
    live = denom > 0
    out[live] = (inter[live] / denom[live]).astype(np.float32)
    return out


def _gather_flat(vals: np.ndarray, offsets: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Gather the segments [offsets[i], offsets[i]+lens[i]) into one flat
    array (vectorized repeat+arange indexing)."""
    total = int(lens.sum())
    if total == 0:
        return vals[:0]
    starts = offsets[:-1].astype(np.int64)
    seg_start = np.cumsum(lens) - lens
    idx = np.repeat(starts, lens) + (np.arange(total, dtype=np.int64) - np.repeat(seg_start, lens))
    return vals[idx]


def gather_list_segments(
    vals: np.ndarray, offsets: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Select list-rows ``idx`` from a flat (values, offsets) list layout →
    (gathered flat values, new exact offsets).  Fully vectorized; the hot
    path for gated-subset kernels (scorer reads only pairs over the est
    floor)."""
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)[idx]
    new_off = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_off[1:])
    total = int(new_off[-1])
    if total == 0:
        return vals[:0], new_off
    flat = np.repeat(offsets[idx].astype(np.int64), lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(new_off[:-1], lens)
    )
    return vals[flat], new_off


def jaccard_sorted_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two SORTED-UNIQUE uint64 token-hash arrays.

    O(m log n) vectorized searchsorted — the per-pair hot path of the
    scorer; token sets are pre-hashed/pre-sorted once per conversation in
    feature extraction, not per pair.
    """
    na, nb = len(a), len(b)
    if na == 0 and nb == 0:
        return 1.0
    if na == 0 or nb == 0:
        return 0.0
    if na > nb:
        a, b, na, nb = b, a, nb, na
    idx = np.searchsorted(b, a)
    idx[idx == nb] = nb - 1
    inter = int(np.count_nonzero(b[idx] == a))
    return inter / (na + nb - inter)


def ngram_jaccard(s1: str, s2: str, n: int = 3) -> float:
    """Character n-gram Jaccard (dedup library kernel)."""
    if s1 == s2:
        return 1.0
    g1 = {s1[i : i + n] for i in range(max(0, len(s1) - n + 1))}
    g2 = {s2[i : i + n] for i in range(max(0, len(s2) - n + 1))}
    if not g1 and not g2:
        return 1.0
    if not g1 or not g2:
        return 0.0
    inter = len(g1 & g2)
    return inter / (len(g1) + len(g2) - inter)


def ts_gap_similarity(delta_seconds: np.ndarray, tau: float) -> np.ndarray:
    """Timestamp-gap feature: exp(-|Δ| / tau), vectorized, in (0, 1]."""
    return np.exp(-np.abs(delta_seconds) / tau)


def minmax_ratio(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min/max ratio similarity for counts (e.g. n_turns); 1.0 when both 0."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    out = np.ones_like(hi)
    nz = hi > 0
    out[nz] = lo[nz] / hi[nz]
    return out


def hamming_similarity_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of equal elements of two equal-length uint64 vectors —
    the MinHash Jaccard estimator."""
    if len(a) == 0:
        return 0.0
    return float(np.count_nonzero(a == b)) / len(a)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token-hash multiset (near-dup kernel)."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    if weights is None:
        v = bits.sum(axis=0) * 2 - len(token_hashes)
    else:
        v = (bits * weights[:, None]).sum(axis=0) * 2 - weights.sum()
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_hamming_sim(h1: int, h2: int) -> float:
    """1 - hamming(h1, h2)/64 for two 64-bit SimHashes."""
    x = np.uint64(h1) ^ np.uint64(h2)
    return 1.0 - bin(int(x)).count("1") / 64.0


def exp_decay(x: float, tau: float) -> float:
    return math.exp(-abs(x) / tau)


def _scalar_string_batch(scalar_fn):
    """Adapt a scalar string-similarity kernel to the batch-over-Arrow
    signature the scorer dispatches on.  These kernels are O(L²) per pair
    in Python — selectable for parity with the reference's dispatch table
    (compare_ldu_hw.py:66-76), but the vectorized Jaro-Winkler is the
    default hot path."""

    def run(arr_a, arr_b, max_len: int = 64) -> np.ndarray:
        la = arr_a.to_pylist()
        lb = arr_b.to_pylist()
        return np.array(
            [
                scalar_fn((x or "")[:max_len], (y or "")[:max_len])
                for x, y in zip(la, lb)
            ],
            dtype=np.float32,
        )

    return run


# §2.11 extension surface: the reference selects a similarity algorithm per
# field via a module-level dict (``compare_method``, compare_ldu_hw.py:66-76
# — textdistance ratcliff_obershelp for long fields, normalized Levenshtein
# for short ones).  ScoringConfig.string_kernels selects per feature from
# this registry; every kernel takes (arrow string array, arrow string
# array, max_len) and returns float32 scores in [0, 1].
STRING_KERNELS = {
    "jaro_winkler": jaro_winkler_batch_arrow,
    "ratcliff_obershelp": ratcliff_obershelp_batch_arrow,
    "levenshtein": levenshtein_batch_arrow,
    "ngram_jaccard": ngram_jaccard_batch_arrow,
    # scalar parity adapters kept selectable for A/B-ing the batched kernels
    "ratcliff_obershelp_scalar": _scalar_string_batch(ratcliff_obershelp),
    "levenshtein_scalar": _scalar_string_batch(levenshtein_normalized),
    "ngram_jaccard_scalar": _scalar_string_batch(ngram_jaccard),
}
