"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Grafts the reference's labeled customer-linkage corpus (LDU/HW with the
``HW Account`` ground-truth column, README.md:28-82, main_ldu_hw.py:207-208)
onto the transcript payload: base conversations, perturbed duplicate copies
(perturbations chosen to be exactly what the reference's normalizers absorb,
pre_processing.py:48-79), hard negatives sharing a blocking key, and one hot
block to exercise salting.

Everything derives from ``numpy.random.default_rng(seed)`` — byte-for-byte
reproducible from (seed, scale); no external data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "zu",
]
_TOOLS = ["search", "calculator", "browser", "python", "lookup", "weather"]
_STOP_INSERTS = ["the", "and", "of", "to", "a", "is", "in", "it"]
_PUNCT = [",", ".", "!", "?", ";", ":"]

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


@dataclass(frozen=True)
class FixtureSpec:
    n_families: int = 120
    seed: int = 42
    dup_fraction: float = 0.45
    hardneg_fraction: float = 0.30
    min_turns: int = 3
    max_turns: int = 24
    fam_vocab_size: int = 30
    hot_block: int = 0  # extra singleton convs sharing anchor "a000"
    # hot-block convs are perturbed near-duplicates of ONE base conversation
    # (instead of unrelated singletons): every hot pair then clears the
    # MinHash-estimate gate, making the hot block a SCORING-dominated load —
    # the corpus used to measure candidate-pair scoring throughput
    hot_dup: bool = False

    @property
    def n_anchors(self) -> int:
        return max(4, self.n_families // 8)


def _make_vocab(rng: np.random.Generator, size: int = 400) -> list[str]:
    vocab = set()
    while len(vocab) < size:
        k = rng.integers(2, 5)
        w = "".join(rng.choice(_SYLLABLES) for _ in range(k))
        vocab.add(w)
    return sorted(vocab)


def _typo(word: str, rng: np.random.Generator) -> str:
    if len(word) < 3:
        return word
    i = int(rng.integers(0, len(word)))
    c = chr(ord("b") + int(rng.integers(0, 24)))
    op = int(rng.integers(0, 3))
    if op == 0:  # substitute
        return word[:i] + c + word[i + 1 :]
    if op == 1:  # insert
        return word[:i] + c + word[i:]
    return word[:i] + word[i + 1 :]  # delete


class _Conv:
    __slots__ = ("conv_id", "turns", "roles", "tools", "epoch_off_s", "family")

    def __init__(self, conv_id, turns, roles, tools, epoch_off_s, family):
        self.conv_id = conv_id
        self.turns = turns  # list[list[str]] tokens per turn
        self.roles = roles
        self.tools = tools
        self.epoch_off_s = epoch_off_s
        self.family = family


def _base_conv(fam: int, conv_id: str, anchor: str, fam_vocab: np.ndarray,
               rng: np.random.Generator, spec: FixtureSpec) -> _Conv:
    n_turns = int(rng.integers(spec.min_turns, spec.max_turns + 1))
    turns, roles, tools = [], [], []
    for t in range(n_turns):
        n_tok = int(rng.integers(4, 13))
        toks = list(rng.choice(fam_vocab, n_tok, replace=True))
        if t == 0:
            toks.insert(0, anchor)  # anchor sorts first → shared prefix key
        turns.append(toks)
        if rng.random() < 0.15:
            roles.append("tool")
            tools.append(str(rng.choice(_TOOLS)))
        else:
            roles.append("user" if t % 2 == 0 else "assistant")
            tools.append(None)
    epoch_off = float(fam) * 3600.0 + float(rng.integers(0, 3600))
    return _Conv(conv_id, turns, roles, tools, epoch_off, fam)


def _perturb(base: _Conv, conv_id: str, rng: np.random.Generator) -> _Conv:
    turns = [list(t) for t in base.turns]
    roles = list(base.roles)
    tools = list(base.tools)

    # typos on up to 5% of non-anchor tokens (anchor = first token of turn 0)
    for ti, toks in enumerate(turns):
        for wi in range(len(toks)):
            if ti == 0 and wi == 0:
                continue
            if rng.random() < 0.05:
                toks[wi] = _typo(toks[wi], rng)
    # case changes + punctuation insertion + stopword insertion
    for toks in turns:
        for wi in range(len(toks)):
            r = rng.random()
            if r < 0.10:
                toks[wi] = toks[wi].upper()
            elif r < 0.18:
                toks[wi] = toks[wi] + str(rng.choice(_PUNCT))
        if rng.random() < 0.4:
            pos = int(rng.integers(0, len(toks) + 1))
            toks.insert(pos, str(rng.choice(_STOP_INSERTS)))
    # within-turn token shuffle
    for toks in turns:
        if rng.random() < 0.3 and len(toks) > 2:
            # shuffle tail (keep anchor at front of turn 0 irrelevant — global
            # token sort absorbs order anyway)
            perm = rng.permutation(len(toks) - 1) + 1
            turns_sh = [toks[0]] + [toks[i] for i in perm]
            toks[:] = turns_sh
    # whole-turn reorder: swap two adjacent turns
    if len(turns) > 3 and rng.random() < 0.4:
        i = int(rng.integers(1, len(turns) - 1))
        turns[i], turns[i + 1] = turns[i + 1], turns[i]
        roles[i], roles[i + 1] = roles[i + 1], roles[i]
        tools[i], tools[i + 1] = tools[i + 1], tools[i]
    # dropped or extra turn
    r = rng.random()
    if r < 0.15 and len(turns) > 4:
        i = int(rng.integers(1, len(turns)))
        del turns[i], roles[i], tools[i]
    elif r < 0.25:
        n_tok = int(rng.integers(3, 8))
        turns.append([str(w) for w in
                      rng.choice(np.array([t for ts in base.turns for t in ts]), n_tok)])
        roles.append("assistant")
        tools.append(None)
    # tool nulls dropped/changed
    for i in range(len(tools)):
        if tools[i] is not None and rng.random() < 0.2:
            tools[i] = None
    # timestamp shift up to ~12h
    off = base.epoch_off_s + float(rng.integers(-43200, 43200))
    return _Conv(conv_id, turns, roles, tools, off, base.family)


def _hard_negative(fam: int, conv_id: str, anchor: str, fam_vocab: np.ndarray,
                   other_vocab: np.ndarray, rng: np.random.Generator,
                   spec: FixtureSpec) -> _Conv:
    """Shares the anchor (co-blocked at the prefix key) and ~40% of the
    family vocabulary, but a genuinely different conversation — the
    false-positive-averse design of the reference (README.md:25-26)."""
    n_turns = int(rng.integers(spec.min_turns, spec.max_turns + 1))
    mix = np.concatenate([rng.choice(fam_vocab, spec.fam_vocab_size // 2),
                          rng.choice(other_vocab, spec.fam_vocab_size)])
    turns, roles, tools = [], [], []
    for t in range(n_turns):
        n_tok = int(rng.integers(4, 13))
        toks = list(rng.choice(mix, n_tok, replace=True))
        if t == 0:
            toks.insert(0, anchor)
        turns.append(toks)
        roles.append("user" if t % 2 == 0 else "assistant")
        tools.append(None)
    off = float(fam) * 3600.0 + float(rng.integers(0, 7 * 86400))
    return _Conv(conv_id, turns, roles, tools, off, -1 - fam * 100 - int(rng.integers(0, 100)))


def generate(spec: FixtureSpec) -> dict[str, pa.Table]:
    """Build the three fixture tables: transcripts, labeled_pairs,
    expected_clusters."""
    rng = np.random.default_rng(spec.seed)
    vocab = np.array(_make_vocab(rng))
    convs: list[_Conv] = []
    families: dict[int, list[str]] = {}
    neg_by_anchor: dict[str, list[tuple[str, int]]] = {}

    for fam in range(spec.n_families):
        anchor = f"a{fam % spec.n_anchors:03d}"
        fam_vocab = rng.choice(vocab, spec.fam_vocab_size, replace=False)
        base = _base_conv(fam, f"conv-{fam:06d}-0", anchor, fam_vocab, rng, spec)
        convs.append(base)
        members = [base.conv_id]
        if rng.random() < spec.dup_fraction:
            k = int(rng.integers(1, 4))
            for c in range(1, k + 1):
                dup = _perturb(base, f"conv-{fam:06d}-{c}", rng)
                convs.append(dup)
                members.append(dup.conv_id)
        families[fam] = members
        if rng.random() < spec.hardneg_fraction:
            for j in range(int(rng.integers(1, 3))):
                hn = _hard_negative(fam, f"conv-{fam:06d}-n{j}", anchor,
                                    fam_vocab, vocab, rng, spec)
                convs.append(hn)
                neg_by_anchor.setdefault(anchor, []).append((hn.conv_id, fam))

    # hot block: many convs sharing anchor "a000" — unrelated singletons by
    # default, or (hot_dup) near-duplicates of one base conversation
    if spec.hot_block and spec.hot_dup:
        fam_vocab = rng.choice(vocab, spec.fam_vocab_size, replace=False)
        hot_base = _base_conv(10_000_000, "conv-hot-000000", "a000",
                              fam_vocab, rng, spec)
        convs.append(hot_base)
        for h in range(1, spec.hot_block):
            convs.append(_perturb(hot_base, f"conv-hot-{h:06d}", rng))
    else:
        for h in range(spec.hot_block):
            fam_vocab = rng.choice(vocab, spec.fam_vocab_size, replace=False)
            convs.append(_base_conv(10_000_000 + h, f"conv-hot-{h:06d}", "a000",
                                    fam_vocab, rng, spec))

    # ---- transcripts table
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for cv in convs:
        t = 0.0
        for i, toks in enumerate(cv.turns):
            conv_ids.append(cv.conv_id)
            turn_idxs.append(i)
            roles.append(cv.roles[i])
            texts.append(" ".join(toks))
            tools.append(cv.tools[i])
            t += float(rng.integers(5, 120))
            tss.append(EPOCH + np.timedelta64(int((cv.epoch_off_s + t) * 1e6), "us"))
    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )

    # ---- labeled pairs: all positives within family + co-blocked negatives
    pa_a, pa_b, is_match = [], [], []

    def add_pair(x: str, y: str, m: bool):
        a, b = (x, y) if x < y else (y, x)
        pa_a.append(a)
        pa_b.append(b)
        is_match.append(m)

    anchor_members: dict[str, list[str]] = {}
    for fam, members in families.items():
        anchor = f"a{fam % spec.n_anchors:03d}"
        anchor_members.setdefault(anchor, []).extend(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                add_pair(members[i], members[j], True)
    # negatives: family member × hard negative (same anchor) — hard;
    # member × member of another family on the same anchor — easy.
    for anchor, negs in neg_by_anchor.items():
        for (neg_id, fam) in negs:
            for m in families[fam][:2]:
                add_pair(m, neg_id, False)
    for anchor, mem in anchor_members.items():
        fams = sorted({m.split("-")[1] for m in mem})
        if len(fams) >= 2:
            a0 = [m for m in mem if m.split("-")[1] == fams[0]][0]
            b0 = [m for m in mem if m.split("-")[1] == fams[1]][0]
            add_pair(a0, b0, False)
    labeled_pairs = pa.table(
        {
            "conv_id_a": pa.array(pa_a, pa.string()),
            "conv_id_b": pa.array(pa_b, pa.string()),
            "is_match": pa.array(is_match, pa.bool_()),
        }
    )

    # ---- expected clusters: connected components over positives = families
    c_ids, cl_ids = [], []
    for cv in convs:
        c_ids.append(cv.conv_id)
    fam_min = {fam: min(m) for fam, m in families.items()}
    member_to_fam = {m: fam for fam, ms in families.items() for m in ms}
    for cid in c_ids:
        fam = member_to_fam.get(cid)
        cl_ids.append(fam_min[fam] if fam is not None else cid)
    expected_clusters = pa.table(
        {
            "conv_id": pa.array(c_ids, pa.string()),
            "cluster_id": pa.array(cl_ids, pa.string()),
        }
    )
    return {
        "transcripts": transcripts,
        "labeled_pairs": labeled_pairs,
        "expected_clusters": expected_clusters,
    }


def write_fixture(spec: FixtureSpec, out_dir: str) -> dict[str, str]:
    """Write the fixture tables as Parquet; returns name → path.  Idempotent
    (same spec → same bytes modulo parquet metadata)."""
    os.makedirs(out_dir, exist_ok=True)
    tables = generate(spec)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def cached_fixture(spec: FixtureSpec, cache_root: str = "/tmp/rl_fixtures") -> str:
    """Generate-once cache keyed by the spec (used by bench + tests)."""
    key = (
        f"fam{spec.n_families}_seed{spec.seed}_hot{spec.hot_block}"
        f"{'d' if spec.hot_dup else ''}_t{spec.min_turns}-{spec.max_turns}"
    )
    d = os.path.join(cache_root, key)
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        write_fixture(spec, d)
        with open(marker, "w") as f:
            f.write("ok")
    return d
