"""Configuration dataclasses — the engine's user-extension surface.

The reference exposes its knobs as module-level dicts (stopword lists
``pre_processing.py:14-29``, field map ``compare_ldu_hw.py:27-48``,
algorithm dispatch ``compare_ldu_hw.py:66-76``, thresholds/multipliers
``main_ldu_hw.py:340-363``, match masks ``main_ldu_hw.py:408-420`` /
``main_ldu_ldu.py:263-274``).  Here every one of those is a serializable
dataclass so a run manifest can record the exact configuration (config
hash → idempotent stage resume).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


# NLTK English stopword list (public; the reference builds its set from
# nltk.corpus.stopwords plus '&', pre_processing.py:14-29).  Hard-coded so
# the sealed container needs no corpus download.
ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    """a about above after again against all am an and any are aren as at be
    because been before being below between both but by can cannot could
    couldn d did didn do does doesn doing don down during each few for from
    further had hadn has hasn have haven having he her here hers herself him
    himself his how i if in into is isn it its itself just ll m ma me
    mightn more most mustn my myself needn no nor not now o of off on once
    only or other our ours ourselves out over own re s same shan she should
    shouldn so some such t than that the their theirs them themselves then
    there these they this those through to too under until up ve very was
    wasn we were weren what when where which while who whom why will with
    won wouldn y you your yours yourself yourselves &""".split()
)


@dataclass(frozen=True)
class NormalizerConfig:
    """Text normalization knobs (analog of pre_processing.py:48-79).

    ``normalize_text``: lower-case → strip non-alphanumeric → tokenize →
    stopword-filter → (optionally) sort tokens → join.  The token sort makes
    comparison order-insensitive (pre_processing.py:53); at conversation
    level the same property is what absorbs whole-turn reordering.
    """

    stopwords: frozenset[str] = ENGLISH_STOPWORDS
    sort_tokens: bool = True
    lowercase: bool = True
    # tokens shorter than this are kept (reference keeps all post-stopword
    # tokens; min_token_len=1 reproduces that)
    min_token_len: int = 1


@dataclass(frozen=True)
class MinHashConfig:
    """MinHash sketch of the conversation token set.

    Deterministic: fixed seed → fixed permutation parameters, so N-CPU and
    4N-CPU runs are byte-identical (SURVEY §7 determinism requirement).
    """

    num_perm: int = 64
    seed: int = 0x5EED_1D  # fixed; never RNG at runtime


@dataclass(frozen=True)
class BlockingConfig:
    """LSH-band + prefix/phonetic blocking keys (SURVEY §2.4 J1/J2 replacement).

    ``bands * rows_per_band`` must equal ``MinHashConfig.num_perm``.
    ``prefix`` key = phonetic code of the alphabetically-first token of the
    normalized conversation text — the "reference blocking key" at which the
    F1 gate is evaluated (analog of the reference's 'only matching
    countries' advice, README.md:245).
    ``max_block_records``: blocks larger than this are salted (triangle
    scheme) so within-block pair enumeration stays bounded; counts logged.
    """

    bands: int = 16
    rows_per_band: int = 4
    use_prefix_key: bool = True
    # "prefix4": exact 4-char prefix of the alphabetically-first token
    # (discriminative); "soundex": phonetic code (name-like data — beware:
    # soundex drops digits, so synthetic tokens a000/a001 collapse)
    prefix_key_kind: str = "prefix4"
    max_block_records: int = 256
    max_salt: int = 16  # upper bound on sub-block fan-out per hot key
    # blocks larger than this are DROPPED, not salted: salting preserves
    # every pair (load balance only) — a non-discriminative key (the
    # reference's country="US") would still cost O(n²) pairs.  Recall for
    # dropped blocks falls back to the LSH bands.  None disables.
    drop_block_records: int | None = 4096


@dataclass(frozen=True)
class ScoringConfig:
    """Weighted-threshold score combination (main_ldu_hw.py:330-382 shape).

    ``score = Σ_f value_f * multiplier_f * (value_f >= threshold_f)`` —
    the reference's exact rule shape, over the transcript feature set.
    Missing feature → similarity 0 (README.md:169).
    """

    thresholds: dict[str, float] = field(
        default_factory=lambda: {
            "jac_text": 0.5,
            "jw_text": 0.5,
            "jw_role": 0.5,
            "jw_tool": 0.25,
            "ts_sim": 0.25,
            "nturns_sim": 0.5,
            "minhash_est": 0.5,
        }
    )
    multipliers: dict[str, float] = field(
        default_factory=lambda: {
            "jac_text": 2.0,
            "jw_text": 1.5,
            "jw_role": 0.5,
            "jw_tool": 0.5,
            "ts_sim": 0.25,
            "nturns_sim": 0.25,
            "minhash_est": 1.0,
        }
    )
    # Jaro-Winkler on very long concatenated text is O(L^2); cap the compared
    # prefix (the normalized text is token-sorted so prefixes are stable).
    # 64 = the bit-parallel batch kernel's word width (functions/sim.py).
    jw_text_max_chars: int = 64
    # per-feature string-similarity kernel (functions/sim.py STRING_KERNELS
    # registry) — the analog of the reference's ``compare_method`` dispatch
    # dict (compare_ldu_hw.py:66-76: ratcliff_obershelp for long fields,
    # normalized Levenshtein for short ones).
    string_kernels: dict[str, str] = field(
        default_factory=lambda: {
            "jw_text": "jaro_winkler",
            "jw_role": "jaro_winkler",
            "jw_tool": "jaro_winkler",
        }
    )
    # per-feature comparison map: LEFT column + the right-side VARIANT
    # columns folded by elementwise max — the reference's many-to-one field
    # map (compare_ldu_hw.py:27-48) with its variant max-fold
    # (phone = max(phone, phone2, phone3), compare_ldu_hw.py:51-59).
    compare_map: dict[str, tuple[str, ...]] = field(
        default_factory=lambda: {
            "jw_text": ("text_prefix",),
            "jw_role": ("role_seq",),
            "jw_tool": ("tool_seq",),
        }
    )
    # MinHash-estimate floor below which no decision mask can fire (score
    # bound < score_mid and jac bound < jac_text_mid): pairs under it skip
    # the expensive kernels AND travel without their heavy feature payload
    # (text/roles/token hashes nulled at pair enumeration).  0 disables.
    est_floor: float = 0.15
    # timestamp-gap feature: ts_sim = exp(-|Δts_min| / tau)
    ts_tau_seconds: float = 7 * 24 * 3600.0


@dataclass(frozen=True)
class RuleConfig:
    """Disjunctive match masks (main_ldu_ldu.py:263-274 shape, self-dedup).

    A pair is a match iff at least one mask holds.  Mask cardinalities are
    emitted as counters (A5).
    """

    # mask 1: combined score alone
    score_high: float = 4.6
    # mask 2: decent score ∧ text matches ∧ a sequence feature corroborates
    score_mid: float = 2.6
    jac_text_mid: float = 0.45
    seq_corroborate: float = 0.8  # jw_role, jw_tool or jw_text
    # mask 3: decent score ∧ all "context" features strong
    ctx_ts: float = 0.9
    ctx_nturns: float = 0.9
    ctx_jw_text: float = 0.9
    # mask 4: perfect text match
    # (jac_text == 1) | (jw_text == 1)


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end dedup pipeline configuration + physical knobs."""

    normalizer: NormalizerConfig = field(default_factory=NormalizerConfig)
    minhash: MinHashConfig = field(default_factory=MinHashConfig)
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    rules: RuleConfig = field(default_factory=RuleConfig)

    # physical execution knobs (NOT part of the config hash: results are
    # identical at any parallelism, so checkpoints must survive cluster-
    # size changes — the N-node run resumes on the 4N-node cluster)
    feature_partitions: int = 64  # hash partitions for per-conv aggregation
    # pair-stage partitions: sized so the scoring stage's tail stays short
    # under skew and external load — 128 × ~quarter-core tasks measured
    # 1.7× faster than 64 on a contended 16-CPU node, and a big cluster
    # clamps to 4 tasks/core anyway (runtime.effective_partitions)
    pair_partitions: int = 128
    # actor pool (min, max); None → auto-size max to the cluster CPU count
    scorer_concurrency: tuple[int, int] | None = None
    # scorer batch: the JW kernel's big per-batch arrays (PMB n×128 u64,
    # BITS/WT n×Lmax u64) must stay cache-resident; 1–2k rows measured
    # 35–40% faster than 4096 single-threaded (min-of-5, quiet window) and
    # the margin grows when 16 workers share L3 — per-row cost triples by
    # 16k rows where the working set spills to DRAM
    scorer_batch_size: int = 2048
    # pair-stage streaming chunk: enumeration yields the 1-3 KB wide pair
    # payload in slices of this many pairs (≤ ~0.2 GiB each), so a
    # pair-heavy partition never materializes its full wide pair table in
    # one task heap — the per-task bound that keeps 64× corpora from
    # OOMing at full concurrency (measured at --mult 64 / 32 CPUs:
    # whole-box peak 103 GiB at 131072, 94 GiB at 65536, same throughput)
    pair_chunk_pairs: int = 65536
    normalize_batch_size: int = 65536
    max_unionfind_rounds: int = 12
    # connected-components driver fast path: after the local pre-contraction
    # (≤ one star edge per non-root node), a star set at or below this size
    # finishes with ONE driver union-find + a broadcast label join instead
    # of iterated distributed rounds — identical labels (min conv_id per
    # component), ~3 fewer exchanges.  Physical knob: results are
    # path-independent, so it stays out of the semantic config hash.
    cc_driver_max_edges: int = 2_000_000

    _SEMANTIC_FIELDS = ("normalizer", "minhash", "blocking", "scoring", "rules")

    def effective_est_floor(self) -> float:
        """The est-floor gate is only sound if a pair below the floor can
        never fire a decision mask (its gated features jac/jw are forced 0).
        Validate that invariant against the ACTUAL rule thresholds instead
        of trusting the knob: if a user-supplied rule config could fire on
        cheap features alone, the gate silently zeroes features the scorer
        can no longer recover — so fall back to floor 0 (no gating).
        """
        sc, r = self.scoring, self.rules
        floor = sc.est_floor
        if floor <= 0.0:
            return 0.0
        # max achievable combined score for a gated-out pair: only the
        # cheap features contribute (ts_sim/nturns_sim ≤ 1; minhash_est <
        # floor by definition of the gate)
        bound = 0.0
        for f in ("ts_sim", "nturns_sim"):
            if sc.thresholds.get(f, 0.0) <= 1.0:
                bound += sc.multipliers.get(f, 0.0)
        if floor > sc.thresholds.get("minhash_est", 0.0):
            bound += sc.multipliers.get("minhash_est", 0.0) * floor
        m1_safe = bound < r.score_high
        m2_safe = r.jac_text_mid > 0.0 or bound < r.score_mid
        m3_safe = r.ctx_jw_text > 0.0 or bound < r.score_mid
        # mask 4 (jac==1 | jw==1) can never fire on zeroed features
        return floor if (m1_safe and m2_safe and m3_safe) else 0.0

    def config_hash(self) -> str:
        """Stable hash of the SEMANTIC config (normalizer/minhash/blocking/
        scoring/rules), recorded in stage manifests.  Physical knobs
        (partition counts, concurrency, batch sizes) don't change results
        and are excluded — resume stays valid across cluster sizes."""
        d = asdict(self)
        blob = json.dumps(
            _to_jsonable({k: d[k] for k in self._SEMANTIC_FIELDS}), sort_keys=True
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _to_jsonable(v) for k, v in sorted(obj.items(), key=lambda kv: str(kv[0]))}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, frozenset):
        return sorted(obj)
    return obj
