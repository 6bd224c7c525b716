"""Quiet-window host-contention probe.

Times the engine's real batched Jaro-Winkler kernel
(`functions/sim.py:jaro_winkler_batch_arrow`) single-process on fixed
synthetic strings, min-of-5 — zero Ray, zero I/O, so run-to-run movement
measures HOST CPU contention (co-tenant load / steal), not engine changes.

Used to time scaling artifacts (BASELINE.md runs D–M): identical Ray legs
on this shared box swing ±2-3× with external load, so heavy measurements
are launched when this probe reads near its observed session maximum.
Observed range on this box: ~11-17k pairs/s per core under the 2026-08-19
co-tenant load; 102-107k pairs/s in the quiet 2026-08-20 windows runs J-M
were launched in (same code — the spread IS the documented tenant noise).

Usage:  python tools/probe_kernel.py  [N_PAIRS]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, ".")
from record_linkage_ldu_ray.functions.sim import jaro_winkler_batch_arrow

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
]


def probe(n: int = 200_000) -> float:
    """Best-of-5 single-core JW throughput (pairs/s) on a fixed corpus."""
    rng = np.random.RandomState(7)
    a = pa.array([" ".join(rng.choice(_WORDS, 8)) for _ in range(n)])
    b = pa.array([" ".join(rng.choice(_WORDS, 8)) for _ in range(n)])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jaro_winkler_batch_arrow(a, b)
        best = min(best, time.perf_counter() - t0)
    return n / best


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    print(f"{probe(n) / 1000:.1f}k JW-pairs/s single-core (min-of-5)")
