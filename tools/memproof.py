"""Memory-pressure proof: run the flagship dedup at a corpus size large
enough to stress the object store, and record peak used memory plus
object-store spill stats — evidence that the streaming executor keeps the
working set bounded (the 100 TB posture claim) instead of accumulating the
corpus in heap.

    python tools/memproof.py [--mult 64] [--cpus 32] [--sf-dir /root/testdata/sf0.1]

Prints ONE JSON line:
    {"metric": "flagship peak ... memory", "mult": M, "sec": S,
     "pairs_scored": P, "peak_used_gib": R, "spill_bytes": B, ...}

Peak memory is sampled (2 Hz) as whole-box used memory
(MemTotal - MemAvailable, /proc/meminfo) — shared object-store pages
counted exactly once, and co-tenant noise only OVERSTATES the reading, so
staying under the bound is the conservative claim.  (A naive sum of
per-process RSS counts the plasma mmap once per mapping worker and can
exceed physical RAM ~1.5x — measured and discarded.)  Spill stats are
parsed from the session's raylet log (cumulative "Spilled N MiB" lines),
proving the streaming executor sheds pressure to disk instead of OOMing.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _box_used_bytes() -> int:
    """Whole-box used memory: MemTotal - MemAvailable (shared pages once)."""
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1]) * 1024
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1]) * 1024
    return max(0, total - avail)


class _RssSampler(threading.Thread):
    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = 0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _box_used_bytes())
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()


def _spill_stats() -> dict:
    """Cumulative object-store spill/restore from the CURRENT session's
    raylet log ("Spilled N MiB, K objects" lines are running totals)."""
    out = {"spill_bytes": 0, "spilled_objects": 0, "restore_bytes": 0}
    try:
        import glob

        logs = sorted(
            glob.glob("/tmp/ray/*/session_*/logs/raylet.out"),
            key=os.path.getmtime,
        )
        if not logs:
            return out
        with open(logs[-1], errors="replace") as f:
            txt = f.read()
        for m in re.finditer(r"Spilled (\d+) MiB, (\d+) objects", txt):
            out["spill_bytes"] = max(out["spill_bytes"], int(m.group(1)) << 20)
            out["spilled_objects"] = max(out["spilled_objects"], int(m.group(2)))
        for m in re.finditer(r"Restored (\d+) MiB", txt):
            out["restore_bytes"] = max(out["restore_bytes"], int(m.group(1)) << 20)
    except Exception:
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=64.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--object-store-gib",
        type=float,
        default=24.0,
        help="explicit object-store budget; the boundedness claim is that "
        "the run completes INSIDE this budget by spilling, so a smaller "
        "store is the stronger proof",
    )
    args = ap.parse_args()

    real_stdout = sys.stdout
    sys.stdout = sys.stderr  # keep the one-JSON-line contract

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
        object_store_memory=int(args.object_store_gib * (1 << 30)),
    )
    os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")

    from bench import run_flagship, _sf_of

    sampler = _RssSampler()
    sampler.start()
    t0 = time.time()
    try:
        flag = run_flagship(args.sf_dir, args.mult)
    finally:
        sampler.stop()
    wall = time.time() - t0
    spill = _spill_stats()
    ray.shutdown()

    sys.stdout = real_stdout
    print(
        json.dumps(
            {
                "metric": "flagship peak whole-box used memory under load (streaming boundedness proof)",
                "value": round(sampler.peak / (1 << 30), 2),
                "unit": "GiB",
                "mult": args.mult,
                "sf": _sf_of(args.sf_dir),
                "num_cpus": args.cpus,
                "object_store_gib": args.object_store_gib,
                "sec": round(wall, 1),
                "pairs_scored": flag["pairs_scored"],
                "pairs_per_s": round(flag["pairs_per_s"], 1),
                "rows_out": flag["rows_out"],
                "peak_used_gib": round(sampler.peak / (1 << 30), 2),
                "spill_bytes": spill["spill_bytes"],
                "spilled_objects": spill["spilled_objects"],
                "restore_bytes": spill["restore_bytes"],
            }
        )
    )


if __name__ == "__main__":
    main()
