"""Memory-pressure proof: run the flagship dedup at a corpus size large
enough to stress the object store, and record peak process-tree RSS plus
object-store spill stats — evidence that the streaming executor keeps the
working set bounded (the 100 TB posture claim) instead of accumulating the
corpus in heap.

    python tools/memproof.py [--mult 64] [--cpus 32] [--sf-dir /root/testdata/sf0.1]

Prints ONE JSON line:
    {"metric": "flagship peak memory under load", "mult": M, "sec": S,
     "pairs_scored": P, "peak_rss_gib": R, "spill_bytes": B, ...}

Peak RSS is sampled (2 Hz) as the SUM over every live Ray process (raylet,
plasma, workers, driver) — shared pages counted per-process, so this
overstates true unique memory; staying far under the 128 GiB box on an
overstated metric is the stronger claim.  Spill stats come from Ray's
memory summary (object store spilled/restored bytes).
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


def _tree_rss_bytes() -> int:
    """Sum VmRSS over this process + every process with 'ray' in its
    cmdline (raylet, plasma store, ray:: workers, gcs)."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "ray" not in cmd and int(pid) != os.getpid():
                continue
            with open(f"/proc/{pid}/status") as f:
                m = re.search(r"VmRSS:\s+(\d+) kB", f.read())
            if m:
                total += int(m.group(1)) * 1024
        except (OSError, ValueError):
            continue
    return total


class _RssSampler(threading.Thread):
    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = 0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _tree_rss_bytes())
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()


def _spill_stats() -> dict:
    """Object-store spill/restore byte counts from Ray's memory summary."""
    out = {"spill_bytes": None, "restore_bytes": None}
    try:
        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", txt)
        if m:
            out["spill_bytes"] = int(m.group(1)) * (1 << 20)
        else:
            out["spill_bytes"] = 0
        m = re.search(r"Restored (\d+) MiB", txt)
        out["restore_bytes"] = int(m.group(1)) * (1 << 20) if m else 0
    except Exception:
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=float, default=64.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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
                "metric": "flagship peak process-tree RSS under load (streaming boundedness proof)",
                "value": round(sampler.peak / (1 << 30), 2),
                "unit": "GiB",
                "mult": args.mult,
                "sf": _sf_of(args.sf_dir),
                "num_cpus": args.cpus,
                "sec": round(wall, 1),
                "pairs_scored": flag["pairs_scored"],
                "pairs_per_s": round(flag["pairs_per_s"], 1),
                "rows_out": flag["rows_out"],
                "peak_rss_gib": round(sampler.peak / (1 << 30), 2),
                "spill_bytes": spill["spill_bytes"],
                "restore_bytes": spill["restore_bytes"],
            }
        )
    )


if __name__ == "__main__":
    main()
