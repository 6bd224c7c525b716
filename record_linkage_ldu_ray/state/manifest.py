"""Per-stage Parquet checkpoints with manifests (lineage + counters).

The reference checkpoints each script stage as a pickle and re-loads it in
the next script (pre_processing.py:271-275 → compare_ldu_hw.py:8-9 →
main_ldu_hw.py:10-14) — a stage can be re-run without recomputing earlier
ones.  This module keeps that property and hardens it per the north rule:

- each stage writes ``<workdir>/<stage>/part-*.parquet`` plus a
  ``manifest.json`` recording the stage name, the pipeline config hash,
  the input lineage (upstream stage dirs), and per-stage counters
  (row count, file count, custom metrics);
- writes are atomic (temp dir → rename), so a killed run never leaves a
  half-valid checkpoint;
- a rerun with the same config hash + lineage skips the stage and streams
  from its Parquet instead (idempotent resume).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Callable

import pyarrow.parquet as pq
import ray.data


MANIFEST = "_manifest.json"


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def load_manifest(stage_dir: str) -> dict | None:
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def stage_is_complete(stage_dir: str, config_hash: str, lineage: list[str]) -> bool:
    m = load_manifest(stage_dir)
    if not (
        m is not None
        and m.get("complete", False)
        and m.get("config_hash") == config_hash
        and m.get("lineage") == sorted(lineage)
    ):
        return False
    # verify every recorded partition file still exists with its recorded
    # row count (footer-only read) — a checkpoint dir that lost files after
    # its manifest was written must rebuild, not resume half-empty
    parts = m.get("counters", {}).get("partitions")
    if parts is not None:
        for name, n in parts.items():
            p = os.path.join(stage_dir, name)
            try:
                if pq.ParquetFile(p).metadata.num_rows != n:
                    return False
            except Exception:
                return False
    return True


def _dir_counters(stage_dir: str) -> dict:
    """Row/file counters straight from parquet footers (no data scan) —
    per-partition rows recorded so a resumed run can verify each output
    partition individually (north-rule per-partition lineage)."""
    rows = 0
    files = 0
    partitions: dict[str, int] = {}
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        files += 1
        n = pq.ParquetFile(os.path.join(stage_dir, name)).metadata.num_rows
        partitions[name] = n
        rows += n
    return {"rows": rows, "files": files, "partitions": partitions}


def checkpoint_stage(
    name: str,
    workdir: str,
    config_hash: str,
    lineage: list[str],
    build: Callable[[], "ray.data.Dataset"],
    extra_counters: dict | None = None,
    force: bool = False,
) -> tuple["ray.data.Dataset", dict]:
    """Run (or resume) one checkpointed stage.

    Returns ``(dataset_streaming_from_checkpoint, manifest_dict)``.  If a
    complete checkpoint with matching config hash + lineage exists, the
    build function is never called.
    """
    stage_dir = os.path.join(workdir, name)
    if not force and stage_is_complete(stage_dir, config_hash, lineage):
        m = load_manifest(stage_dir)
        m["resumed"] = True
        return ray.data.read_parquet(stage_dir, file_extensions=["parquet"]), m

    tmp_dir = os.path.join(workdir, f".{name}.tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp_dir, exist_ok=True)
    t0 = time.monotonic()
    try:
        ds = build()
        ds.write_parquet(tmp_dir)
        counters = _dir_counters(tmp_dir)
        counters["wall_sec"] = round(time.monotonic() - t0, 3)
        if extra_counters:
            counters.update(extra_counters)
        manifest = {
            "stage": name,
            "config_hash": config_hash,
            "lineage": sorted(lineage),
            "counters": counters,
            "complete": True,
            "resumed": False,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(_manifest_path(tmp_dir), "w") as f:
            json.dump(manifest, f, indent=1)
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        os.replace(tmp_dir, stage_dir)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    return ray.data.read_parquet(stage_dir, file_extensions=["parquet"]), manifest
