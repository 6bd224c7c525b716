"""``ray job submit``-able entry points.

The library never calls ``ray.init()`` (the driver or test session owns
the Ray lifecycle); this CLI is the exception — it is the process a
cluster operator submits:

    ray job submit --working-dir . -- \\
        python -m record_linkage_ldu_ray dedup \\
        --input s3://corpus/transcripts/ --workdir s3://runs/dedup-42 \\
        --out s3://runs/dedup-42/clusters

Subcommands mirror the reference repo's two runnable flows (its
``main.py`` dedup script and the LDU↔HW ``compare_ldu_hw.py`` link flow)
plus a generic runner for every registered query pipeline:

  dedup   flagship transcript dedup → clusters/matches/scores parquet,
          per-stage checkpoints + lineage in --workdir (resumable: rerun
          the same command after a failure and finished stages are
          skipped via the stage manifests)
  link    bipartite linkage of two transcript corpora → matches/groups
  query   run any ``__ray_entry__.queries()`` pipeline over an sf dir
          and write its result to parquet

Output layout is partitioned parquet (one file per output block), never
one giant file, so failed runs re-submit cheaply.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(cpus: int | None) -> bool:
    """Init Ray if this process owns it; returns whether we own shutdown
    (an embedding test session keeps its own Ray alive)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
    if cpus is not None:
        kwargs["num_cpus"] = cpus
    # under `ray job submit` RAY_ADDRESS points at the cluster; local
    # runs fall back to a fresh local instance
    ray.init(**kwargs)
    return True


def _write(ds, path: str) -> int:
    # write FIRST (one streaming execution of the lineage), then derive the
    # row count from the written Parquet footers — a count() before the
    # write would execute the whole non-materialized DAG twice
    ds.write_parquet(path)
    return _parquet_rows(path)


def _parquet_rows(path: str) -> int:
    """Row count of a written Parquet directory from file footers only.
    An empty dataset writes no files (Ray skips the sink entirely), so a
    missing directory means 0 rows, not an error."""
    import pyarrow.dataset as pads

    if not os.path.isdir(path):
        return 0
    return sum(
        f.metadata.num_rows
        for f in pads.dataset(path, format="parquet").get_fragments()
    )


def _jsonable_metrics(metrics: dict) -> dict:
    """Scalar counters plus the dict-valued per-key counter tables
    (hot_blocks / dropped_blocks / per-stage manifests) — everything a 100×
    operator needs to see salting and drop decisions without reading
    manifest files."""
    return {
        k: v
        for k, v in metrics.items()
        if isinstance(v, (int, float, str, dict))
    }


def cmd_dedup(args: argparse.Namespace) -> dict:
    from record_linkage_ldu_ray.config import PipelineConfig
    from record_linkage_ldu_ray.pipelines.dedup import dedup_transcripts

    cfg = PipelineConfig()
    if args.pair_partitions:
        import dataclasses

        cfg = dataclasses.replace(cfg, pair_partitions=args.pair_partitions)
    res = dedup_transcripts(args.input, cfg, workdir=args.workdir)
    out = {
        "clusters": _write(res.clusters, f"{args.out}/clusters"),
        "matches": _write(res.matches, f"{args.out}/matches"),
    }
    if args.scores:
        out["scores"] = _write(res.scores, f"{args.out}/scores")
    out["metrics"] = _jsonable_metrics(res.metrics)
    return out


def cmd_link(args: argparse.Namespace) -> dict:
    from record_linkage_ldu_ray.pipelines.linkage import link_datasets

    res = link_datasets(args.input_a, args.input_b)
    return {
        "matches": _write(res.matches, f"{args.out}/matches"),
        "groups": _write(res.groups, f"{args.out}/groups"),
        "metrics": _jsonable_metrics(res.metrics),
    }


def cmd_query(args: argparse.Namespace) -> dict:
    import importlib.util
    import os

    # __ray_entry__ lives at the repo root, beside this package
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(root, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    if args.name not in queries:
        raise SystemExit(
            f"unknown query {args.name!r}; one of: {', '.join(sorted(queries))}"
        )
    res = queries[args.name](args.sf_dir)
    if hasattr(res, "write_parquet"):
        out = {"rows": _write(res, args.out)}
    else:
        # pandas / Arrow results from driver-side mergers
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
        os.makedirs(args.out, exist_ok=True)
        pq.write_table(table, os.path.join(args.out, "part-0.parquet"))
        out = {"rows": table.num_rows}
    # surface per-pipeline counters (hot-key salting, dropped blocks,
    # pinned bytes) recorded by the pipelines this query ran — the operator
    # sees data-dependent decisions without reading workdir manifests
    from record_linkage_ldu_ray.runtime import LAST_RUN_METRICS

    if LAST_RUN_METRICS:
        out["metrics"] = {
            name: _jsonable_metrics(m) for name, m in LAST_RUN_METRICS.items()
        }
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="record_linkage_ldu_ray")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus for LOCAL runs (ignored on a cluster)")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup", help="flagship transcript dedup")
    d.add_argument("--input", required=True, help="transcripts parquet path")
    d.add_argument("--workdir", default=None,
                   help="checkpoint dir (stage manifests; enables resume)")
    d.add_argument("--out", required=True, help="output parquet root")
    d.add_argument("--scores", action="store_true",
                   help="also persist all scored pairs")
    d.add_argument("--pair-partitions", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    l = sub.add_parser("link", help="bipartite linkage of two corpora")
    l.add_argument("--input-a", required=True)
    l.add_argument("--input-b", required=True)
    l.add_argument("--out", required=True)
    l.set_defaults(fn=cmd_link)

    q = sub.add_parser("query", help="run a registered query pipeline")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", required=True)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    owns_ray = _ray_init(args.num_cpus)
    try:
        result = args.fn(args)
        print(json.dumps(result))
    finally:
        # shutdown on the error path too — a raised pipeline must not leak
        # a live local Ray instance into the submitting process
        if owns_ray:
            import ray

            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
