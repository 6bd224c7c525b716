"""Full-registry correctness sweep: every ``__ray_entry__.queries()`` entry
vs its ``oracle_sql()`` DuckDB oracle, driver-protocol compare.

The external driver's per-round CORRECTNESS_r{N}.json checks only the FIRST
50 registered queries; this runner re-proves the WHOLE registry (87 oracle
queries hash-exact, the rest rows-only) and writes a committed artifact so
the full claim is reproducible from the repo alone:

    python tools/check_oracles.py                       # sf0.01, all queries
    python tools/check_oracles.py --sf /root/testdata/sf0.001 --only q1 q2
    python tools/check_oracles.py --out CORRECTNESS_full.json

Compare protocol mirrors the driver: row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized to strings at 6dp float precision).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by NAME, every value a
    string (floats at 6dp so dtype-level diffs don't flip the hash), rows
    sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].map(lambda v: "nan" if pd.isna(v) else f"{v:.6f}")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update("\x1f".join(df.columns).encode())
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def run_sweep(sf_dir: str, only: list[str] | None = None) -> dict:
    sys.path.insert(0, REPO)
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "engine_rows": None,
            "oracle_rows": None,
            "seconds": None,
            "err": None,
        }
        results[name] = row
        t0 = time.time()
        try:
            got = _to_df(fn(sf_dir))
        except Exception:
            row["err"] = "query_raised: " + traceback.format_exc(limit=3)
            print(f"FAIL {name}: query raised", flush=True)
            continue
        row["seconds"] = round(time.time() - t0, 2)
        row["engine_rows"] = int(len(got))
        if name not in oracles:
            row["err"] = "no_oracle"
            print(
                f"ok(rows-only) {name}: {len(got)} rows"
                f" [{row['seconds']}s]",
                flush=True,
            )
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception:
            row["err"] = "oracle_raised: " + traceback.format_exc(limit=3)
            print(f"FAIL {name}: oracle SQL raised", flush=True)
            continue
        row["oracle_rows"] = int(len(exp))
        row["rows_match"] = len(got) == len(exp)
        row["schema_match"] = sorted(got.columns) == sorted(exp.columns)
        if row["rows_match"] and row["schema_match"]:
            g, e = _canon(got), _canon(exp)
            row["hash_match"] = _value_hash(g) == _value_hash(e)
        else:
            row["hash_match"] = False
        status = "OK  " if row["hash_match"] else "FAIL"
        print(
            f"{status} {name}: {len(got)} rows [{row['seconds']}s]",
            flush=True,
        )
        if not row["hash_match"] and row["rows_match"] and row["schema_match"]:
            g, e = _canon(got), _canon(exp)
            diff = (g != e).any(axis=1)
            print("  got:", g[diff].head(2).to_dict("records"), flush=True)
            print("  exp:", e[diff].head(2).to_dict("records"), flush=True)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write the JSON artifact here")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        results = run_sweep(args.sf, args.only)
    finally:
        ray.shutdown()

    n_ok = sum(1 for r in results.values() if r["hash_match"])
    rows_only = [n for n, r in results.items() if r["err"] == "no_oracle"]
    fails = [
        n
        for n, r in results.items()
        if r["err"] not in (None, "no_oracle") or r["hash_match"] is False
    ]
    artifact = {
        "sf_dir": args.sf,
        "total_queries": len(results),
        "oracle_exact_ok": n_ok,
        "rows_only": rows_only,
        "failures": fails,
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}")
    print(
        f"\n{n_ok} oracle-exact OK, {len(rows_only)} rows-only, "
        f"{len(fails)} FAILURES: {fails if fails else 'none'}"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
