"""ray-job CLI: dedup/link/query subcommands run in-process against the
session Ray and write partitioned parquet."""

import json
import os

import pyarrow.parquet as pq

from record_linkage_ldu_ray.cli import main
from record_linkage_ldu_ray.fixtures import FixtureSpec, cached_fixture


def _run(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


class TestCli:
    def test_query_writes_parquet(self, ray_session, tmp_path, capsys):
        out = str(tmp_path / "q")
        rc, res = _run(
            ["query", "lineitem_pricing", "--sf-dir", "/root/testdata/sf0.001",
             "--out", out],
            capsys,
        )
        assert rc == 0 and res["rows"] > 0
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        assert sum(pq.read_table(os.path.join(out, f)).num_rows
                   for f in files) == res["rows"]

    def test_dedup_end_to_end_and_resume(self, ray_session, tmp_path, capsys):
        fix = cached_fixture(FixtureSpec(n_families=20))
        work = str(tmp_path / "work")
        out1 = str(tmp_path / "out1")
        rc, res = _run(
            ["dedup", "--input", f"{fix}/transcripts.parquet",
             "--workdir", work, "--out", out1],
            capsys,
        )
        assert rc == 0 and res["clusters"] > 0
        # salting / drop decisions are operator-visible in the JSON output
        # (dict-valued per-key counter tables included)
        assert "hot_blocks" in res["metrics"]
        assert "dropped_blocks" in res["metrics"]
        assert isinstance(res["metrics"]["hot_blocks"], dict)
        # resume: same workdir, fresh out dir — stages skip via manifests,
        # results identical
        out2 = str(tmp_path / "out2")
        rc2, res2 = _run(
            ["dedup", "--input", f"{fix}/transcripts.parquet",
             "--workdir", work, "--out", out2],
            capsys,
        )
        assert rc2 == 0
        assert res2["clusters"] == res["clusters"]
        assert res2["matches"] == res["matches"]

    def test_query_surfaces_pipeline_counters(self, ray_session, tmp_path, capsys):
        """`query` output carries the counters the pipeline published
        (hot-key salting / dropped-block decisions) without the operator
        reading workdir manifests."""
        out = str(tmp_path / "qm")
        rc, res = _run(
            ["query", "transcript_dedup", "--sf-dir", "/root/testdata/sf0.001",
             "--out", out],
            capsys,
        )
        assert rc == 0 and res["rows"] > 0
        m = res["metrics"]["dedup_transcripts"]
        assert "hot_blocks" in m and "dropped_blocks" in m

    def test_unknown_query_exits(self, ray_session, tmp_path, capsys):
        import pytest

        with pytest.raises(SystemExit):
            main(["query", "no_such_pipeline", "--out", str(tmp_path / "x")])

    def test_link_end_to_end(self, ray_session, tmp_path, capsys):
        fix_a = cached_fixture(FixtureSpec(n_families=15))
        fix_b = cached_fixture(FixtureSpec(n_families=15, seed=43))
        out = str(tmp_path / "link")
        rc, res = _run(
            ["link", "--input-a", f"{fix_a}/transcripts.parquet",
             "--input-b", f"{fix_b}/transcripts.parquet", "--out", out],
            capsys,
        )
        assert rc == 0
        assert res["groups"] > 0  # every record lands in exactly one group
        assert os.path.isdir(os.path.join(out, "groups"))
