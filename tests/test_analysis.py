"""Tests for sources, turn-dedup (M19), and the analysis operators
(A4 cluster stats, D5 classify, D6 run diff, S5 histograms)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_clusters(ray_session):
    import ray.data

    t = pa.table(
        {
            "conv_id": [f"c{i}" for i in range(10)],
            "cluster_id": ["c0", "c0", "c0", "c3", "c3", "c5", "c6", "c7", "c8", "c9"],
        }
    )
    return ray.data.from_arrow(t)


class TestClusterStats:
    def test_sizes_and_stats(self, tiny_clusters):
        from record_linkage_ldu_ray.pipelines.analysis import (
            cluster_size_stats,
            cluster_sizes,
        )

        sizes = cluster_sizes(tiny_clusters).to_pandas()
        assert dict(zip(sizes["cluster_id"], sizes["size"]))["c0"] == 3
        st = cluster_size_stats(tiny_clusters)
        assert st["n_clusters"] == 7
        assert st["n_records"] == 10
        assert st["max"] == 3
        assert st["n_singletons"] == 5


class TestClassifyClusters:
    def test_verified_contradicted_unverified(self, tiny_clusters, tmp_path):
        from record_linkage_ldu_ray.pipelines.analysis import classify_clusters

        labels = pa.table(
            {
                "conv_id_a": ["c0", "c3", "c5"],
                "conv_id_b": ["c1", "c4", "c6"],
                "is_match": [True, False, True],
            }
        )
        p = str(tmp_path / "labels.parquet")
        pq.write_table(labels, p)
        res = classify_clusters(tiny_clusters, p)
        # c0∪c1 same cluster + positive -> verified; c3∪c4 same cluster +
        # negative -> contradicted; c5,c6 different clusters -> no verdict
        assert res["verified"] == 1
        assert res["contradicted"] == 1
        assert res["unverified"] == res["n_clusters"] - 2


class TestDiffRuns:
    def test_identical_and_changed(self, tiny_clusters, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.analysis import diff_cluster_runs

        d = diff_cluster_runs(tiny_clusters, tiny_clusters)
        assert d["n_common"] == d["n_clusters_a"] == d["n_clusters_b"] == 7
        t2 = pa.table(
            {
                "conv_id": [f"c{i}" for i in range(10)],
                # c5 joins the c0 component
                "cluster_id": ["c0", "c0", "c0", "c3", "c3", "c0", "c6", "c7", "c8", "c9"],
            }
        )
        d2 = diff_cluster_runs(tiny_clusters, ray.data.from_arrow(t2))
        assert d2["n_only_a"] == 2  # {c0,c1,c2} and {c5} replaced
        assert d2["n_only_b"] == 1  # {c0,c1,c2,c5}
        assert d2["n_common"] == 5


class TestScoreHistograms:
    def test_counts_sum_to_rows(self, ray_session):
        import ray.data

        rng = np.random.default_rng(3)
        n = 1000
        t = pa.table(
            {
                "jac_text": rng.random(n),
                "jw_text": rng.random(n),
            }
        )
        from record_linkage_ldu_ray.pipelines.analysis import score_histograms

        h = score_histograms(ray.data.from_arrow(t), columns=["jac_text", "jw_text"], bins=10)
        assert h.groupby("column")["count"].sum().tolist() == [n, n]


class TestTurnDedup:
    def test_first_occurrence_kept(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.stages.turndedup import dedup_turns

        t = pa.table(
            {
                "conv_id": ["a", "a", "a", "a", "b", "b"],
                "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
                "text": ["hi", "yo", "hi", "new", "hi", "hi"],
            }
        )
        out = dedup_turns(ray.data.from_arrow(t), num_partitions=4).to_pandas()
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        # 'hi'@a2 dropped (dup of a0); 'hi'@b1 dropped (dup of b0)
        assert list(zip(out["conv_id"], out["turn_idx"])) == [
            ("a", 0), ("a", 1), ("a", 3), ("b", 0),
        ]


class TestSources:
    def test_csv_roundtrip(self, ray_session, tmp_path, xs_fixture_dir):
        import pandas as pd

        from record_linkage_ldu_ray.sources import read_table, read_transcripts_csv

        df = pq.read_table(f"{xs_fixture_dir}/transcripts.parquet").to_pandas().head(200)
        p = str(tmp_path / "transcripts.csv")
        df.to_csv(p, sep=";", index=False)
        ds = read_transcripts_csv(p)
        got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert got["turn_idx"].dtype == np.int32
        assert list(got["conv_id"]) == list(want["conv_id"])
        assert list(got["text"].fillna("")) == list(want["text"].fillna(""))
        # parquet dispatch path
        assert read_table(f"{xs_fixture_dir}/transcripts.parquet").count() > 0


class TestTumblingWindow:
    def test_partials_merge_exactly(self, ray_session, tmp_path):
        """Two-level (partial → keyed merge) aggregation must be exact:
        compare against a single-pass pandas groupby on the same events."""
        import datetime as dt

        import pandas as pd

        from record_linkage_ldu_ray.pipelines.relational import tumbling_window_stats

        rng = np.random.default_rng(7)
        n = 5000
        base = dt.datetime(2024, 1, 1)
        ts = [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 72 * 3600, n)]
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": pd.to_datetime(ts).astype("datetime64[us]"),
                "user_id": rng.integers(0, 40, n),
                "event_type": rng.choice(["click", "view", "error"], n),
                "value": np.round(rng.uniform(0, 100, n), 2),
                "props": ["{}"] * n,
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pa.Table.from_pandas(df, preserve_index=False)
        import pyarrow.parquet as _pq

        _pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{d}/events.parquet")

        got = (
            tumbling_window_stats(str(d), window="1h")
            .to_pandas()
            .sort_values(["user_id", "window_start"])
            .reset_index(drop=True)
        )
        ref = df.assign(
            window_start=df["ts"].dt.floor("h"),
            cents=(df["value"] * 100).round().astype("int64"),
            click=(df["event_type"] == "click").astype("int64"),
        )
        want = (
            ref.groupby(["user_id", "window_start"], as_index=False)
            .agg(n_events=("event_id", "size"), sum_value_cents=("cents", "sum"),
                 n_clicks=("click", "sum"))
            .sort_values(["user_id", "window_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
        assert (got["sum_value_cents"].to_numpy() == want["sum_value_cents"].to_numpy()).all()
        assert (got["n_clicks"].to_numpy() == want["n_clicks"].to_numpy()).all()


class TestAsofJoin:
    def test_backward_matches_pandas_merge_asof(self, ray_session):
        import pandas as pd
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import asof_join

        rng = np.random.default_rng(7)
        nl, nr = 400, 300
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 12, nl).astype("int64"),
                "t": rng.integers(0, 10_000, nl).astype("int64"),
                "lid": np.arange(nl, dtype="int64"),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 12, nr).astype("int64"),
                "t": rng.integers(0, 10_000, nr).astype("int64"),
                "rv": np.round(rng.uniform(0, 1, nr), 6),
            }
        )
        # asof semantics need unique (k, t) on the right
        right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)

        lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(5)
        rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3)
        got = (
            asof_join(
                lds, rds, by="k", on="t", left_cols=["lid"], right_cols=["t", "rv"],
                suffix="_r", num_parts=4,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )

        want = pd.merge_asof(
            left.sort_values("t").reset_index(drop=True),
            right.sort_values("t").reset_index(drop=True),
            on="t",
            by="k",
            direction="backward",
            suffixes=("", "_r"),
        ).sort_values("lid").reset_index(drop=True)
        # pandas keeps right's t implicitly equal to the matched row's t only
        # via rv; recompute t_r from right by (k, rv) match is awkward — assert
        # on rv and the left columns, then spot-check t_r <= t.
        assert len(got) == nl
        assert (got["lid"].to_numpy() == want["lid"].to_numpy()).all()
        gv, wv = got["rv_r"].to_numpy(), want["rv"].to_numpy()
        both_nan = np.isnan(gv) & np.isnan(wv)
        assert (both_nan | (gv == wv)).all()
        tr = got["t_r"].to_numpy()
        ok = np.isnan(tr) | (tr <= got["t"].to_numpy())
        assert ok.all()

    def test_no_match_rows_null(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import asof_join

        left = pa.table({"k": [1, 1, 2], "t": [5, 10, 7], "lid": [0, 1, 2]})
        right = pa.table({"k": [1, 2], "t": [8, 99], "rv": [0.5, 0.9]})
        got = (
            asof_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="k", on="t", left_cols=["lid"], right_cols=["rv"], num_parts=2,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert np.isnan(got["rv_r"][0])        # t=5 before first right t=8
        assert got["rv_r"][1] == 0.5           # t=10 sees right t=8
        assert np.isnan(got["rv_r"][2])        # k=2 right row at t=99 is after


class TestRangeJoin:
    def test_matches_bruteforce(self, ray_session):
        import pandas as pd
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import range_join

        rng = np.random.default_rng(11)
        nl, nr = 300, 400
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 10, nl).astype("int64"),
                "t": rng.integers(0, 5_000, nl).astype("int64"),
                "lid": np.arange(nl, dtype="int64"),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 10, nr).astype("int64"),
                "t": rng.integers(0, 5_000, nr).astype("int64"),
                "rid": np.arange(nr, dtype="int64"),
            }
        )
        lo, hi = -200, 100
        got = (
            range_join(
                ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(5),
                ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3),
                by="k", on="t", lo=lo, hi=hi,
                left_cols=["lid"], right_cols=["rid"], num_parts=4,
            )
            .to_pandas()
            .sort_values(["lid", "rid_r"])
            .reset_index(drop=True)
        )
        want = left.merge(right, on="k", suffixes=("", "_r"))
        want = want[(want["t_r"] >= want["t"] + lo) & (want["t_r"] <= want["t"] + hi)]
        want = want.sort_values(["lid", "rid"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["lid"].to_numpy() == want["lid"].to_numpy()).all()
        assert (got["rid_r"].to_numpy() == want["rid"].to_numpy()).all()
        assert (got["t_r"].to_numpy() == want["t_r"].to_numpy()).all()

    def test_window_outside_data_range(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import range_join

        left = pa.table({"k": [1, 1, 1], "t": [0, 50, 1000], "lid": [0, 1, 2]})
        right = pa.table({"k": [1], "t": [50], "rid": [7]})
        got = (
            range_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="k", on="t", lo=-10, hi=10,
                left_cols=["lid"], right_cols=["rid"], num_parts=2,
            )
            .to_pandas()
        )
        # only t=50 matches; windows entirely below (t=0 → [-10,10]) and
        # entirely above (t=1000) the right range must clamp to zero matches
        assert got["lid"].tolist() == [1]
        assert got["rid_r"].tolist() == [7]

    def test_inclusive_bounds(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import range_join

        left = pa.table({"k": [1], "t": [100], "lid": [0]})
        right = pa.table({"k": [1, 1, 1, 1], "t": [89, 90, 110, 111], "rid": [0, 1, 2, 3]})
        got = (
            range_join(
                ray.data.from_arrow(left), ray.data.from_arrow(right),
                by="k", on="t", lo=-10, hi=10,
                left_cols=["lid"], right_cols=["rid"], num_parts=2,
            )
            .to_pandas()
            .sort_values("rid_r")
        )
        assert got["rid_r"].tolist() == [1, 2]  # 90 and 110 inclusive; 89/111 out


class TestGlobalRank:
    def test_row_number_and_ntile_exact(self, ray_session, tmp_path):
        """Distributed rank (sort → block-offset prefix sum → per-block
        arange) must equal a single-node window function, including ties
        in the price broken by orderkey and NTILE remainder buckets."""
        import duckdb

        from record_linkage_ldu_ray.pipelines.relational import global_rank

        rng = np.random.default_rng(11)
        n = 777  # not divisible by 10 → NTILE remainder buckets exercised
        t = pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                # few distinct prices → heavy ties, tie-break by orderkey
                "o_totalprice": pa.array(
                    np.round(rng.choice([10.0, 20.5, 33.25], n), 2)
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/orders.parquet")

        got = (
            global_rank(str(d))
            .to_pandas()
            .sort_values("rnk")
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(
                f"""
            SELECT o_orderkey,
                   CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents,
                   ROW_NUMBER() OVER w AS rnk,
                   CAST(NTILE(10) OVER w AS INTEGER) AS decile
            FROM '{d}/orders.parquet'
            WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
            ORDER BY rnk"""
            )
            .df()
        )
        assert (got["rnk"].to_numpy() == np.arange(1, n + 1)).all()
        for c in ("o_orderkey", "totalprice_cents", "rnk", "decile"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
        # unique composite key → closed forms of the rank distributions
        assert (got["percent_rank"].to_numpy() == (np.arange(n)) / (n - 1)).all()
        assert (got["cume_dist"].to_numpy() == np.arange(1, n + 1) / n).all()


class TestGroupedTopK:
    def test_matches_partitioned_row_number(self, ray_session, tmp_path):
        """Combiner (per-block group-head) + per-partition finalizer must
        equal the single-node PARTITION BY window, including value ties."""
        import duckdb

        from record_linkage_ldu_ray.pipelines.relational import top_events_per_user

        rng = np.random.default_rng(13)
        n = 4000
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(
                    np.array("2024-01-01", "datetime64[us]")
                    + rng.integers(0, 10**6, n).astype("timedelta64[us]")
                ),
                "user_id": pa.array(rng.integers(0, 60, n).astype(np.int64)),
                "event_type": pa.array(["view"] * n),
                # coarse values → frequent ties broken by event_id
                "value": pa.array(np.round(rng.uniform(0, 5, n), 0)),
                "props": pa.array(["{}"] * n),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/events.parquet")

        got = (
            top_events_per_user(str(d), k=3)
            .to_pandas()
            .sort_values(["user_id", "rn"])
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(
                f"""
            SELECT user_id, event_id, value, rn FROM (
              SELECT user_id, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rn
              FROM '{d}/events.parquet')
            WHERE rn <= 3 ORDER BY user_id, rn"""
            )
            .df()
        )
        assert len(got) == len(want)
        for c in ("user_id", "event_id", "value", "rn"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


class TestHashJoin:
    def test_inner_join_semantics(self, ray_session):
        """Duplicate keys → per-key cross product; one-sided keys dropped;
        null padding never leaks into the output."""
        import pandas as pd
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import hash_join

        left = pa.table(
            {
                "k": pa.array([1, 1, 2, 3, 5], pa.int64()),
                "lv": pa.array(["a", "b", "c", "d", "e"]),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 2, 2, 4], pa.int64()),
                "rv": pa.array([10.0, 20.0, 21.0, 40.0]),
            }
        )
        got = (
            hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), on="k")
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            left.to_pandas()
            .merge(right.to_pandas(), on="k")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want)

    def test_colliding_columns_rejected(self, ray_session):
        import pytest as _pytest
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import hash_join

        t = pa.table({"k": [1], "v": [2]})
        with _pytest.raises(ValueError, match="collide"):
            hash_join(ray.data.from_arrow(t), ray.data.from_arrow(t), on="k")


class TestHoppingWindow:
    def test_each_event_in_window_over_hop_windows(self, ray_session, tmp_path):
        """Every event must appear in exactly window/hop windows, and window
        sums must equal a brute-force per-window scan."""
        import datetime as dt

        import pandas as pd

        from record_linkage_ldu_ray.pipelines.relational import hopping_window_stats

        rng = np.random.default_rng(17)
        n = 2000
        base = dt.datetime(2024, 3, 1)
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": pd.to_datetime(
                    [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 6 * 3600, n)]
                ).astype("datetime64[us]"),
                "user_id": rng.integers(0, 10, n),
                "event_type": ["view"] * n,
                "value": np.round(rng.uniform(0, 9, n), 2),
                "props": ["{}"] * n,
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{d}/events.parquet")

        got = hopping_window_stats(str(d), window_minutes=60, hop_minutes=15).to_pandas()
        # every event lands in exactly 4 windows
        assert got["n_events"].sum() == 4 * n
        # brute force one (user, window) cell
        row = got.sort_values("n_events", ascending=False).iloc[0]
        u, ws = row["user_id"], row["window_start"]
        sel = df[(df["user_id"] == u) & (df["ts"] >= ws) & (df["ts"] < ws + pd.Timedelta(minutes=60))]
        assert row["n_events"] == len(sel)
        assert row["sum_value_cents"] == int((sel["value"] * 100).round().astype("int64").sum())


class TestOrdersRollup:
    def test_levels_consistent(self, ray_session, tmp_path):
        """Rollup levels derived from the finest grain must be internally
        consistent: status rows = sum of their (status, priority) rows and
        the grand total = sum of status rows."""
        from record_linkage_ldu_ray.pipelines.relational import orders_rollup

        rng = np.random.default_rng(19)
        n = 3000
        t = pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(np.zeros(n, dtype=np.int64)),
                "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n)),
                "o_totalprice": pa.array(np.round(rng.uniform(1, 9, n), 2)),
                "o_orderdate": pa.array(
                    np.full(n, np.datetime64("2024-01-01", "us"))
                ),
                "o_orderpriority": pa.array(rng.choice(["1-URGENT", "2-HIGH"], n)),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/orders.parquet")

        got = orders_rollup(str(d)).to_pandas()
        fine = got[got["o_orderpriority"].notna()]
        mid = got[got["o_orderpriority"].isna() & got["o_orderstatus"].notna()]
        top = got[got["o_orderstatus"].isna()]
        assert len(top) == 1 and top["n_orders"].iloc[0] == n
        assert fine["n_orders"].sum() == n and mid["n_orders"].sum() == n
        for _, m in mid.iterrows():
            sub = fine[fine["o_orderstatus"] == m["o_orderstatus"]]
            assert m["n_orders"] == sub["n_orders"].sum()
            assert m["sum_totalprice_cents"] == sub["sum_totalprice_cents"].sum()
        assert top["sum_totalprice_cents"].iloc[0] == fine["sum_totalprice_cents"].sum()


class TestHashAntiJoin:
    def test_not_exists_semantics(self, ray_session):
        """Left rows with matching right keys vanish; duplicates on either
        side don't multiply; left rows keep their payload columns."""
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import hash_anti_join

        left = pa.table(
            {
                "k": pa.array([1, 2, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", "d", "e"]),
            }
        )
        right = pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())})
        got = (
            hash_anti_join(ray.data.from_arrow(left), ray.data.from_arrow(right), on="k")
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        assert list(got["k"]) == [1, 3]
        assert list(got["v"]) == ["a", "d"]


class TestHashSemiJoin:
    def test_exists_semantics_no_multiplication(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import hash_semi_join

        left = pa.table(
            {
                "k": pa.array([1, 2, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", "d", "e"]),
            }
        )
        # key 2 matches THREE right rows → left rows must not multiply
        right = pa.table({"k": pa.array([2, 2, 2, 4], pa.int64())})
        got = (
            hash_semi_join(ray.data.from_arrow(left), ray.data.from_arrow(right), on="k")
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        assert list(got["k"]) == [2, 2, 4]
        assert list(got["v"]) == ["b", "c", "e"]


class TestJsonlReader:
    def test_jsonl_roundtrip_matches_parquet(self, ray_session, tmp_path):
        """The JSONL reader must deliver the same canonical transcript
        schema and rows as the parquet reader."""
        import json

        from record_linkage_ldu_ray.sources.readers import (
            read_table,
            read_transcripts_jsonl,
        )

        rows = [
            {
                "conv_id": f"c{i}",
                "turn_idx": i % 3,
                "role": "user" if i % 2 == 0 else "assistant",
                "text": f"turn text {i}",
                "tool": None if i % 3 else "search",
                "ts": f"2024-01-01T00:00:{i:02d}",
            }
            for i in range(20)
        ]
        p = tmp_path / "t.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))

        got = (
            read_transcripts_jsonl(str(p))
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(got) == 20
        assert str(got["turn_idx"].dtype) == "int32"
        assert "datetime64" in str(got["ts"].dtype)
        assert got.loc[0, "conv_id"] == "c0" and got.loc[0, "text"] == "turn text 0"
        # extension dispatch
        got2 = read_table(str(p)).to_pandas()
        assert len(got2) == 20


class TestProfileTable:
    def test_nulls_and_distinct_exact(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.analysis import profile_table

        t = pa.table(
            {
                "a": pa.array([1, 1, 2, None, None], pa.int64()),
                "b": pa.array(["x", "y", "x", "z", None]),
            }
        )
        got = (
            profile_table(ray.data.from_arrow(t), ["a", "b"])
            .to_pandas()
            .set_index("column")
        )
        assert got.loc["a", "n_rows"] == 5
        assert got.loc["a", "n_nulls"] == 2 and got.loc["a", "n_distinct"] == 2
        assert got.loc["b", "n_nulls"] == 1 and got.loc["b", "n_distinct"] == 3


class TestBrandCooccurrence:
    def test_planted_baskets(self, ray_session, tmp_path):
        """Pair counts are per ORDER (duplicate brand items in one order
        count once) and oriented brand_a < brand_b."""
        from record_linkage_ldu_ray.pipelines.relational import brand_cooccurrence

        part = pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_name": pa.array(["pa", "pb", "pc"]),
                "p_brand": pa.array(["B1", "B2", "B3"]),
                "p_type": pa.array(["t"] * 3),
                "p_size": pa.array([1, 1, 1], pa.int64()),
                "p_retailprice": pa.array([1.0, 2.0, 3.0]),
            }
        )
        # order 10: parts 1,1,2 → pair (B1,B2) once; order 20: 1,2,3 → 3 pairs
        li = pa.table(
            {
                "l_orderkey": pa.array([10, 10, 10, 20, 20, 20], pa.int64()),
                "l_partkey": pa.array([1, 1, 2, 1, 2, 3], pa.int64()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(part, f"{d}/part.parquet")
        pq.write_table(li, f"{d}/lineitem.parquet")

        got = brand_cooccurrence(str(d)).to_pandas().set_index(["brand_a", "brand_b"])
        assert got.loc[("B1", "B2"), "n_orders"] == 2
        assert got.loc[("B1", "B3"), "n_orders"] == 1
        assert got.loc[("B2", "B3"), "n_orders"] == 1
        assert len(got) == 3


class TestEventTransitions:
    def test_matches_pandas_lag(self, ray_session, tmp_path):
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.relational import event_transitions

        rng = np.random.default_rng(31)
        n = 3000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n), unit="us"),
                "user_id": rng.integers(0, 40, n),
                "event_type": rng.choice(["a", "b", "c"], n),
                "value": np.zeros(n),
                "props": ["{}"] * n,
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{d}/events.parquet")

        got = event_transitions(str(d)).to_pandas().set_index(["prev_type", "next_type"])
        s = df.sort_values(["user_id", "ts", "event_id"])
        s["prev"] = s.groupby("user_id")["event_type"].shift(1)
        want = (
            s.dropna(subset=["prev"])
            .groupby(["prev", "event_type"])
            .size()
            .rename("n")
        )
        assert len(got) == len(want)
        for (p, nx), cnt in want.items():
            assert got.loc[(p, nx), "n_transitions"] == cnt


class TestRunningTotals:
    def test_matches_pandas_cumsum(self, ray_session, tmp_path):
        import pandas as pd

        from record_linkage_ldu_ray.pipelines.relational import customer_running_totals

        rng = np.random.default_rng(41)
        n = 2000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_custkey": rng.integers(0, 50, n).astype(np.int64),
                "o_orderstatus": ["O"] * n,
                "o_totalprice": np.round(rng.uniform(1, 500, n), 2),
                "o_orderdate": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 365, n), unit="D"),
                "o_orderpriority": ["1-URGENT"] * n,
            }
        )
        df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{d}/orders.parquet")

        got = (
            customer_running_totals(str(d))
            .to_pandas()
            .sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
            .reset_index(drop=True)
        )
        s = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).reset_index(drop=True)
        s["cents"] = (s["o_totalprice"] * 100).round().astype("int64")
        want = s.groupby("o_custkey")["cents"].cumsum().to_numpy()
        assert (got["running_cents"].to_numpy() == want).all()


class TestKeySkewReport:
    def test_planted_hot_key(self, ray_session):
        import ray.data

        from record_linkage_ldu_ray.pipelines.analysis import key_skew_report

        keys = ["hot"] * 500 + [f"k{i}" for i in range(100)] * 3
        t = pa.table({"k": pa.array(keys)})
        got = key_skew_report(ray.data.from_arrow(t), "k", top=5).to_pandas()
        assert got.iloc[0]["key"] == "hot" and got.iloc[0]["n_rows"] == 500
        assert len(got) == 5
        assert (got["n_rows"].to_numpy()[1:] == 3).all()
        assert list(got["key"][1:]) == ["k0", "k1", "k10", "k11"]  # count-tie → key ASC


class TestEmptyInputs:
    """Ray Data emits empty blocks; operators must survive 0-row tables
    (ADVICE r1 flagged this class on the ANN path)."""

    def _write_empty(self, tmp_path):
        d = tmp_path / "sf"
        d.mkdir()
        orders = pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        )
        events = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        )
        lineitem = pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
            ]
        )
        pq.write_table(orders.empty_table(), f"{d}/orders.parquet")
        pq.write_table(events.empty_table(), f"{d}/events.parquet")
        pq.write_table(lineitem.empty_table(), f"{d}/lineitem.parquet")
        return str(d)

    def test_window_and_agg_ops_on_empty(self, ray_session, tmp_path):
        from record_linkage_ldu_ray.pipelines.relational import (
            customer_running_totals,
            event_transitions,
            events_pivot,
            global_rank,
            hopping_window_stats,
            orders_rollup,
            top_events_per_user,
        )

        d = self._write_empty(tmp_path)
        for op in (
            global_rank,
            top_events_per_user,
            hopping_window_stats,
            events_pivot,
            customer_running_totals,
            event_transitions,
        ):
            out = op(d)
            n = out.count() if hasattr(out, "count") else len(out)
            assert n == 0, op.__name__
        # rollup of an empty table still has the grand-total row shape
        r = orders_rollup(d)
        n = len(r) if not hasattr(r, "count") else r.count()
        assert n <= 1

    def test_joins_and_merges_on_empty(self, ray_session, tmp_path):
        from record_linkage_ldu_ray.pipelines.relational import (
            json_props_stats,
            orders_no_bulk_items,
            orders_with_bulk_items,
        )

        d = self._write_empty(tmp_path)
        for op in (orders_no_bulk_items, orders_with_bulk_items):
            out = op(d)
            assert out.count() == 0, op.__name__
        assert len(json_props_stats(d)) == 0


class TestDenseRank:
    def test_ties_share_gapless_ranks(self, ray_session, tmp_path):
        from record_linkage_ldu_ray.pipelines.relational import price_dense_rank

        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([0] * 5, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 5),
                "o_totalprice": pa.array([30.0, 10.0, 30.0, 20.0, 10.0]),
                "o_orderdate": pa.array(
                    np.full(5, np.datetime64("2024-01-01", "us"))
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 5),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/orders.parquet")
        got = price_dense_rank(str(d)).to_pandas().set_index("o_orderkey")
        assert got.loc[1, "drank"] == 1 and got.loc[3, "drank"] == 1
        assert got.loc[4, "drank"] == 2
        assert got.loc[2, "drank"] == 3 and got.loc[5, "drank"] == 3


class TestOrderShare:
    def test_shares_sum_to_one_per_customer(self, ray_session, tmp_path):
        from record_linkage_ldu_ray.pipelines.relational import order_share_of_customer

        rng = np.random.default_rng(43)
        n = 1000
        t = pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(rng.integers(0, 40, n).astype(np.int64)),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(np.round(rng.uniform(1, 100, n), 2)),
                "o_orderdate": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, f"{d}/orders.parquet")
        got = order_share_of_customer(str(d)).to_pandas()
        sums = got.groupby("o_custkey")["share"].sum()
        assert np.allclose(sums.to_numpy(), 1.0)
        assert (got["share"] > 0).all() and (got["share"] <= 1.0).all()


class TestConversationStats:
    def test_exact_and_partition_invariant(self, ray_session):
        """Two-level partial aggregation must match a single-pass pandas
        groupby exactly, at any partitioning / num_parts."""
        import pandas as pd
        import ray.data

        from record_linkage_ldu_ray.functions.rounding import round6_scalar
        from record_linkage_ldu_ray.pipelines.relational import conversation_stats

        rng = np.random.default_rng(11)
        rows = []
        for c in range(60):
            for t in range(int(rng.integers(1, 14))):
                role = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
                k = int(rng.integers(1, 9))
                text = " ".join(f"w{int(x)}" for x in rng.integers(0, 30, k))
                rows.append((f"c{c:03d}", t, role, text, "search" if role == "tool" else None))
        t = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
                "tool": pa.array([r[4] for r in rows], pa.string()),
            }
        )
        # repartition(9): conversations straddle batch boundaries, so the
        # merge really combines partials from different batches
        ds = ray.data.from_arrow(t).repartition(9)
        cols = ["conv_id", "n_turns", "n_user", "n_assistant", "n_tool", "avg_turn_tokens"]
        a = conversation_stats(ds, num_parts=3).to_pandas()[cols]
        b = conversation_stats(ds, num_parts=16).to_pandas()[cols]
        a = a.sort_values("conv_id").reset_index(drop=True)
        b = b.sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
        df["toks"] = df["text"].str.count(" ") + 1
        exp = (
            df.groupby("conv_id")
            .apply(
                lambda g: pd.Series(
                    {
                        "n_turns": len(g),
                        "n_user": int((g["role"] == "user").sum()),
                        "n_assistant": int((g["role"] == "assistant").sum()),
                        "n_tool": int(g["tool"].notna().sum()),
                        "avg_turn_tokens": round6_scalar(g["toks"].sum() / len(g)),
                    }
                ),
                include_groups=False,
            )
            .reset_index()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        for c in ["n_turns", "n_user", "n_assistant", "n_tool"]:
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(a, exp[cols])


class TestCorpusReport:
    def test_planted_dups_and_partition_invariance(self, ray_session):
        """Per-source card: counts/token stats exact vs pandas, exact-dup
        counting correct with planted duplicate texts straddling batches."""
        import pandas as pd
        import ray.data

        from record_linkage_ldu_ray.pipelines.textstats import corpus_report

        rows = []
        for i in range(40):
            rows.append(("src_a", f"alpha doc {i} body " + "w " * (i % 7)))
        for i in range(30):
            # 10 distinct texts, each repeated 3x -> 20 dup docs in src_b
            rows.append(("src_b", f"beta dup text number {i % 10}"))
        rows.append(("src_c", "solo"))
        t = pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(6)
        cols = [
            "source", "n_docs", "total_tokens", "mean_tokens", "max_tokens",
            "n_short_docs", "n_dup_docs", "dup_frac",
        ]
        a = corpus_report(ds, short_tokens=6, num_parts=3).to_pandas()[cols]
        a = a.sort_values("source").reset_index(drop=True)
        b = corpus_report(ds, short_tokens=6, num_parts=16).to_pandas()[cols]
        b = b.sort_values("source").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

        row_b = a[a.source == "src_b"].iloc[0]
        assert row_b.n_docs == 30 and row_b.n_dup_docs == 20
        assert abs(row_b.dup_frac - round(20 / 30, 6)) < 1e-9
        row_c = a[a.source == "src_c"].iloc[0]
        assert row_c.n_docs == 1 and row_c.n_dup_docs == 0 and row_c.max_tokens == 1
        df = pd.DataFrame(rows, columns=["source", "text"])
        df["nt"] = df.text.str.count(" ") + 1
        exp = df.groupby("source").agg(
            n_docs=("text", "size"), total_tokens=("nt", "sum"), max_tokens=("nt", "max")
        )
        for s in exp.index:
            r = a[a.source == s].iloc[0]
            assert r.n_docs == exp.loc[s, "n_docs"]
            assert r.total_tokens == exp.loc[s, "total_tokens"]
            assert r.max_tokens == exp.loc[s, "max_tokens"]


class TestRoleTransitions:
    def test_no_cross_conv_edges_and_exact_counts(self, ray_session):
        """Within-conv bigrams only: counts match a pandas shift ground
        truth, and the first turn of each conversation contributes no edge."""
        import pandas as pd
        import ray.data

        from record_linkage_ldu_ray.pipelines.relational import role_transition_counts

        rows = []
        rng = np.random.default_rng(13)
        roles = ["user", "assistant", "tool"]
        for c in range(25):
            for t in range(int(rng.integers(1, 9))):
                rows.append((f"c{c:02d}", t, roles[int(rng.integers(0, 3))]))
        t = pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        # repartition(8): conversations straddle blocks; the conv-keyed
        # exchange must reunite them before the shift
        out = (
            role_transition_counts(ray.data.from_arrow(t).repartition(8), num_parts=5)
            .to_pandas()
            .sort_values(["role_from", "role_to"])
            .reset_index(drop=True)
        )
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role"])
        df = df.sort_values(["conv_id", "turn_idx"])
        df["role_from"] = df.groupby("conv_id")["role"].shift(1)
        exp = (
            df.dropna(subset=["role_from"])
            .groupby(["role_from", "role"], as_index=False)
            .size()
            .rename(columns={"role": "role_to", "size": "n"})
            .sort_values(["role_from", "role_to"])
            .reset_index(drop=True)
        )
        exp["n"] = exp["n"].astype("int64")
        pd.testing.assert_frame_equal(
            out[["role_from", "role_to", "n"]], exp[["role_from", "role_to", "n"]]
        )
        assert int(out["n"].sum()) == len(df) - df["conv_id"].nunique()
