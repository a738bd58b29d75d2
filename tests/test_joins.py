"""Partitioned hash join and as-of join unit tests."""

from __future__ import annotations

import pandas as pd
import pytest


class TestHashJoin:
    def test_inner_join_matches_pandas(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": [1, 2, 3, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
        right = pd.DataFrame({"k": [2, 3, 3, 4], "rv": [20, 30, 31, 40]})
        out = hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            key="k", left_cols=["k", "lv"], right_cols=["k", "rv"],
            num_buckets=4,
        ).to_pandas()
        expect = left.merge(right, on="k")
        key = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            out[key].sort_values(key).reset_index(drop=True),
            expect[key].sort_values(key).reset_index(drop=True),
            check_dtype=False,
        )


    def test_left_outer_keeps_unmatched_and_null_left_keys(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": [1.0, 2.0, 3.0, None],
                             "lv": ["a", "b", "c", "d"]})
        right = pd.DataFrame({"k": [2.0, 2.0, None], "rv": [20, 21, 99]})
        out = hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            key="k", left_cols=["k", "lv"], right_cols=["k", "rv"],
            num_buckets=4, how="left",
        ).to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
        # every left row survives; k=2 fans out; NULL left key kept but
        # NEVER matches the NULL right key (rv=99 must not appear)
        assert out["lv"].tolist() == ["a", "b", "b", "c", "d"]
        assert out["rv"].dropna().tolist() == [20, 21]
        assert 99 not in out["rv"].dropna().tolist()
        assert out.loc[out["lv"] == "a", "rv"].isna().all()
        assert out.loc[out["lv"] == "d", "k"].isna().all()

    def test_full_outer_keeps_both_sides_null_keys_never_match(
            self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": [1.0, 2.0, None], "lv": ["a", "b", "c"]})
        right = pd.DataFrame({"k": [2.0, 2.0, 5.0, None],
                              "rv": [20, 21, 50, 99]})
        out = hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            key="k", left_cols=["k", "lv"], right_cols=["k", "rv"],
            num_buckets=4, how="full",
        ).to_pandas()
        # matched: b fans out to (20, 21); unmatched left: a, c (NULL key);
        # unmatched right: 50 and 99 (NULL key) — NULLs never join NULLs
        assert sorted(out["lv"].dropna()) == ["a", "b", "b", "c"]
        assert sorted(out["rv"].dropna().astype(int)) == [20, 21, 50, 99]
        assert len(out) == 6
        assert out.loc[out["rv"] == 99, "lv"].isna().all()
        assert out.loc[out["lv"] == "c", "rv"].isna().all()
        # DuckDB cross-check of the same frame
        import duckdb

        con = duckdb.connect()
        con.register("left_df", left)
        con.register("right_df", right)
        want = con.execute(
            "SELECT l.k AS lk, l.lv, r.k AS rk, r.rv FROM left_df l "
            "FULL OUTER JOIN right_df r ON l.k = r.k").df()
        assert sorted(want["lv"].dropna()) == sorted(out["lv"].dropna())
        assert sorted(want["rv"].dropna()) == sorted(
            out["rv"].dropna().astype(int))

    def test_composite_key_inner_null_component_never_matches(
            self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import hash_join

        left = pd.DataFrame({"a": [1.0, 1.0, None, 2.0],
                             "b": [10.0, 11.0, 10.0, None],
                             "lv": ["x", "y", "z", "w"]})
        right = pd.DataFrame({"a": [1.0, 1.0, None],
                              "b": [10.0, 10.0, 10.0],
                              "rv": [7, 8, 9]})
        out = hash_join(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(2),
            key=["a", "b"], left_cols=["a", "b", "lv"],
            right_cols=["a", "b", "rv"], num_buckets=4,
        ).to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
        # only (1, 10) matches, fanning out to rv 7 and 8; rows with a
        # NULL key component on either side never join
        assert out["lv"].tolist() == ["x", "x"]
        assert sorted(out["rv"].astype(int)) == [7, 8]


class TestAsofJoin:
    def test_backward_asof_matches_pandas(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import asof_join

        left = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00",
                                  "2024-01-01 09:00"]),
            "uid": [1, 1, 2],
            "eid": [100, 101, 102],
        })
        right = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 10:30",
                                  "2024-01-01 12:00"]),
            "uid": [1, 1, 2],
        })
        out = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="ts", by="uid",
            left_cols=["ts", "uid", "eid"], right_cols=["ts", "uid"],
        ).to_pandas().sort_values("eid").reset_index(drop=True)
        # eid 100 (10:00, u1) -> 09:30; eid 101 (11:00, u1) -> 10:30;
        # eid 102 (09:00, u2) -> no preceding right row
        assert out.loc[out["eid"] == 100, "ts_right"].iloc[0] == pd.Timestamp("2024-01-01 09:30")
        assert out.loc[out["eid"] == 101, "ts_right"].iloc[0] == pd.Timestamp("2024-01-01 10:30")
        assert pd.isna(out.loc[out["eid"] == 102, "ts_right"].iloc[0])

    def test_null_keys_and_tolerance(self, ray_session):
        """SQL equality semantics: a NULL-key left row never matches (passes
        through unmatched, LEFT-join style); NULL-key right rows are dropped.
        Tolerance bounds the lookback window."""
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import asof_join

        left = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:00",
                                  "2024-01-01 18:00"]),
            "uid": pd.array([1, None, 1], dtype="Int64"),
            "eid": [100, 101, 102],
        })
        right = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 09:45"]),
            "uid": pd.array([1, None], dtype="Int64"),
        })
        out = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="ts", by="uid",
            left_cols=["ts", "uid", "eid"], right_cols=["ts", "uid"],
        ).to_pandas()
        assert len(out) == 3  # every left row survives exactly once
        by_eid = out.set_index("eid")
        assert by_eid.loc[100, "ts_right"] == pd.Timestamp("2024-01-01 09:30")
        assert pd.isna(by_eid.loc[101, "ts_right"])  # NULL key: unmatched

        # with a 1h tolerance, the 18:00 row's 09:30 match is out of window
        out_tol = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="ts", by="uid",
            left_cols=["ts", "uid", "eid"], right_cols=["ts", "uid"],
            tolerance=pd.Timedelta(hours=1),
        ).to_pandas().set_index("eid")
        assert out_tol.loc[100, "ts_right"] == pd.Timestamp("2024-01-01 09:30")
        assert pd.isna(out_tol.loc[102, "ts_right"])


class TestSkewedHashJoin:
    """Fragment-replicate routing for hot join keys: result is pinned
    identical to pandas.merge whatever the hot/cold split decides."""

    @staticmethod
    def _zipf_frames(n_left=60_000, hot_frac=0.5, n_keys=500, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        n_hot = int(n_left * hot_frac)
        keys = np.concatenate([
            np.full(n_hot, 7, dtype=np.int64),
            rng.integers(1, n_keys + 1, size=n_left - n_hot)])
        left = pd.DataFrame({"k": keys, "lv": np.arange(n_left)})
        right = pd.DataFrame({
            "k": np.repeat(np.arange(1, n_keys + 1), 2).astype("int64"),
            "rv": np.arange(2 * n_keys)})
        return left, right

    def test_matches_pandas_with_planted_hot_key(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            detect_hot_keys,
            skewed_hash_join,
        )

        left, right = self._zipf_frames()
        lds = ray.data.from_pandas(left).repartition(8)
        hot = detect_hot_keys(lds.materialize(), "k", len(left),
                              hot_share=0.05)
        assert 7 in hot and len(hot) == 1  # the planted key, only it

        out = skewed_hash_join(
            lds, ray.data.from_pandas(right).repartition(4),
            key="k", left_cols=["k", "lv"], right_cols=["k", "rv"],
            hot_share=0.05).to_pandas()
        expect = left.merge(right, on="k")
        cols = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            out[cols].sort_values(cols).reset_index(drop=True),
            expect[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False)

    def test_no_hot_keys_falls_back_to_plain_join(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            skewed_hash_join,
        )

        left = pd.DataFrame({"k": list(range(1, 101)) * 3,
                             "lv": list(range(300))})
        right = pd.DataFrame({"k": list(range(1, 151)),
                              "rv": list(range(150))})
        out = skewed_hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            key="k", left_cols=["k", "lv"], right_cols=["k", "rv"],
            hot_share=0.2).to_pandas()
        expect = left.merge(right, on="k")
        cols = ["k", "lv", "rv"]
        pd.testing.assert_frame_equal(
            out[cols].sort_values(cols).reset_index(drop=True),
            expect[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False)

    def test_oversized_hot_fragment_refuses(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            skewed_hash_join,
        )

        left, right = self._zipf_frames(n_left=20_000)
        with pytest.raises(ValueError, match="max_hot_right_rows"):
            skewed_hash_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                key="k", left_cols=["k", "lv"], right_cols=["k", "rv"],
                hot_share=0.05, max_hot_right_rows=1)


class TestAutoJoin:
    def _fixture(self):
        import numpy as np

        rng = np.random.RandomState(7)
        left = pd.DataFrame({
            "k": rng.randint(0, 50, 400).astype("float64"),
            "lv": np.arange(400),
        })
        left.loc[::13, "k"] = None  # nullable int key -> float64 batches
        right = pd.DataFrame({
            "k": np.arange(0, 60, dtype="int64"),
            "rv": np.arange(0, 60) * 10,
            "rw": [f"s{i}" for i in range(60)],
        })
        right.loc[5, "k"] = None
        return left, right

    def _truth(self, left, right, how):
        l2 = left if how == "left" else left[left["k"].notna()]
        r2 = right[right["k"].notna()]
        return (l2.merge(r2, on="k", how=how)
                .sort_values(["lv"]).reset_index(drop=True))

    def _run(self, how, force_exchange, ray_mod):
        from calendar_event_entity_extraction_ray.stages.joins import (
            auto_join,
        )

        left, right = self._fixture()
        l = ray_mod.data.from_pandas(left).repartition(4)
        r = ray_mod.data.from_pandas(right).repartition(2)
        got = auto_join(
            l, r, key="k", left_cols=["k", "lv"],
            right_cols=["k", "rv", "rw"], how=how,
            broadcast_max_rows=(0 if force_exchange else 1000),
        ).to_pandas().sort_values(["lv"]).reset_index(drop=True)
        want = self._truth(left, right, how)
        assert len(got) == len(want)
        for c in ["k", "lv", "rv"]:
            pd.testing.assert_series_equal(
                got[c].astype("float64"), want[c].astype("float64"),
                check_names=False)
        assert got["rw"].fillna("").tolist() == want["rw"].fillna("").tolist()

    def test_broadcast_route_inner_and_left(self, ray_session):
        import ray
        self._run("inner", False, ray)
        self._run("left", False, ray)

    def test_exchange_route_matches_broadcast(self, ray_session):
        import ray
        self._run("inner", True, ray)
        self._run("left", True, ray)

    def test_broadcast_size_guard(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            broadcast_join,
        )

        left, right = self._fixture()
        with pytest.raises(ValueError, match="max_broadcast_rows"):
            broadcast_join(ray.data.from_pandas(left),
                           ray.data.from_pandas(right), key="k",
                           left_cols=["k", "lv"], right_cols=["k", "rv"],
                           max_broadcast_rows=10)
