"""Late-round-2 operators: quantiles (global/grouped), per-group top-k,
range-join-count, term-df, anti/semi joins (+Bloom), ML stages, pivot,
row windows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestExactQuantiles:
    @pytest.mark.parametrize("case", ["uniform", "point_mass", "two_vals"])
    def test_matches_sorted_rank(self, ray_session, case):
        import ray

        from calendar_event_entity_extraction_ray.stages.quantiles import (
            disc_rank,
            exact_quantiles,
        )

        rng = np.random.RandomState(3)
        arr = {
            "uniform": rng.uniform(-50, 50, 20000),
            # heavy duplicate mass: refinement must converge via the
            # interval-collapse check, not bin splitting
            "point_mass": np.concatenate(
                [np.full(15000, 7.25), rng.normal(0, 1, 5000)]),
            "two_vals": np.where(rng.rand(1000) < 0.5, 1.0, 2.0),
        }[case]
        qs = [0.0, 0.1, 0.5, 0.9, 0.999, 1.0]
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(arr, pa.float64())})).repartition(5)
        got = exact_quantiles(ds, "x", qs, bins=8, collect_cap=64,
                              max_passes=8)
        s = np.sort(arr)
        for q, v in got:
            assert v == s[disc_rank(q, len(s)) - 1]

    def test_nulls_dropped_and_empty(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.quantiles import (
            exact_quantiles,
        )

        ds = ray.data.from_arrow(pa.table({
            "x": pa.array([None, 3.0, None, 1.0, 2.0], pa.float64())}))
        got = exact_quantiles(ds, "x", [0.5])
        assert got == [(0.5, 2.0)]
        empty = ray.data.from_arrow(
            pa.table({"x": pa.array([None], pa.float64())}))
        (q, v), = exact_quantiles(empty, "x", [0.5])
        assert np.isnan(v)


class TestTopKPerGroup:
    def test_ties_and_rank(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            top_k_per_group,
        )

        df = pd.DataFrame({
            "g": ["a"] * 5 + ["b"] * 2,
            "id": [1, 2, 3, 4, 5, 6, 7],
            "v": [10, 10, 10, 9, 8, 1, 2],
        })
        ds = ray.data.from_pandas(df).repartition(3)
        got = (top_k_per_group(ds, "g", "v", 2, "id")
               .to_pandas().sort_values(["g", "rnk"]).reset_index(drop=True))
        # ties broken by id ASC; group b has < k rows -> keeps both
        assert got[["g", "id", "rnk"]].values.tolist() == [
            ["a", 1, 1], ["a", 2, 2], ["b", 7, 1], ["b", 6, 2]]

    def test_null_group_kept(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            top_k_per_group,
        )

        df = pd.DataFrame({"g": ["a", None, None, None],
                           "id": [1, 2, 3, 4], "v": [5, 9, 8, 7]})
        ds = ray.data.from_pandas(df).repartition(2)
        got = top_k_per_group(ds, "g", "v", 2, "id").to_pandas()
        nulls = got[got["g"].isna()]
        assert sorted(nulls["id"].tolist()) == [2, 3]


class TestRangeJoinCount:
    def _ds(self, ray_session, rows, cols):
        import ray

        return ray.data.from_pandas(
            pd.DataFrame(rows, columns=cols)).repartition(2)

    def test_window_bounds_inclusive_exclusive(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.joins import (
            range_join_count,
        )

        t = pd.Timestamp("2025-01-01 12:00:00")
        s = pd.Timedelta("1s")
        left = self._ds(ray_session,
                        [[1, t, 10]], ["event_id", "ts", "user_id"])
        # right at exactly t-5 (lower edge, INcluded), t-1, t (upper
        # edge, EXcluded), t+1 (outside)
        right = self._ds(ray_session,
                         [[t - 5 * s, 10], [t - s, 10], [t, 10],
                          [t + s, 10]], ["ts", "user_id"])
        out = range_join_count(
            left, right, on="ts", by="user_id",
            lo=np.timedelta64(-5, "s"), hi=np.timedelta64(0, "s"),
            left_cols=["event_id"], count_col="n").to_pandas()
        assert out["n"].tolist() == [2]

    def test_left_semantics_and_null_keys(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.joins import (
            range_join_count,
        )

        t = pd.Timestamp("2025-01-01")
        left = self._ds(ray_session,
                        [[1, t, 10.0], [2, t, 99.0], [3, t, None]],
                        ["event_id", "ts", "user_id"])
        right = self._ds(ray_session,
                         [[t - pd.Timedelta("1s"), 10.0],
                          [t - pd.Timedelta("1s"), None]],
                         ["ts", "user_id"])
        out = (range_join_count(
            left, right, on="ts", by="user_id",
            lo=np.timedelta64(-60, "s"), hi=np.timedelta64(0, "s"),
            left_cols=["event_id"], count_col="n")
            .to_pandas().sort_values("event_id"))
        # user 99: no right rows -> 0; NULL-key left row -> 0 (kept);
        # NULL-key right row matches nothing
        assert out["n"].tolist() == [1, 0, 0]


class TestIntervalJoinPairs:
    def _ds(self, rows, cols):
        import ray

        return ray.data.from_pandas(
            pd.DataFrame(rows, columns=cols)).repartition(2)

    def test_pairs_match_pandas_cross(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.joins import (
            interval_join_pairs,
        )

        rng = np.random.RandomState(7)
        t0 = pd.Timestamp("2025-01-01")
        lrows = [[i, t0 + pd.Timedelta(seconds=int(rng.randint(0, 600))),
                  int(rng.randint(0, 5))] for i in range(40)]
        rrows = [[100 + i,
                  t0 + pd.Timedelta(seconds=int(rng.randint(0, 600))),
                  int(rng.randint(0, 5))] for i in range(40)]
        left = self._ds(lrows, ["lid", "ts", "user_id"])
        rds = self._ds(rrows, ["rid", "ts", "user_id"])
        got = interval_join_pairs(
            left, rds, on="ts", by="user_id",
            lo=np.timedelta64(0, "s"), hi=np.timedelta64(60, "s"),
            left_cols=["lid"], right_cols=["rid"]).to_pandas()
        ldf = pd.DataFrame(lrows, columns=["lid", "ts", "user_id"])
        rdf = pd.DataFrame(rrows, columns=["rid", "rts", "user_id"])
        m = ldf.merge(rdf, on="user_id")
        m = m[(m["rts"] >= m["ts"])
              & (m["rts"] < m["ts"] + pd.Timedelta(seconds=60))]
        want = sorted(zip(m["lid"], m["rid"]))
        assert sorted(zip(got["lid"], got["rid"])) == want
        assert len(want) > 0

    def test_null_keys_drop_and_bounds(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.joins import (
            interval_join_pairs,
        )

        t = pd.Timestamp("2025-01-01 12:00:00")
        s = pd.Timedelta("1s")
        left = self._ds([[1, t, 10.0], [2, t, None], [3, None, 10.0]],
                        ["lid", "ts", "user_id"])
        # right at t (lower edge IN), t+4 (in), t+5 (upper edge OUT),
        # one NULL-key row
        right = self._ds([[7, t, 10.0], [8, t + 4 * s, 10.0],
                          [9, t + 5 * s, 10.0], [10, t, None]],
                         ["rid", "ts", "user_id"])
        got = interval_join_pairs(
            left, right, on="ts", by="user_id",
            lo=np.timedelta64(0, "s"), hi=np.timedelta64(5, "s"),
            left_cols=["lid"], right_cols=["rid"]).to_pandas()
        assert sorted(zip(got["lid"], got["rid"])) == [(1, 7), (1, 8)]

    def test_collision_raises(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.joins import (
            interval_join_pairs,
        )

        left = self._ds([[1, 0.0, 1]], ["lid", "ts", "user_id"])
        right = self._ds([[1, 0.0, 1]], ["lid", "ts", "user_id"])
        with pytest.raises(ValueError):
            interval_join_pairs(left, right, on="ts", by="user_id",
                                lo=0.0, hi=1.0,
                                left_cols=["lid"], right_cols=["lid"])


class TestTermDF:
    def test_distinct_per_doc(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.text_analysis import (
            term_document_frequency,
        )

        ds = ray.data.from_pandas(pd.DataFrame({
            "text": ["a a b", "a c", None, "b  c"]})).repartition(2)
        got = term_document_frequency(ds, "text", top_n=10).to_pandas()
        m = dict(zip(got["term"], got["df"].astype(int)))
        # "a a b" counts a ONCE; "b  c" double space yields an empty token
        assert m == {"a": 2, "b": 2, "c": 2, "": 1}


class TestAntiJoin:
    def test_not_exists_semantics(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            anti_join,
        )

        left = ray.data.from_pandas(pd.DataFrame({
            "k": [1.0, 2.0, 3.0, None], "payload": ["a", "b", "c", "d"]}))
        right = ray.data.from_pandas(pd.DataFrame({
            "k": [2.0, None]}))
        got = (anti_join(left, right, "k", ["k", "payload"])
               .to_pandas().sort_values("payload"))
        # k=2 matched -> dropped; NULL left KEPT (NOT EXISTS); NULL right
        # proves nothing
        assert got["payload"].tolist() == ["a", "c", "d"]

    def test_empty_result_keeps_schema(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            anti_join,
        )

        left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2]}))
        right = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
        out = anti_join(left, right, "k", ["k"])
        # Ray quirk: Dataset.to_pandas() on an all-empty dataset drops
        # columns — the dataset-level schema is the contract
        assert out.schema().names == ["k"]
        assert out.count() == 0


class TestMlStages:
    def test_label_centroids_exact(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.ml import (
            label_centroids,
        )

        rng = np.random.RandomState(5)
        vecs = rng.rand(60, 4).astype(np.float32)
        labels = rng.randint(0, 3, 60)
        ds = ray.data.from_arrow(pa.table({
            "v": pa.array([list(map(float, r)) for r in vecs],
                          pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32())})).repartition(4)
        got = label_centroids(ds, "v", "label").to_pandas()
        for lab in range(3):
            expect = vecs[labels == lab].astype(np.float64).mean(axis=0)
            g = got[got["label"] == lab].sort_values("dim")
            assert np.allclose(g["centroid"].to_numpy(), expect, atol=1e-12)

    def test_kmeans_matches_single_process(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.ml import (
            kmeans,
            kmeans_single_process,
        )

        rng = np.random.RandomState(11)
        vecs = rng.rand(200, 8).astype(np.float32)
        ids = rng.permutation(200)
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "v": pa.array([list(map(float, r)) for r in vecs],
                          pa.list_(pa.float32()))})).repartition(5)
        got = kmeans(ds, "v", "vec_id", k=4, iters=3).to_pandas()
        expect = kmeans_single_process(vecs, ids, k=4, iters=3)
        m = dict(zip(got["vec_id"].astype(int), got["cluster"].astype(int)))
        assert m == {int(i): int(c) for i, c in zip(ids, expect)}


class TestGroupedQuantiles:
    def test_matches_per_group_sorted_rank(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.quantiles import (
            disc_rank,
            grouped_quantiles,
        )

        rng = np.random.RandomState(17)
        n = 5000
        groups = rng.choice(["x", "y", None], n, p=[0.6, 0.35, 0.05])
        vals = np.where(rng.rand(n) < 0.4, 7.0, rng.normal(0, 3, n))
        vals[rng.rand(n) < 0.03] = np.nan
        df = pd.DataFrame({"g": groups, "v": vals})
        ds = ray.data.from_pandas(df).repartition(4)
        qs = [0.25, 0.5, 0.95]
        got = grouped_quantiles(ds, "v", "g", qs, bins=8, collect_cap=50,
                                max_passes=8)
        for g, q, v in got:
            mask = df["g"].isna() if pd.isna(g) else (df["g"] == g)
            s = np.sort(df.loc[mask, "v"].dropna().to_numpy())
            assert v == s[disc_rank(q, len(s)) - 1], (g, q)


class TestPartitionedRowWindow:
    def test_seq_and_rolling(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            partitioned_row_window,
        )

        df = pd.DataFrame({
            "u": [1, 1, 1, 1, 2, 2],
            "t": [3, 1, 2, 4, 1, 2],
            "id": [10, 11, 12, 13, 14, 15],
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0],
        })
        ds = ray.data.from_pandas(df).repartition(3)
        got = (partitioned_row_window(
            ds, by="u", order_cols=["t", "id"], value_col="v", rolling=3)
            .to_pandas().sort_values(["u", "seq"]))
        # user 1 t-order: t=1(v2), t=2(v3), t=3(v1), t=4(v4)
        assert got[got["u"] == 1]["roll_sum"].tolist() == [
            2.0, 5.0, 6.0, 8.0]
        assert got[got["u"] == 1]["seq"].tolist() == [1, 2, 3, 4]
        assert got[got["u"] == 2]["roll_sum"].tolist() == [10.0, 30.0]

    def test_first_last_full_partition_frame(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            partitioned_row_window,
        )

        df = pd.DataFrame({
            "u": [1, 1, 1, 2, 2],
            "t": [3, 1, 2, 2, 1],
            "id": [10, 11, 12, 13, 14],
            "v": [100, 200, 300, 10, 20],
        })
        ds = ray.data.from_pandas(df).repartition(2)
        got = (partitioned_row_window(
            ds, by="u", order_cols=["t", "id"], value_col="v",
            first_last=True).to_pandas().sort_values(["u", "seq"]))
        # user 1 t-order: t=1(200), t=2(300), t=3(100)
        assert got[got["u"] == 1]["first_value"].tolist() == [200] * 3
        assert got[got["u"] == 1]["last_value"].tolist() == [100] * 3
        assert got[got["u"] == 2]["first_value"].tolist() == [20, 20]
        assert got[got["u"] == 2]["last_value"].tolist() == [10, 10]

    def test_ntile_remainder_buckets_first(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            partitioned_row_window,
        )

        # n=6,k=4 -> sizes 2,2,1,1; n=2,k=4 -> each row its own bucket
        df = pd.DataFrame({
            "u": [1] * 6 + [2] * 2,
            "t": list(range(6)) + [0, 1],
            "id": list(range(8)),
        })
        got = (partitioned_row_window(
            ray.data.from_pandas(df).repartition(3),
            by="u", order_cols=["t", "id"], ntile=4)
            .to_pandas().sort_values(["u", "seq"]))
        assert got[got["u"] == 1]["ntile"].tolist() == [1, 1, 2, 2, 3, 4]
        assert got[got["u"] == 2]["ntile"].tolist() == [1, 2]

    def test_range_frame_includes_peers_matches_bruteforce(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            partitioned_row_window,
        )

        rng = np.random.RandomState(7)
        n = 4000
        df = pd.DataFrame({
            "u": rng.randint(0, 25, n),
            # coarse grid forces many exact-tie peers
            "t": rng.randint(0, 500, n) * 10,
            "id": np.arange(n),
            "v": rng.randint(-50, 50, n).astype("int64"),
        })
        N = 100
        got = (partitioned_row_window(
            ray.data.from_pandas(df).repartition(5),
            by="u", order_cols=["t", "id"], value_col="v",
            range_preceding=N, range_on="t")
            .to_pandas().set_index("id")["range_sum"])
        # brute-force SQL RANGE semantics: all rows of the key with
        # t in [cur-N, cur], INCLUDING later-row peers
        for _, grp in df.groupby("u"):
            t = grp["t"].to_numpy()
            v = grp["v"].to_numpy()
            for i, rid in enumerate(grp["id"]):
                want = int(v[(t >= t[i] - N) & (t <= t[i])].sum())
                assert got[rid] == want


class TestGlobalRowNumber:
    def test_matches_sorted_order_with_ties_and_nulls(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.sort import (
            global_row_number,
        )

        rng = np.random.RandomState(3)
        n = 20_000
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            # heavy ties: 500 distinct values over 20k rows
            "v": rng.randint(0, 500, n).astype("float64"),
        })
        df.loc[rng.rand(n) < 0.01, "v"] = np.nan
        got = (global_row_number(
            ray.data.from_pandas(df).repartition(8), "v",
            tiebreak_cols=["id"], num_partitions=6)
            .to_pandas().sort_values("id").reset_index(drop=True))
        expect = df.sort_values(["v", "id"], na_position="last",
                                kind="mergesort").reset_index(drop=True)
        expect["rank"] = np.arange(1, n + 1, dtype=np.int64)
        expect = expect.sort_values("id").reset_index(drop=True)
        assert got["rank"].tolist() == expect["rank"].tolist()
        # ranks are a permutation of 1..n
        assert sorted(got["rank"]) == list(range(1, n + 1))


class TestPercentileCont:
    def test_matches_numpy_linear_interpolation(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.quantiles import (
            percentile_cont,
        )

        rng = np.random.RandomState(11)
        v = rng.normal(100, 25, 5000)
        v[rng.rand(5000) < 0.02] = np.nan
        ds = ray.data.from_pandas(pd.DataFrame({"v": v})).repartition(4)
        qs = [0.0, 0.25, 0.5, 0.613, 0.9, 1.0]
        got = percentile_cont(ds, "v", qs, bins=64, collect_cap=200)
        clean = np.sort(v[~np.isnan(v)])
        for q, val in got:
            x = (len(clean) - 1) * q
            lo, hi = int(np.floor(x)), int(np.ceil(x))
            want = clean[lo] + (clean[hi] - clean[lo]) * (x - lo)
            assert val == want, q

    def test_empty_and_single(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.quantiles import (
            percentile_cont,
        )

        empty = ray.data.from_pandas(pd.DataFrame({"v": [np.nan, np.nan]}))
        assert all(np.isnan(val)
                   for _, val in percentile_cont(empty, "v", [0.5]))
        one = ray.data.from_pandas(pd.DataFrame({"v": [7.0]}))
        assert percentile_cont(one, "v", [0.0, 0.5, 1.0]) == [
            (0.0, 7.0), (0.5, 7.0), (1.0, 7.0)]


class TestSemiJoin:
    def test_exists_semantics_and_complement(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            anti_join,
            semi_join,
        )

        left = ray.data.from_pandas(pd.DataFrame({
            "k": [1.0, 2.0, 3.0, None], "p": ["a", "b", "c", "d"]}))
        right = ray.data.from_pandas(pd.DataFrame({"k": [2.0, 3.0, None]}))
        semi = (semi_join(left, right, "k", ["k", "p"])
                .to_pandas().sort_values("p"))
        # NULL-key left DROPPED by EXISTS (can't be proven to match)
        assert semi["p"].tolist() == ["b", "c"]
        anti = anti_join(left, right, "k", ["k", "p"]).to_pandas()
        assert sorted(semi["p"]) + sorted(anti["p"]) == ["b", "c", "a", "d"]


class TestBloomPrefilter:
    def test_bloom_no_false_negatives(self):
        from calendar_event_entity_extraction_ray.functions.bloom import (
            BloomFilter,
        )

        rng = np.random.RandomState(4)
        keys = rng.randint(0, 2**62, 10_000).astype(np.int64)
        f = BloomFilter(n_bits=1 << 18, k=4).add_hashes(keys)
        assert f.contains_hashes(keys).all()
        other = rng.randint(0, 2**62, 10_000).astype(np.int64)
        fp = f.contains_hashes(other).mean()
        assert fp < 0.05  # ~0.6% expected at 16x sizing
        # serialize round-trip + merge
        g = BloomFilter.deserialize(f.serialize(), k=4)
        assert g.contains_hashes(keys).all()
        h = BloomFilter(n_bits=1 << 18, k=4).merge(g)
        assert h.contains_hashes(keys).all()

    def test_joins_identical_with_and_without_bloom(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.joins import (
            anti_join,
            semi_join,
        )

        rng = np.random.RandomState(6)
        left = pd.DataFrame({
            "k": np.append(rng.randint(0, 5000, 3000).astype(float), np.nan),
            "id": np.arange(3001)})
        right = pd.DataFrame({"k": rng.randint(0, 1000, 500).astype(float)})
        lds = ray.data.from_pandas(left).repartition(4)
        rds = ray.data.from_pandas(right).repartition(2)
        for fn in (anti_join, semi_join):
            plain = set(fn(lds, rds, "k", ["id"]).to_pandas()["id"])
            bloomed = set(fn(lds, rds, "k", ["id"],
                             bloom_bits=1 << 16).to_pandas()["id"])
            assert plain == bloomed, fn.__name__


class TestPivotCount:
    def test_matches_crosstab(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            pivot_count,
        )

        rng = np.random.RandomState(8)
        df = pd.DataFrame({
            "u": rng.randint(0, 30, 2000),
            "t": rng.choice(["a", "b", "c"], 2000)})
        ds = ray.data.from_pandas(df).repartition(5)
        got = (pivot_count(ds, "u", "t").to_pandas()
               .sort_values("u").reset_index(drop=True))
        expect = (pd.crosstab(df["u"], df["t"])
                  .rename(columns={c: f"n_{c}" for c in "abc"})
                  .reset_index().rename_axis(None, axis=1))
        pd.testing.assert_frame_equal(
            got.astype("int64"), expect.astype("int64"),
            check_names=False)


class TestGroupedQuantilesAllNullGroup:
    def test_all_nan_group_emitted_as_nan(self, ray_session):
        """SQL GROUP BY emits a group even when every value is NULL
        (quantile NULL) — the operator must not silently drop it."""
        import ray

        from calendar_event_entity_extraction_ray.stages.quantiles import (
            grouped_quantiles,
        )

        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": [1.0, 2.0, np.nan, np.nan]})
        ds = ray.data.from_pandas(df).repartition(2)
        got = grouped_quantiles(ds, "v", "g", [0.5])
        m = {g: v for g, _, v in got}
        assert m["a"] == 1.0   # disc rank max(1, ceil(0.5*2)) = 1
        assert np.isnan(m["b"])


class TestInvertedIndex:
    def test_postings_cap_and_exact_df(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.text_analysis import (
            inverted_index,
        )

        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [5, 1, 3, 2, 4],
            "text": ["x y", "x x z", None, "x", "y x"],
        })).repartition(3)
        got = inverted_index(ds, max_postings=2).to_pandas()
        m = {r["term"]: (int(r["df"]), r["postings"])
             for _, r in got.iterrows()}
        # df is exact even past the cap; postings are the 2 SMALLEST ids
        # merged across batches (partial top-k), ascending
        assert m["x"] == (4, "1,2")
        assert m["y"] == (2, "4,5")
        assert m["z"] == (1, "1")
        assert set(m) == {"x", "y", "z"}


class TestExtremeRowPerGroup:
    def test_matches_sql_argmin(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            extreme_row_per_group,
        )

        rng = np.random.RandomState(11)
        n = 5000
        df = pd.DataFrame({
            "k": rng.randint(0, 200, n),
            "o": rng.randint(0, 40, n),       # many ties per key
            "uid": np.arange(n),
            "payload": rng.randint(-5, 5, n),
        })
        ds = ray.data.from_pandas(df).repartition(7)
        got = extreme_row_per_group(
            ds, ["k"],
            [("o", "ascending"), ("uid", "ascending")]).to_pandas()
        want = (df.sort_values(["o", "uid"], kind="mergesort")
                .drop_duplicates(subset=["k"]).sort_values("k")
                .reset_index(drop=True))
        got = got.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "o", "uid", "payload"]],
            want[["k", "o", "uid", "payload"]])

    def test_nullable_int_value_survives_large_exchange(self, ray_session):
        # >SMALL_ROWS forces the disk exchange; a nullable int64 VALUE
        # column must stay int64 across batches with/without nulls
        # (the pandas round-trip would flip null-bearing batches to
        # float64 and break the exchange concat)
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            extreme_row_per_group,
        )

        n = 120_000
        k = np.arange(n) % 30_000
        v = np.arange(n, dtype=np.int64)
        nullable = pa.array(
            [None if i % 2 else int(i) for i in range(n)], pa.int64())
        t = pa.table({"k": pa.array(k), "v": pa.array(v),
                      "extra": nullable})
        ds = ray.data.from_arrow(t).repartition(16)
        got = extreme_row_per_group(
            ds, ["k"], [("v", "descending")]).to_pandas()
        assert len(got) == 30_000
        # argmax of v per key = key + 3*30_000; extra carries its value
        got = got.sort_values("k").reset_index(drop=True)
        assert (got["v"].to_numpy() == np.arange(30_000) + 90_000).all()
        assert got["extra"].isna().sum() == 15_000

    def test_max_and_null_keys_one_group(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            extreme_row_per_group,
        )

        df = pd.DataFrame({
            "k": ["a", "a", None, None, "b"],
            "o": [1, 5, 2, 9, 3],
            "uid": [0, 1, 2, 3, 4],
        })
        ds = ray.data.from_pandas(df).repartition(3)
        got = extreme_row_per_group(
            ds, ["k"],
            [("o", "descending"), ("uid", "ascending")]).to_pandas()
        m = {("" if pd.isna(r["k"]) else r["k"]): int(r["o"])
             for _, r in got.iterrows()}
        assert m == {"a": 5, "": 9, "b": 3}


class TestNumericHistogram:
    def test_floor_bins_negatives_and_nulls(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            numeric_histogram,
        )

        # -250 -> bin -300 (FLOOR, not truncation); NULL values dropped
        df = pd.DataFrame({"v": [-250, -1, 0, 99, 100, 250, None]})
        ds = ray.data.from_pandas(df).repartition(3)
        got = numeric_histogram(ds, "v", width=100).to_pandas()
        m = {int(r["bin_lo"]): int(r["n"]) for _, r in got.iterrows()}
        assert m == {-300: 1, -100: 1, 0: 2, 100: 1, 200: 1}

    def test_grouped_keeps_null_group(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            numeric_histogram,
        )

        df = pd.DataFrame({
            "g": ["a", "a", None, "b", None],
            "v": [5, 15, 7, None, 23],
        })
        ds = ray.data.from_pandas(df).repartition(2)
        got = numeric_histogram(ds, "v", width=10, by=["g"]).to_pandas()
        rows = {("" if pd.isna(r["g"]) else r["g"], int(r["bin_lo"])):
                int(r["n"]) for _, r in got.iterrows()}
        # NULL v dropped (b vanishes), NULL g kept as its own group
        assert rows == {("a", 0): 1, ("a", 10): 1, ("", 0): 1, ("", 20): 1}


class TestRepetitionSignals:
    def test_edges_and_counts(self):
        from calendar_event_entity_extraction_ray.stages.text_analysis import (
            repetition_batch,
        )

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a b a b a",      # bigrams: ab,ba,ab,ba -> top 2 of 4, 2 distinct
                     "solo",            # < 2 tokens: no row
                     None,              # null text: no row
                     "x x x x"],        # xx,xx,xx -> top 3 of 3, 1 distinct
        })
        out = repetition_batch(t).to_pandas()
        rows = {int(r["doc_id"]): (int(r["top_bigram_n"]), int(r["n_bigrams"]),
                                   int(r["n_distinct_bigrams"]))
                for _, r in out.iterrows()}
        assert rows == {1: (2, 4, 2), 4: (3, 3, 1)}


class TestFullRangeIntKeys:
    def test_grouped_count_hash_valued_keys_large_path(self, ray_session):
        """Keys above 2^53 (hash-valued / snowflake ids) must survive the
        exchange's float64 routing cast (lossy routing is fine — the fold
        groups by the TRUE key; a checked cast used to raise outright)."""
        import numpy as np
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            grouped_count,
        )

        n_keys, reps = 1_000, 120  # 120k rows -> large exchange path
        keys = (np.arange(n_keys, dtype=np.uint64) * np.uint64(
            0x9E3779B97F4A7C15)).view(np.int64)
        df = pd.DataFrame({"k": np.tile(keys, reps)})
        ds = ray.data.from_pandas(df).repartition(8)
        got = grouped_count(ds, "k", out_col="n").to_pandas()
        assert len(got) == n_keys
        assert (got["n"] == reps).all()
        assert set(got["k"]) == set(keys.tolist())


class TestLmFilter:
    def test_distributed_matches_single_process_large_path(self, ray_session):
        """120k docs -> gram partials exceed the exchange small-path cap;
        distributed training + scoring must stay bit-identical to the
        single-process mirror (same kernels, same collision folds)."""
        import numpy as np
        import ray

        from calendar_event_entity_extraction_ray.stages.lmfilter import (
            build_lm_table,
            gram_counts,
            lm_score,
            score_texts,
        )

        vocab = np.array([f"w{i}" for i in range(500)])
        rng = np.random.RandomState(11)
        texts = [" ".join(vocab[rng.randint(0, 500, 12)])
                 for _ in range(120_000)]
        df = pd.DataFrame({"doc_id": np.arange(120_000, dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df).repartition(8)
        train = ray.data.from_pandas(df.iloc[:20_000]).repartition(4)

        got = (lm_score(train, ds).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        uni, bi = gram_counts(df["text"].iloc[:20_000])
        ids, e6, nb = score_texts(df["doc_id"].tolist(),
                                  df["text"].tolist(),
                                  build_lm_table(uni, bi))
        assert np.array_equal(got["doc_id"].to_numpy(), ids)
        assert np.array_equal(got["lm_logp_e6"].to_numpy(), e6)
        assert np.array_equal(got["n_bigrams"].to_numpy(), nb)

    def test_short_and_null_docs_emit_no_row(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.lmfilter import (
            lm_score,
        )

        df = pd.DataFrame({"doc_id": [1, 2, 3],
                           "text": ["a b a", "solo", None]})
        ds = ray.data.from_pandas(df)
        out = lm_score(ds, ds).to_pandas()
        assert out["doc_id"].tolist() == [1]
        assert out["n_bigrams"].tolist() == [2]

    def test_lm_tail_cut_drops_lowest_scorers(self, ray_session):
        import numpy as np
        import ray

        from calendar_event_entity_extraction_ray.stages.lmfilter import (
            build_lm_table,
            gram_counts,
            lm_filter_low_quality,
            score_texts,
        )

        # natural-ish docs repeat bigrams; gibberish docs never do
        rng = np.random.RandomState(5)
        common = ["the cat sat on the mat " * 3 + f"tail{i}"
                  for i in range(160)]
        gibberish = [" ".join(f"g{rng.randint(1e9)}" for _ in range(12))
                     for _ in range(40)]
        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                           "text": common + gibberish})
        ds = ray.data.from_pandas(df).repartition(4)
        out = lm_filter_low_quality(ds, 0.2).to_pandas()
        kept = set(out["doc_id"])
        # exactly the quantile cut survives, and survivors are the
        # top scorers per the single-process mirror
        uni, bi = gram_counts(df["text"])
        ids, e6, nb = score_texts(df["doc_id"].tolist(),
                                  df["text"].tolist(),
                                  build_lm_table(uni, bi))
        ratio = e6 / nb
        order = np.argsort(ratio, kind="stable")
        worst = set(ids[order][: len(ids) - len(kept)].tolist())
        assert kept == set(ids.tolist()) - worst
        assert all(int(i) >= 160 for i in worst)  # gibberish dropped


class TestResampleFill:
    def _mirror(self, df, bucket_s=3600):
        import numpy as np
        import pandas as pd

        d = df.copy()
        # pandas datetime64[ns] -> us, then bucket
        d["bucket"] = (d["ts"].astype("int64") // 1_000) \
            // (bucket_s * 1_000_000)
        d["cents"] = np.floor(d["value"] * 100 + 0.5).astype(np.int64)
        agg = (d.groupby(["user_id", "bucket"])
               .agg(n=("cents", "size"), sv=("cents", "sum"))
               .reset_index())
        rows = []
        for u, g in agg.groupby("user_id"):
            for b in range(int(g["bucket"].min()),
                           int(g["bucket"].max()) + 1):
                hit = g[g["bucket"] == b]
                rows.append((u, b * bucket_s,
                             int(hit["n"].iloc[0]) if len(hit) else 0,
                             int(hit["sv"].iloc[0]) if len(hit) else 0))
        return pd.DataFrame(rows, columns=["user_id", "bucket_ts",
                                           "n_events", "sum_cents"])

    def test_gap_fill_matches_mirror_any_partitioning(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            resample_fill,
        )

        rng = np.random.RandomState(9)
        n = 2_000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 50 * 3600, n), unit="s"),
            "value": rng.uniform(-50, 50, n).round(2),
        })
        want = (self._mirror(df)
                .sort_values(["user_id", "bucket_ts"])
                .reset_index(drop=True))
        for nblocks in (1, 7):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = (resample_fill(ds).to_pandas()
                   .sort_values(["user_id", "bucket_ts"])
                   .reset_index(drop=True)
                   .astype({"user_id": "int64"}))
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_single_event_user_gets_one_row(self, ray_session):
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            resample_fill,
        )

        df = pd.DataFrame({
            "user_id": pd.array([1, 2, 2], dtype="int64"),
            "ts": pd.to_datetime([10, 100, 3600 * 5 + 3], unit="s"),
            "value": [1.0, 2.0, 3.0],
        })
        out = (resample_fill(ray.data.from_pandas(df)).to_pandas()
               .sort_values(["user_id", "bucket_ts"])
               .reset_index(drop=True))
        # user 1: one bucket; user 2: buckets 0..5 with 4 zero gaps
        assert len(out[out["user_id"] == 1]) == 1
        u2 = out[out["user_id"] == 2]
        assert len(u2) == 6
        assert u2["n_events"].tolist() == [1, 0, 0, 0, 0, 1]
        assert u2["sum_cents"].tolist() == [200, 0, 0, 0, 0, 300]


class TestQualityReport:
    def test_planted_violations(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.quality_checks import (
            quality_report,
        )

        df = pd.DataFrame({
            "id": pd.array([1, 2, 3, 4, 4, 6], dtype="int64"),
            "kind": pd.array(["a", "b", "zz", None, "a", "b"],
                             dtype=object),
            "v": pd.array([1.5, -2.0, 3.0, 99.9, 150.0, None],
                          dtype="float64"),
            "u": pd.array([7, None, 7, 8, 9, 10], dtype="Int64"),
        })
        rep = quality_report(
            ray.data.from_pandas(df).repartition(3),
            null_cols=["kind", "v", "u"],
            accepted_values={"kind": ["a", "b"]},
            bounds={"v": (0, 100)},
            unique_cols=["id", "u"],
        )
        got = {(r.check, r.column): r.value for r in rep.itertuples()}
        assert got[("row_count", "*")] == 6
        assert got[("null_count", "kind")] == 1
        assert got[("null_count", "v")] == 1
        assert got[("null_count", "u")] == 1
        assert got[("bad_value_count", "kind")] == 1      # 'zz'
        assert got[("out_of_bounds_count", "v")] == 2     # -2, 150
        assert got[("dup_row_count", "id")] == 1          # 4 twice
        assert got[("dup_row_count", "u")] == 1           # 7 twice


class TestKsDrift:
    def test_matches_scipy_style_mirror(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.drift import (
            ks_drift,
        )

        rng = np.random.RandomState(13)
        a = rng.randint(0, 50, 3000)
        b = np.concatenate([rng.randint(0, 50, 1500),
                            rng.randint(30, 80, 1500)])  # shifted mass
        dsa = ray.data.from_pandas(
            pd.DataFrame({"x": pd.array(a, dtype="int64")})).repartition(4)
        dsb = ray.data.from_pandas(
            pd.DataFrame({"x": pd.array(b, dtype="int64")})).repartition(3)
        ks_num, na, nb, arg = ks_drift(dsa, dsb, "x")
        # mirror: brute ECDF sup on the pooled support
        support = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), support, side="right")
        cb = np.searchsorted(np.sort(b), support, side="right")
        diff = np.abs(ca * len(b) - cb * len(a))
        assert (na, nb) == (len(a), len(b))
        assert ks_num == int(diff.max())
        assert arg == int(support[np.argmax(diff)])
        assert ks_num / (na * nb) > 0.15  # the shift is detected

    def test_identical_distributions_zero_on_shared_sample(
            self, ray_session):
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.drift import (
            ks_drift,
        )

        df = pd.DataFrame({"x": pd.array([1, 2, 2, 3, None],
                                         dtype="Int64")})
        ds = ray.data.from_pandas(df)
        ks_num, na, nb, _ = ks_drift(ds, ds, "x")
        assert ks_num == 0 and na == nb == 4  # NULL dropped


class TestWriteSorted:
    def test_global_order_ranges_and_resume(self, ray_session, tmp_path):
        import glob
        import json
        import os

        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq
        import ray

        from calendar_event_entity_extraction_ray.stages.sort import (
            write_sorted,
        )

        rng = np.random.RandomState(7)
        df = pd.DataFrame({
            "k": rng.uniform(-100, 100, 30_000).round(3),
            "id": np.arange(30_000, dtype=np.int64),
        })
        out = str(tmp_path / "sorted")
        man = write_sorted(
            ray.data.from_pandas(df).repartition(8), "k", out,
            fingerprint="t1", tiebreak_cols=["id"], num_partitions=6)

        # read back in part order -> globally sorted, all rows present
        parts = sorted(man["partitions"], key=int)
        frames = [pq.read_table(os.path.join(
            out, man["partitions"][p]["file"])).to_pandas()
            for p in parts]
        allf = pd.concat(frames, ignore_index=True)
        assert len(allf) == len(df)
        assert (allf["k"].to_numpy() == np.sort(df["k"].to_numpy())).all()
        # ranges recorded (manifest lineage) and non-overlapping
        rng_of = {str(e["part_id"]): (e["min"], e["max"])
                  for e in man["lineage"]}
        los = [rng_of[p][0] for p in parts]
        his = [rng_of[p][1] for p in parts]
        for a_hi, b_lo in zip(his[:-1], los[1:]):
            assert a_hi <= b_lo
        # resume: identical command rewrites nothing
        mtimes = {f: os.path.getmtime(f)
                  for f in glob.glob(out + "/part_key=*/data.parquet")}
        write_sorted(ray.data.from_pandas(df).repartition(8), "k", out,
                     fingerprint="t1", tiebreak_cols=["id"],
                     num_partitions=6)
        for f, t in mtimes.items():
            assert os.path.getmtime(f) == t


class TestCountWindows:
    def _mirror(self, df, n, s):
        import numpy as np
        import pandas as pd

        d = df.sort_values(["user_id", "ts", "event_id"],
                           kind="mergesort").copy()
        d["cents"] = np.floor(d["value"] * 100 + 0.5).astype(np.int64)
        d["rn"] = d.groupby("user_id", dropna=False).cumcount()
        rows = []
        for _, r in d.iterrows():
            rn = int(r["rn"])
            lo = max(0, -((rn - n + 1) // -s))
            for w in range(lo, rn // s + 1):
                rows.append((r["user_id"], w, int(r["cents"])))
        e = pd.DataFrame(rows, columns=["user_id", "window_id", "cents"])
        g = e.groupby(["user_id", "window_id"], dropna=False)
        return (pd.DataFrame({"n_events": g.size(),
                              "sum_cents": g["cents"].sum()})
                .reset_index())

    def _input(self, seed=3, n=500, users=12):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(seed)
        return pd.DataFrame({
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 3600, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.uniform(-20, 20, n).round(2),
        })

    def _run(self, df, **kw):
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            count_windows,
        )

        return (count_windows(ray.data.from_pandas(df).repartition(5), **kw)
                .to_pandas()
                .sort_values(["user_id", "window_id"])
                .reset_index(drop=True)
                .astype({"user_id": "int64"}))

    def test_tumbling_matches_mirror(self, ray_session):
        import pandas as pd

        df = self._input()
        want = (self._mirror(df, 16, 16)
                .sort_values(["user_id", "window_id"])
                .reset_index(drop=True))
        got = self._run(df, n=16)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_sliding_matches_mirror(self, ray_session):
        import pandas as pd

        df = self._input(seed=7)
        want = (self._mirror(df, 16, 4)
                .sort_values(["user_id", "window_id"])
                .reset_index(drop=True))
        got = self._run(df, n=16, slide=4)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_ts_ties_break_on_tiebreak_col(self, ray_session):
        import pandas as pd

        # every ts identical: ordering must follow event_id, so the first
        # tumbling window of 2 holds cents (100, 200), the second (300,)
        df = pd.DataFrame({
            "user_id": pd.array([1, 1, 1], dtype="int64"),
            "ts": pd.to_datetime([5, 5, 5], unit="s"),
            "event_id": pd.array([10, 11, 12], dtype="int64"),
            "value": [1.0, 2.0, 3.0],
        })
        got = self._run(df, n=2)
        assert got["n_events"].tolist() == [2, 1]
        assert got["sum_cents"].tolist() == [300, 300]

    def test_trailing_partial_windows_emitted(self, ray_session):
        # 5 events, size 4 slide 2 -> windows at rn 0 (4 events),
        # 2 (3 events), 4 (1 event)
        import numpy as np
        import pandas as pd

        df = pd.DataFrame({
            "user_id": pd.array([1] * 5, dtype="int64"),
            "ts": pd.to_datetime(np.arange(5), unit="s"),
            "event_id": np.arange(5, dtype=np.int64),
            "value": [1.0] * 5,
        })
        got = self._run(df, n=4, slide=2)
        assert got["window_id"].tolist() == [0, 1, 2]
        assert got["n_events"].tolist() == [4, 3, 1]

    def test_bad_slide_raises(self, ray_session):
        import pytest
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            count_windows,
        )

        ds = ray.data.from_pandas(self._input(n=4))
        with pytest.raises(ValueError):
            count_windows(ds, n=4, slide=8)
        with pytest.raises(ValueError):
            count_windows(ds, n=4, slide=0)


class TestDecayedCounts:
    def test_matches_mirror_and_cap(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            decayed_counts,
        )

        rng = np.random.RandomState(4)
        n = 1_000
        # spread far enough back that some events hit the cap (k > 30
        # at 1 h half-life needs > 30 h of history)
        secs = rng.randint(0, 3600 * 200, n)
        df = pd.DataFrame({
            "user_id": rng.randint(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime(secs, unit="s"),
        })
        ref_us = int(df["ts"].max().value // 1_000)
        hl_us = 3_600_000_000
        # calendar-aligned buckets: floor(ref/hl) - floor(ts/hl)
        k = np.minimum(ref_us // hl_us
                       - (df["ts"].astype("int64") // 1_000) // hl_us, 30)
        assert (k == 30).any()  # the cap actually engages
        w = np.left_shift(np.int64(1),
                          (30 - k).to_numpy(np.int64)).astype(np.int64)
        want = (pd.DataFrame({"user_id": df["user_id"], "w": w})
                .groupby("user_id")
                .agg(n_events=("w", "size"), decayed_num=("w", "sum"))
                .reset_index())
        for nblocks in (1, 7):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = (decayed_counts(ds, "user_id", "ts", ref_us,
                                  half_life_hours=1)
                   .to_pandas()
                   .sort_values("user_id").reset_index(drop=True)
                   .astype({"user_id": "int64"})
                   [["user_id", "n_events", "decayed_num"]])
            pd.testing.assert_frame_equal(
                got, want.sort_values("user_id").reset_index(drop=True),
                check_dtype=False)

    def test_event_at_ref_weighs_full(self, ray_session):
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.windows import (
            decayed_counts,
        )

        df = pd.DataFrame({
            "user_id": pd.array([1, 1], dtype="int64"),
            # one event AT the reference (k=0 -> 2^30), one exactly one
            # half-life back (k=1 -> 2^29)
            "ts": pd.to_datetime([48 * 3600, 0], unit="s"),
        })
        ref_us = 48 * 3600 * 1_000_000
        out = decayed_counts(ray.data.from_pandas(df), "user_id", "ts",
                             ref_us).to_pandas()
        assert out["decayed_num"].tolist() == [(1 << 30) + (1 << 29)]


class TestPmiTermPairs:
    def test_matches_brute_force(self, ray_session):
        import math

        import ray

        from calendar_event_entity_extraction_ray.stages.text_analysis import (
            pmi_term_pairs,
        )

        docs = ["a b c", "a b", "a c", "b c", "a", None, "d d a"]
        ds = ray.data.from_pandas(
            pd.DataFrame({"text": docs})).repartition(3)
        got = pmi_term_pairs(ds, top_n=3).to_dict("records")
        # top-3 by (df desc, term): a(5) b(3) c(3)
        n = len(docs)
        truth = {}
        sets = [set(t.split(" ")) for t in docs if t is not None]
        df = {w: sum(w in s for s in sets) for w in "abc"}
        for x, y in [("a", "b"), ("a", "c"), ("b", "c")]:
            dab = sum(x in s and y in s for s in sets)
            truth[(x, y)] = (dab, math.floor(
                math.log(dab * n / (df[x] * df[y])) * 1e6 + 0.5))
        assert {(r["term_a"], r["term_b"]): (r["df_ab"], r["pmi_e6"])
                for r in got} == truth

    def test_no_pairs_yields_empty_frame_with_schema(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.text_analysis import (
            pmi_term_pairs,
        )

        ds = ray.data.from_pandas(pd.DataFrame({"text": ["a", "b"]}))
        out = pmi_term_pairs(ds, top_n=2)
        assert list(out.columns) == ["term_a", "term_b", "df_ab", "pmi_e6"]
        assert len(out) == 0
