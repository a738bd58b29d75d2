"""SQL set operators (stages/setops.py) and PERCENT_RANK
(stages/windows.py percent=True)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(rows, schema=None):
    import ray

    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def _got(out, cols):
    df = out.to_pandas()
    if df.empty:
        # all-empty Dataset.to_pandas() drops columns (CLAUDE.md);
        # assert the schema knows them instead
        assert list(out.schema().names) == cols
        return set()
    return set(map(tuple, df[cols].itertuples(index=False)))


class TestSetOps:
    def test_distinct_bag_semantics(self, ray_session):
        """Inputs are bags (duplicates); outputs are DISTINCT sets."""
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        left = _ds([{"k": v} for v in [1, 1, 2, 2, 3, 3, 3]])
        right = _ds([{"k": v} for v in [2, 2, 4, 4]])
        assert _got(set_op(left, right, ["k"], "union"),
                    ["k"]) == {(1,), (2,), (3,), (4,)}
        assert _got(set_op(left, right, ["k"], "intersect"),
                    ["k"]) == {(2,)}
        assert _got(set_op(left, right, ["k"], "except"),
                    ["k"]) == {(1,), (3,)}
        # asymmetric: right EXCEPT left
        assert _got(set_op(right, left, ["k"], "except"),
                    ["k"]) == {(4,)}

    def test_null_members_compare_equal(self, ray_session):
        """SQL set ops treat NULL as an equal member (unlike joins)."""
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        schema = pa.schema([("k", pa.string())])
        left = _ds([{"k": "a"}, {"k": None}, {"k": None}], schema)
        right = _ds([{"k": None}, {"k": "b"}], schema)
        got = set_op(left, right, ["k"], "intersect").to_pandas()
        assert len(got) == 1 and got["k"].isna().all()
        exc = set_op(left, right, ["k"], "except").to_pandas()
        assert list(exc["k"]) == ["a"]

    def test_multi_column_element(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        left = _ds([{"a": 1, "b": "x"}, {"a": 1, "b": "y"},
                    {"a": 2, "b": "x"}])
        right = _ds([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
        assert _got(set_op(left, right, ["a", "b"], "intersect"),
                    ["a", "b"]) == {(1, "x")}
        assert _got(set_op(left, right, ["a", "b"], "except"),
                    ["a", "b"]) == {(1, "y"), (2, "x")}

    def test_empty_result_and_empty_inputs(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        left = _ds([{"k": 1}, {"k": 2}])
        right = _ds([{"k": 3}])
        assert _got(set_op(left, right, ["k"], "intersect"),
                    ["k"]) == set()
        schema = pa.schema([("k", pa.int64())])
        empty = _ds([], schema)
        assert _got(set_op(empty, right, ["k"], "union"),
                    ["k"]) == {(3,)}
        assert _got(set_op(left, empty, ["k"], "except"),
                    ["k"]) == {(1,), (2,)}

    def test_matches_duckdb_on_random_bags(self, ray_session):
        import duckdb

        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        rng = np.random.RandomState(7)
        l = pd.DataFrame({"k": rng.randint(0, 40, 500)})
        r = pd.DataFrame({"k": rng.randint(20, 60, 500)})
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        for op, sql in [("union", "UNION"), ("intersect", "INTERSECT"),
                        ("except", "EXCEPT")]:
            want = set(con.execute(
                f"SELECT k FROM l {sql} SELECT k FROM r").fetchdf()["k"]
                .astype("int64"))
            got = {t[0] for t in _got(
                set_op(_ds(l.to_dict("records")),
                       _ds(r.to_dict("records")), ["k"], op), ["k"])}
            assert got == want, op

    def test_bad_op_raises(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        with pytest.raises(ValueError):
            set_op(_ds([{"k": 1}]), _ds([{"k": 1}]), ["k"], "minus")


class TestPercentRank:
    def test_matches_formula_and_singletons(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.windows import (
            partitioned_row_window,
        )

        rows = ([{"g": "a", "v": v, "i": i}
                 for i, v in enumerate([5, 3, 3, 9, 1])]
                + [{"g": "solo", "v": 7, "i": 99}])
        out = partitioned_row_window(
            _ds(rows), by="g", order_cols=["v", "i"],
            rank_on="v", percent=True).to_pandas()
        a = out[out["g"] == "a"].set_index("i")
        # values 1,3,3,5,9 -> ranks 1,2,2,4,5 -> prank (r-1)/4
        assert a.loc[4, "percent_rank"] == 0.0
        assert a.loc[1, "percent_rank"] == 0.25
        assert a.loc[2, "percent_rank"] == 0.25
        assert a.loc[0, "percent_rank"] == 0.75
        assert a.loc[3, "percent_rank"] == 1.0
        solo = out[out["g"] == "solo"]
        assert list(solo["percent_rank"]) == [0.0]


class TestSetOpsAll:
    def test_bag_multiplicities(self, ray_session):
        """INTERSECT ALL = min(l, r) copies; EXCEPT ALL = max(l-r, 0);
        UNION ALL = plain concatenation."""
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        left = _ds([{"k": v} for v in [1, 1, 1, 2, 3]])
        right = _ds([{"k": v} for v in [1, 2, 2, 4]])
        ia = sorted(set_op(left, right, ["k"], "intersect_all")
                    .to_pandas()["k"])
        assert ia == [1, 2]
        ea = sorted(set_op(left, right, ["k"], "except_all")
                    .to_pandas()["k"])
        assert ea == [1, 1, 3]
        ua = sorted(set_op(left, right, ["k"], "union_all")
                    .to_pandas()["k"])
        assert ua == [1, 1, 1, 1, 2, 2, 2, 3, 4]

    def test_all_variants_match_duckdb(self, ray_session):
        import collections

        import duckdb

        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        rng = np.random.RandomState(13)
        l = pd.DataFrame({"k": rng.randint(0, 30, 400)})
        r = pd.DataFrame({"k": rng.randint(10, 40, 400)})
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        for op, sql in [("union_all", "UNION ALL"),
                        ("intersect_all", "INTERSECT ALL"),
                        ("except_all", "EXCEPT ALL")]:
            want = collections.Counter(con.execute(
                f"SELECT k FROM l {sql} SELECT k FROM r").fetchdf()["k"]
                .astype("int64"))
            got = collections.Counter(
                set_op(_ds(l.to_dict("records")),
                       _ds(r.to_dict("records")),
                       ["k"], op).to_pandas()["k"].astype("int64"))
            assert got == want, op

    def test_all_multiplicity_survives_pre_distinct_off(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.setops import (
            set_op,
        )

        left = _ds([{"k": 7}] * 5)
        right = _ds([{"k": 7}] * 3)
        for pd_flag in (True, False):
            got = set_op(left, right, ["k"], "intersect_all",
                         pre_distinct=pd_flag).to_pandas()
            assert list(got["k"]) == [7, 7, 7], pd_flag
