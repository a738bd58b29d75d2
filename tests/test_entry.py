"""Driver-contract smoke: entry() and the queries()/oracle_sql() shape."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


class TestDriverContract:
    def test_entry_runs(self, ray_session):
        import __ray_entry__ as E

        ds = E.entry()
        n = ds.count()
        assert n > 0
        names = set(ds.schema().names)
        assert {"subj", "pred", "obj", "url"} <= names

    def test_queries_shape(self):
        import __ray_entry__ as E

        qs = E.queries()
        sqls = E.oracle_sql()
        assert len(qs) >= 30
        # every oracle key must have a matching query
        assert set(sqls) <= set(qs)
        # at least 20 SQL-checked
        assert len(sqls) >= 20

    def test_one_query_runs(self, ray_session):
        import __ray_entry__ as E

        df = E.queries()["doc_stats"]("/root/testdata/sf0.001")
        assert df["n_rows"].iloc[0] == 500
