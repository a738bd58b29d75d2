"""PII redaction (stages/redact.py): RE2 kernel scrubbing + counts."""

import pyarrow as pa


class TestRedact:
    def test_categories_tokens_and_counts(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.redact import (
            redact_pii,
        )

        rows = [
            {"id": 1, "text": "mail a.b+c@foo-bar.example.com now"},
            {"id": 2, "text": "call +1-202-555-0199 or 44-020-794-0123"},
            {"id": 3, "text": "host 192.168.0.1 and 10.0.0.255"},
            {"id": 4, "text": "clean text, no pii at all"},
            {"id": 5, "text": "x@y.io via 8.8.8.8 ring 1-555-123-4567"},
        ]
        out = (redact_pii(ray.data.from_arrow(pa.Table.from_pylist(rows)))
               .to_pandas().set_index("id").sort_index())
        assert out.loc[1, "clean_text"] == "mail <EMAIL> now"
        assert out.loc[1, ["n_email", "n_phone", "n_ipv4"]].tolist() == \
            [1, 0, 0]
        assert out.loc[2, "clean_text"] == "call <PHONE> or <PHONE>"
        assert out.loc[2, "n_phone"] == 2
        assert out.loc[3, "clean_text"] == "host <IP> and <IP>"
        assert out.loc[3, "n_ipv4"] == 2
        assert out.loc[4, "clean_text"] == rows[3]["text"]
        assert out.loc[5, "clean_text"] == "<EMAIL> via <IP> ring <PHONE>"

    def test_matches_duckdb_re2(self, ray_session):
        """Same patterns through DuckDB's regexp_replace(..., 'g') —
        both engines are RE2, outputs must be byte-identical."""
        import duckdb
        import pandas as pd

        import ray

        from calendar_event_entity_extraction_ray.stages.redact import (
            PII_RULES,
            redact_pii,
        )

        texts = [
            "a@b.co c@d.museum 1.2.3.4 +49-555-123-0000",
            "no-at-sign 999.999.999.999 still an ip shape",
            "e.f@g.h.i.jj tail 1-2-3-4 not a phone",
            "boundary10.0.0.1x no ip match wanted",
        ]
        df = pd.DataFrame({"id": range(len(texts)), "text": texts})
        got = (redact_pii(ray.data.from_pandas(df)).to_pandas()
               .sort_values("id")["clean_text"].tolist())
        con = duckdb.connect()
        con.register("t", df)
        sql = "text"
        for _, pattern, token in PII_RULES:
            # DuckDB standard strings keep backslashes literal, so the
            # pattern passes to RE2 unmodified
            sql = f"regexp_replace({sql}, '{pattern}', '{token}', 'g')"
        want = [r[0] for r in con.execute(
            f"SELECT {sql} FROM t ORDER BY id").fetchall()]
        assert got == want
