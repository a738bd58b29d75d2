"""Format dispatch, prompt builders, JSONL round-trip."""

from __future__ import annotations

import json

import pandas as pd

from calendar_event_entity_extraction_ray.functions.formats import (
    build_chatml_prompt,
    build_few_shot_prompt,
    build_prompt,
    build_simple_prompt,
    format_for_base_model,
    parse_record,
    strip_prompt_echo,
)


class TestPrompts:
    def test_default_prompt_flattens_newlines(self):
        p = build_prompt("line one\nline two")
        assert p == "Extract calendar information from: line one line two\nCalendar JSON:"

    def test_simple(self):
        assert build_simple_prompt("x") == "Text: x\nJSON:"

    def test_few_shot(self):
        p = build_few_shot_prompt("q", examples=[("a", '{"x":1}')])
        assert p.count("Extract calendar information from:") == 2
        assert '{"x":1}' in p

    def test_chatml(self):
        p = build_chatml_prompt("hello")
        assert p.startswith("<|im_start|>user\n")
        assert p.endswith("<|im_start|>assistant\n")

    def test_echo_strip_roundtrip(self):
        assert strip_prompt_echo(build_prompt("my event text")) == "my event text"


class TestFormatForBaseModel:
    def test_shape(self):
        out = format_for_base_model("t", {"action": "call"})
        assert out["prompt"].startswith("Extract calendar information from: t")
        assert out["completion"].startswith(" {")
        assert out["full_text"] == out["prompt"] + out["completion"]


class TestParseRecord:
    def test_prompt_completion(self):
        assert parse_record({"prompt": "p", "completion": " c "}) == ("p", "c")

    def test_messages(self):
        rec = {"messages": [
            {"role": "user", "content": "u"},
            {"role": "assistant", "content": "a"},
        ]}
        assert parse_record(rec) == ("u", "a")

    def test_chatml_text(self):
        rec = {"text": "<|im_start|>user\nU<|im_end|>\n<|im_start|>assistant\nA<|im_end|>"}
        assert parse_record(rec) == ("U", "A")

    def test_legacy_event_text(self):
        rec = {"event_text": "e", "output": {"action": "x"}}
        p, c = parse_record(rec)
        assert "e" in p
        assert json.loads(c) == {"action": "x"}

    def test_legacy_json_alias(self):
        p, c = parse_record({"event_text": "e", "json": {"a": 1}})
        assert json.loads(c) == {"a": 1}

    def test_unknown_none(self):
        assert parse_record({"foo": 1}) is None


class TestJsonlRoundtrip:
    def test_load_records(self, ray_session, tmp_path):
        import ray

        from calendar_event_entity_extraction_ray.sources.readers import (
            load_records,
            write_jsonl,
        )

        rows = [
            {"prompt": "p1", "completion": "c1"},
            {"prompt": "p2", "completion": "c2"},
        ]
        path = tmp_path / "recs"
        write_jsonl(ray.data.from_items(rows), str(path))
        out = load_records(str(path)).to_pandas().sort_values("prompt_text")
        assert out["prompt_text"].tolist() == ["p1", "p2"]
        assert out["completion_text"].tolist() == ["c1", "c2"]


class TestSourceFormatRoundtrips:
    def test_csv_and_jsonl_roundtrip_parquet(self, ray_session, tmp_path):
        """Source-format breadth: the same table read back from CSV and
        JSON files via Ray's native readers matches the parquet source
        (documents columns that survive CSV's type system)."""
        import ray

        src = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "lang", "n_chars"])
        expect = src.to_pandas().sort_values("doc_id").reset_index(drop=True)

        csv_dir = str(tmp_path / "csv")
        src.write_csv(csv_dir)
        got_csv = (ray.data.read_csv(csv_dir).to_pandas()
                   .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got_csv[expect.columns].astype(expect.dtypes.to_dict()), expect)

        json_dir = str(tmp_path / "json")
        src.write_json(json_dir)
        got_json = (ray.data.read_json(json_dir).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got_json[expect.columns].astype(expect.dtypes.to_dict()), expect)
