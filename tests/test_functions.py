"""Field-level golden cases pinning reference semantics (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from calendar_event_entity_extraction_ray import TARGET_KEYS
from calendar_event_entity_extraction_ray.functions.jsonx import (
    extract_first_json_object,
    safe_json_load,
)
from calendar_event_entity_extraction_ray.functions.metrics import (
    canonicalize,
    compute_field_accuracy,
    exact_match,
    json_valid,
    per_field_f1,
    row_indicators,
)
from calendar_event_entity_extraction_ray.functions.normalize import (
    normalize_date,
    normalize_time,
)
from calendar_event_entity_extraction_ray.functions.schema import (
    canonicalize_output,
    ensure_output_schema_row,
    ensure_schema,
)
from calendar_event_entity_extraction_ray.functions.textsig import (
    event_text_signature,
    record_signature,
)


class TestNormalizeDate:
    """reference: augmentation/main.py:76-84; golden cases from README.md:71,
    augmented.jsonl and train.jsonl rows."""

    def test_ordinal(self):
        assert normalize_date("10th, May 2025") == "10/05/2025"

    def test_iso(self):
        assert normalize_date("2023-12-20") == "20/12/2023"

    def test_dayfirst_disambiguation(self):
        # 05/04/2024 = 5 April under dayfirst=True
        assert normalize_date("05/04/2024") == "05/04/2024"
        assert normalize_date("April 5, 2024") == "05/04/2024"

    def test_garbage_is_none(self):
        assert normalize_date("not a date at all zzz") is None

    def test_empty_and_none(self):
        assert normalize_date("") is None
        assert normalize_date("   ") is None
        assert normalize_date(None) is None


class TestNormalizeTime:
    """reference: augmentation/main.py:87-96 — %I:%M %p then lstrip('0')."""

    def test_4pm(self):
        assert normalize_time("4pm") == "4:00 PM"

    def test_24h(self):
        assert normalize_time("13:00") == "1:00 PM"

    def test_padded(self):
        assert normalize_time("11:00 am") == "11:00 AM"

    def test_lstrip_all_leading_zeros(self):
        # lstrip("0") removes ALL leading zeros — "09:05 AM" -> "9:05 AM"
        assert normalize_time("09:05") == "9:05 AM"

    def test_specials(self):
        assert normalize_time("noon") == "12:00 PM"
        assert normalize_time("midnight") == "12:00 AM"

    def test_garbage_is_none(self):
        assert normalize_time("soonish maybe") is None
        assert normalize_time("") is None
        assert normalize_time(None) is None


class TestSchema:
    def test_canonicalize_output_alias(self):
        # legacy "json" key accepted as alias for "output" (utils.py:28-33)
        r = canonicalize_output({"event_text": " x ", "json": {"action": "call"}})
        assert r["event_text"] == "x"
        assert r["output"]["action"] == "call"
        assert set(r["output"]) == set(TARGET_KEYS)
        assert r["output"]["date"] is None

    def test_ensure_schema_fills_none(self):
        o = ensure_schema({"action": "meet"})
        assert set(o) == set(TARGET_KEYS)
        assert o["notes"] is None

    def test_empty_string_coerced_to_null(self):
        # augmentors.py:51-61
        row = ensure_output_schema_row(
            {"event_text": "t", "output": {"action": "", "location": "  ",
                                           "date": "10/05/2025"}}
        )
        assert row["output"]["action"] is None
        assert row["output"]["location"] is None
        assert row["output"]["date"] == "10/05/2025"


class TestJsonExtraction:
    """reference: src/infer.py:22-48."""

    def test_prompt_echo(self):
        txt = 'Extract calendar JSON: {"action": "call"} thanks'
        assert extract_first_json_object(txt) == '{"action": "call"}'

    def test_trailing_prose(self):
        txt = '{"a": 1}\n\n## markdown continuation'
        assert safe_json_load(txt) == {"a": 1}

    def test_nested_braces(self):
        txt = 'x {"a": {"b": 2}} y {"c": 3}'
        assert extract_first_json_object(txt) == '{"a": {"b": 2}}'

    def test_no_json(self):
        assert extract_first_json_object("nothing here") is None
        assert safe_json_load("nothing here") is None

    def test_unbalanced(self):
        assert extract_first_json_object('{"a": 1') is None

    def test_invalid_json_inside_braces(self):
        assert safe_json_load("{not json}") is None


class TestSignatures:
    def test_event_text_signature(self):
        # augmentors.py:44-48: lowercase, strip, collapse whitespace
        assert event_text_signature("  Hello   World ") == "hello world"
        assert event_text_signature(None) == ""

    def test_record_signature_key_order_insensitive(self):
        a = record_signature("t", {"x": 1, "y": None})
        b = record_signature("t", {"y": None, "x": 1})
        assert a == b

    def test_record_signature_strips_text(self):
        assert record_signature(" t ", {}) == record_signature("t", {})


class TestMetrics:
    def test_canonicalize_lowercases_strings_only(self):
        o = canonicalize({"action": " Meet ", "attendees": ["A"], "date": None})
        assert o["action"] == "meet"
        assert o["attendees"] == ["A"]  # lists untouched (metrics.py:9-17)
        assert o["date"] is None

    def test_json_valid(self):
        assert json_valid({k: None for k in TARGET_KEYS})
        assert not json_valid({"action": None})

    def test_per_field_f1_is_accuracy(self):
        gold = {k: None for k in TARGET_KEYS}
        pred = dict(gold, action="x")
        micro, scores = per_field_f1(pred, gold)
        assert micro == pytest.approx(7 / 8)
        assert scores["action"] == 0.0

    def test_exact_match_case_insensitive(self):
        gold = dict({k: None for k in TARGET_KEYS}, action="Meet")
        pred = dict({k: None for k in TARGET_KEYS}, action="meet")
        assert exact_match(pred, gold)

    def test_field_accuracy_raw_equality(self):
        # loss.py:72-90 variant: NO lowercasing
        gold = dict({k: None for k in TARGET_KEYS}, action="Meet")
        pred = dict({k: None for k in TARGET_KEYS}, action="meet")
        assert compute_field_accuracy(pred, gold) == pytest.approx(7 / 8)

    def test_parse_failure_stays_in_denominator(self):
        gold = {k: None for k in TARGET_KEYS}
        ind = row_indicators(None, gold)
        assert ind["json_validity"] == 0.0
        assert ind["exact_match"] == 0.0
        assert all(ind[f"{k}_accuracy"] == 0.0 for k in TARGET_KEYS)
