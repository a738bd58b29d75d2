"""Tokenized-feature operator + approach-B renderer + record-shape goldens.

Pins the reference's ``build_feature`` masking semantics (src/data.py:60-222)
over the toy tokenizer, the 4 on-disk record shapes, and the enhanced
renderer (create_enhanced_training_data.py:96-210, 303-313).
"""

import json
import random
from datetime import datetime

import pyarrow as pa
import pytest

from calendar_event_entity_extraction_ray.functions.tokenizer import (
    ASSISTANT_TAG,
    IGNORE_INDEX,
    ToyTokenizer,
    build_feature,
    render_chatml,
    render_chatml_generation_prompt,
)

TOK = ToyTokenizer()


class TestToyTokenizer:
    def test_deterministic_and_piece_regex(self):
        a = TOK.encode("Meet Bob at 9:30!")
        b = ToyTokenizer().encode("Meet Bob at 9:30!")
        assert a == b
        # pieces: Meet Bob at 9 : 30 !
        assert len(a) == 7
        assert TOK.encode("") == []
        assert min(a) >= ToyTokenizer.N_SPECIAL

    def test_prefix_consistency(self):
        """tokenize(prefix) is a prefix of tokenize(prefix + ' ' + rest) —
        the property the reference's prompt-length masking relies on."""
        prefix = "Extract calendar information from: foo bar\nCalendar JSON:"
        full = prefix + " " + json.dumps({"a": 1})
        assert TOK.encode(full)[: len(TOK.encode(prefix))] == TOK.encode(prefix)


class TestBuildFeatureMasking:
    def test_assignment_masks_prompt_only(self):
        prompt = "Extract calendar information from: standup Monday\nCalendar JSON:"
        completion = ' {"action": "standup"}'
        f = build_feature({"prompt": prompt, "completion": completion}, TOK)
        plen = len(TOK.encode(prompt))
        full_ids = TOK.encode(prompt + " " + completion)
        assert f["input_ids"] == full_ids
        assert f["attention_mask"] == [1] * len(full_ids)
        assert f["labels"][:plen] == [IGNORE_INDEX] * plen
        assert f["labels"][plen:] == full_ids[plen:]
        assert all(l != IGNORE_INDEX for l in f["labels"][plen:])

    def test_assignment_truncation_guard_vs_legacy_quirk(self):
        """Reference quirk: branch (a) guards prompt_len < len(labels), the
        legacy branch masks unconditionally (src/data.py:215)."""
        prompt = "one two three four five six seven eight"
        f_a = build_feature(
            {"prompt": prompt, "completion": " x y z"}, TOK, max_length=4)
        assert len(f_a["input_ids"]) == 4
        assert f_a["labels"] == f_a["input_ids"]  # guard skipped the mask
        f_d = build_feature(
            {"prompt": prompt, "response": "x y z"}, TOK, max_length=4)
        assert f_d["labels"] == [IGNORE_INDEX] * 4  # unconditional mask

    def test_messages_masks_user_turn(self):
        msgs = [{"role": "user", "content": "Extract: sync with Ann"},
                {"role": "assistant", "content": '{"action": "sync"}'}]
        f = build_feature({"messages": msgs}, TOK)
        ulen = len(TOK.encode(render_chatml_generation_prompt(msgs)))
        full_ids = TOK.encode(render_chatml(msgs))
        assert f["input_ids"] == full_ids
        assert f["labels"][:ulen] == [IGNORE_INDEX] * ulen
        # assistant JSON + closing tag remain unmasked
        assert f["labels"][ulen:] == full_ids[ulen:]
        assert len(full_ids) > ulen

    def test_chatml_text_equals_messages(self):
        """The ChatML ``text`` shape of the same conversation must produce
        identical features (the reference's fallback renders messages to
        exactly this text)."""
        msgs = [{"role": "user", "content": "Extract: demo Friday"},
                {"role": "assistant", "content": '{"action": "demo"}'}]
        f_m = build_feature({"messages": msgs}, TOK)
        f_t = build_feature({"text": render_chatml(msgs)}, TOK)
        assert f_m == f_t

    def test_chatml_without_assistant_tag_trains_on_everything(self):
        f = build_feature({"text": "no tags here at all"}, TOK)
        assert f["labels"] == f["input_ids"]
        assert IGNORE_INDEX not in f["labels"]

    def test_dispatch_precedence_matches_reference(self):
        """prompt/completion wins over messages wins over text (data.py:27-51)."""
        rec = {"prompt": "p", "completion": "c",
               "messages": [{"role": "user", "content": "u"},
                            {"role": "assistant", "content": "a"}],
               "text": ASSISTANT_TAG + "x<|im_end|>"}
        f = build_feature(dict(rec), TOK)
        assert f["input_ids"] == TOK.encode("p c")
        del rec["prompt"], rec["completion"]
        f = build_feature(dict(rec), TOK)
        assert f["input_ids"] == TOK.encode(render_chatml(rec["messages"]))


class TestTokenizeStage:
    def test_all_four_formats_run_on_ray(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.stages.tokenize import (
            TokenizeRecords,
        )

        def run(fmt, table):
            ds = ray.data.from_arrow(table)
            out = ds.map_batches(
                TokenizeRecords,
                fn_constructor_kwargs={"fmt": fmt, "id_col": "rid"},
                batch_format="pyarrow", concurrency=1,
            ).to_pandas()
            return out.sort_values("rid").reset_index(drop=True)

        a = run("assignment", pa.table({
            "rid": [0, 1],
            "prompt": ["Extract: a\nCalendar JSON:", "Extract: b\nCalendar JSON:"],
            "completion": [' {"action": "a"}', ' {"action": "b"}'],
        }))
        assert list(a.columns) == ["rid", "input_ids", "attention_mask", "labels"]
        assert (a["input_ids"].map(len) == a["labels"].map(len)).all()
        assert IGNORE_INDEX in list(a["labels"][0])

        m = run("messages", pa.table({
            "rid": [0], "user": ["Extract: x"], "assistant": ['{"action":"x"}'],
        }))
        t = run("chatml", pa.table({
            "rid": [0],
            "text": [render_chatml([
                {"role": "user", "content": "Extract: x"},
                {"role": "assistant", "content": '{"action":"x"}'}])],
        }))
        assert list(m["input_ids"][0]) == list(t["input_ids"][0])
        assert list(m["labels"][0]) == list(t["labels"][0])

        l = run("legacy", pa.table({
            "rid": [0], "prompt": ["p:"], "response": ['{"a": 1}'],
        }))
        assert list(l["labels"][0])[: len(TOK.encode("p:"))] == \
            [IGNORE_INDEX] * len(TOK.encode("p:"))


class TestEnhancedRenderer:
    def test_deterministic_and_fills_all_placeholders(self):
        from calendar_event_entity_extraction_ray.functions.render_enhanced import (
            render_enhanced,
        )

        slots = {"action": "team meeting", "date": "03/06/2025",
                 "time": "2:30 PM", "attendees": ["Ann", "Bob", "Cara"],
                 "location": "Room 4", "duration": "45 minutes",
                 "recurrence": None, "notes": None}
        t1 = render_enhanced(slots, random.Random(11))
        t2 = render_enhanced(slots, random.Random(11))
        assert t1 == t2
        assert "{" not in t1 and "}" not in t1
        assert "Ann, Bob, and Cara" in t1
        assert "  " not in t1

    def test_suitable_template_filtering(self):
        """Templates whose placeholders can't be filled are excluded;
        attendees always counts as fillable (defaults to 'the team')."""
        from calendar_event_entity_extraction_ray.functions.render_enhanced import (
            render_enhanced,
        )

        slots = {"action": "sync", "date": "01/02/2025", "time": "9am",
                 "attendees": None, "location": None, "duration": None,
                 "recurrence": None, "notes": None}
        for seed in range(30):
            txt = render_enhanced(slots, random.Random(seed))
            assert "office" not in txt  # {location} templates were filtered out
            assert "{" not in txt

    def test_relative_dates_only_with_today_anchor(self):
        from calendar_event_entity_extraction_ray.functions.render_enhanced import (
            format_date_naturally,
        )

        outs = {format_date_naturally("02/06/2025", random.Random(s))
                for s in range(50)}
        assert "tomorrow" not in outs
        anchored = {format_date_naturally(
            "02/06/2025", random.Random(s), today=datetime(2025, 6, 1))
            for s in range(50)}
        assert "tomorrow" in anchored

    def test_messages_record_golden(self):
        from calendar_event_entity_extraction_ray.functions.render_enhanced import (
            build_messages_record,
        )

        rec = build_messages_record(
            "sync at 9", {"action": "sync", "time": "9:00 AM"})
        user = rec["messages"][0]
        assert user["role"] == "user"
        assert user["content"] == (
            'Extract calendar fields from: "sync at 9".\n'
            "Return ONLY valid JSON with keys "
            "[action,date,time,attendees,location,duration,recurrence,notes].\n"
            "Use null for unknown.")
        payload = json.loads(rec["messages"][1]["content"])
        assert list(payload.keys()) == [
            "action", "date", "time", "attendees", "location",
            "duration", "recurrence", "notes"]
        assert payload["action"] == "sync" and payload["date"] is None

    def test_messages_records_roundtrip_dispatch(self, ray_session):
        """messages/chatml emission shapes round-trip through the 4-way
        dispatch parser (all 4 on-disk record shapes covered end-to-end)."""
        import ray

        from calendar_event_entity_extraction_ray.functions.formats import (
            format_for_base_model,
            parse_record,
        )
        from calendar_event_entity_extraction_ray.sources.readers import (
            to_chatml_text_batch,
            to_messages_batch,
        )

        batch = pa.table({
            "event_text": ["sync at 9"], "action": ["sync"],
            "date": [None], "time": ["9:00 AM"],
            "attendees": pa.array([["Ann"]], pa.list_(pa.string())),
            "location": [None], "duration": [None],
            "recurrence": [None], "notes": [None],
        })
        m = to_messages_batch(batch).to_pylist()[0]
        t = to_chatml_text_batch(batch).to_pylist()[0]
        pm = parse_record(m)
        pt = parse_record(t)
        assert pm is not None and pt is not None
        assert pm[1] == pt[1]  # same assistant JSON either way
        assert json.loads(pm[1])["action"] == "sync"
        # assignment + legacy shapes parse too
        fa = format_for_base_model("sync at 9", {"action": "sync"})
        assert parse_record(fa) is not None
        assert parse_record({"event_text": "sync at 9",
                             "output": {"action": "sync"}}) is not None
