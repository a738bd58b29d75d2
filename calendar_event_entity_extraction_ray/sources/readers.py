"""Readers/sinks: JSONL + format-dispatching record parser.

Reference: ``read_jsonl``/``write_jsonl`` (augmentation/utils.py:11-25) and
the 4-way-dispatch ``CalendarJsonDataset`` loader (src/data.py:17-51) as Ray
Data sources. Reads prune to the record columns; the dispatch parser runs as
a vectorized ``map_batches`` after ``read_json``.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data

from calendar_event_entity_extraction_ray.functions.formats import parse_record


def read_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """JSONL -> Dataset (blank lines are skipped by the Arrow JSON reader)."""
    return ray.data.read_json(path, **kwargs)


def write_jsonl(ds: "ray.data.Dataset", path: str, **kwargs) -> None:
    ds.write_json(path, **kwargs)


def parse_records_batch(batch: pa.Table) -> pa.Table:
    """Any supported record shape -> (prompt_text, completion_text) rows.
    Unparseable records are dropped (the reference raises; a 10^12-row
    pipeline drops and counts instead)."""
    rows = batch.to_pylist()
    prompts, completions = [], []
    for rec in rows:
        pc_pair = parse_record(rec)
        if pc_pair is None:
            continue
        prompts.append(pc_pair[0])
        completions.append(pc_pair[1])
    return pa.table({
        "prompt_text": pa.array(prompts, pa.string()),
        "completion_text": pa.array(completions, pa.string()),
    })


def load_records(path: str) -> "ray.data.Dataset":
    """read_json + 4-way dispatch -> unified (prompt_text, completion_text)."""
    return read_jsonl(path).map_batches(parse_records_batch, batch_format="pyarrow")


_MESSAGE_TYPE = pa.list_(pa.struct([("role", pa.string()),
                                    ("content", pa.string())]))


def to_messages_batch(batch: pa.Table, text_col: str = "event_text") -> pa.Table:
    """(event_text + 8 slot columns) -> chat ``messages`` training records —
    the reference's enhanced-training-data on-disk shape
    (create_enhanced_training_data.py:303-313). write_jsonl of the result
    round-trips through the 4-way dispatch reader."""
    from calendar_event_entity_extraction_ray.functions.render_enhanced import (
        build_messages_record,
    )

    rows = batch.to_pylist()
    msgs = [build_messages_record(r.get(text_col) or "", r)["messages"]
            for r in rows]
    return pa.table({"messages": pa.array(msgs, _MESSAGE_TYPE)})


def to_chatml_text_batch(batch: pa.Table, text_col: str = "event_text") -> pa.Table:
    """Same records rendered as the legacy ChatML ``text`` shape
    (src/data.py:38-40)."""
    from calendar_event_entity_extraction_ray.functions.render_enhanced import (
        build_messages_record,
    )
    from calendar_event_entity_extraction_ray.functions.tokenizer import (
        render_chatml,
    )

    rows = batch.to_pylist()
    texts = [render_chatml(
        build_messages_record(r.get(text_col) or "", r)["messages"])
        for r in rows]
    return pa.table({"text": pa.array(texts, pa.string())})
