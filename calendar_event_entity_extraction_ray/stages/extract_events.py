"""S2: grammar event extraction — stateful actor-pool stage.

The reference's analogue is the fine-tuned-LLM decode loop hosted per
process (src/infer.py:52-96); here the "model" is the compiled regex grammar
plus memoized dateutil normalization (functions/extract.py), compiled ONCE
per actor in ``__init__`` and reused across batches. The lru caches on
``normalize_date``/``normalize_time`` are per-process, i.e. per actor —
repeated surface forms (web text repeats heavily) hit the cache.

Output: one row per extracted event, carrying ``(event_id, url, warc_ts,
event_ordinal, <8 slots>)``. ``warc_ts`` rides along only for the
deterministic first-wins ordering of the downstream dedup.
"""

from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from calendar_event_entity_extraction_ray import TARGET_KEYS
from calendar_event_entity_extraction_ray.functions.extract import EventGrammar
from calendar_event_entity_extraction_ray.functions.textsig import event_id


class ExtractEvents:
    """map_batches(ExtractEvents, concurrency=N, batch_size=B) actor."""

    def __init__(self) -> None:
        self.grammar = EventGrammar()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        texts = batch.column("text").to_pylist()

        cols: Dict[str, List[Any]] = {
            "event_id": [], "url": [], "warc_ts": [], "event_ordinal": [],
            **{k: [] for k in TARGET_KEYS},
        }
        for url, ts, text in zip(urls, tss, texts):
            for ev in self.grammar.extract_page(text or ""):
                ordinal = ev.pop("event_ordinal")
                cols["event_id"].append(event_id(url, ordinal))
                cols["url"].append(url)
                cols["warc_ts"].append(ts)
                cols["event_ordinal"].append(ordinal)
                for k in TARGET_KEYS:
                    cols[k].append(ev.get(k))

        return pa.table(
            {
                "event_id": pa.array(cols["event_id"], pa.string()),
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "event_ordinal": pa.array(cols["event_ordinal"], pa.int32()),
                "action": pa.array(cols["action"], pa.string()),
                "date": pa.array(cols["date"], pa.string()),
                "time": pa.array(cols["time"], pa.string()),
                "attendees": pa.array(cols["attendees"], pa.list_(pa.string())),
                "location": pa.array(cols["location"], pa.string()),
                "duration": pa.array(cols["duration"], pa.string()),
                "recurrence": pa.array(cols["recurrence"], pa.string()),
                "notes": pa.array(cols["notes"], pa.string()),
            }
        )
