"""S3: events -> (subj, pred, obj) triple explosion — stateless stage.

One triple per non-null slot, one per attendee list element (SURVEY.md §1.4).
``kind`` marks which objects are linkable entities (person/place) so the
linker stage only touches those rows. Duplicate (subj, pred, obj) rows can
only arise WITHIN one event row (two attendee surfaces linking to the same
canonical) because ``subj`` embeds the url — so exact triple dedup is a
per-batch operation downstream, not a shuffle.
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

from calendar_event_entity_extraction_ray import PREDICATES
from calendar_event_entity_extraction_ray import TARGET_KEYS

_KIND = {"attendees": "person", "location": "place"}


def emit_triples_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    subjs = batch.column("event_id").to_pylist()
    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").to_pylist()
    slot_cols = {k: batch.column(k).to_pylist() for k in TARGET_KEYS}

    out: Dict[str, List] = {"subj": [], "pred": [], "obj": [], "kind": [],
                            "url": [], "warc_ts": []}

    def emit(i: int, pred: str, obj: str, kind: str) -> None:
        out["subj"].append(subjs[i])
        out["pred"].append(pred)
        out["obj"].append(obj)
        out["kind"].append(kind)
        out["url"].append(urls[i])
        out["warc_ts"].append(tss[i])

    for i in range(n):
        for k in TARGET_KEYS:
            v = slot_cols[k][i]
            if v is None:
                continue
            if k == "attendees":
                for a in v:
                    if a is not None and str(a).strip():
                        emit(i, PREDICATES[k], str(a), _KIND[k])
            else:
                s = str(v)
                if s.strip():
                    emit(i, PREDICATES[k], s, _KIND.get(k, ""))

    return pa.table(
        {
            "subj": pa.array(out["subj"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "obj": pa.array(out["obj"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "warc_ts": pa.array(out["warc_ts"], pa.timestamp("us")),
        }
    )
