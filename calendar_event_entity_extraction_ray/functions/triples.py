"""Slots -> (subj, pred, obj) triple explosion (S3 kernel).

One triple per non-null slot; the ``attendees`` list explodes to one
``hasAttendee`` triple per element (SURVEY.md §1.4, §2.8 — the reference's
implicit attendee explode at augmentation/entity_pools.py:13-16 generalized).
``subj`` is the deterministic ``event_id = hash(url, event_ordinal)``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

from calendar_event_entity_extraction_ray import PREDICATES, TARGET_KEYS
from calendar_event_entity_extraction_ray.functions.textsig import event_id


def event_to_triples(url: str, ordinal: int, slots: Dict[str, Any]) -> List[Tuple[str, str, str, str]]:
    """Rows of (subj, pred, obj, url)."""
    subj = event_id(url, ordinal)
    out: List[Tuple[str, str, str, str]] = []
    for k in TARGET_KEYS:
        v = slots.get(k)
        if v is None:
            continue
        pred = PREDICATES[k]
        if k == "attendees":
            for a in v:
                if a is not None and str(a).strip():
                    out.append((subj, pred, str(a), url))
        else:
            s = str(v)
            if s.strip():
                out.append((subj, pred, s, url))
    return out
