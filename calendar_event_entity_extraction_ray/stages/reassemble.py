"""S5': subject-grouped canonicalization shuffle — triples -> event view.

The north-star's ``groupby(subj).aggregate`` canonicalization: all triples
of one subject are co-located by a hash shuffle on ``subj`` and folded back
into the 8-slot event record (the exact inverse of the S3 explode). Because
``subj`` is a uniform hash id, the groupby key cannot skew — hub-entity
skew lives on ``obj`` and is handled by the salted degree aggregate
(stages/aggregate.py:entity_degree) instead.

Round-trip invariant (tested): reassemble(emit(events)) == events.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from calendar_event_entity_extraction_ray import PREDICATES, TARGET_KEYS

_PRED_TO_SLOT = {v: k for k, v in PREDICATES.items()}


def reassemble_events(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """(subj, pred, obj, url) -> one row per subject with the 8 slots;
    ``attendees`` re-collects into a list (sorted for determinism — the
    original list order is not represented in the graph). Pure-Arrow group
    fold: ragged list columns must not round-trip through pandas."""

    def fold(g: pa.Table) -> pa.Table:
        row = {k: None for k in TARGET_KEYS}
        atts = []
        for pred, obj in zip(g.column("pred").to_pylist(),
                             g.column("obj").to_pylist()):
            slot = _PRED_TO_SLOT.get(pred)
            if slot is None:
                continue
            if slot == "attendees":
                atts.append(obj)
            else:
                row[slot] = obj
        cols = {
            "event_id": pa.array([g.column("subj")[0].as_py()], pa.string()),
            "url": pa.array([g.column("url")[0].as_py()], pa.string()),
        }
        for k in TARGET_KEYS:
            if k == "attendees":
                cols[k] = pa.array([sorted(atts) if atts else None],
                                   pa.list_(pa.string()))
            else:
                cols[k] = pa.array([row[k]], pa.string())
        return pa.table(cols)

    return triples.groupby("subj").map_groups(fold, batch_format="pyarrow")
