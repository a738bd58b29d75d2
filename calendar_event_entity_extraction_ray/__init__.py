"""Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the data-processing capabilities of
``muskaanwalia098/Calendar-Event-Entity-Extraction`` (reference read-only at
``/root/reference``): calendar-event slot extraction generalized into
``(subj, pred, obj)`` triple construction over Common-Crawl-style Parquet web
pages, built on ``ray.data.Dataset`` + ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, and explicit shuffle/skew handling.

Layout:
    functions/  pure semantic kernels (no Ray): normalization, extraction,
                metrics, dedup signatures, html->text — pin the reference's
                semantics exactly and serve as the single-process oracle.
    sources/    deterministic synthetic page/fixture generators + readers.
    stages/     Ray Data stage wrappers (stateless map_batches tasks and
                stateful actor-pool classes).
    pipelines/  end-to-end pipelines (kg construction, augmentation,
                evaluation, dedup, text analysis, knn).
    state/      checkpoint manifests, lineage, metrics manifests.
"""

__version__ = "0.1.0"

TARGET_KEYS = [
    "action",
    "date",
    "time",
    "attendees",
    "location",
    "duration",
    "recurrence",
    "notes",
]
"""The reference's canonical 8-slot list (reference: augmentation/utils.py:8)."""

PREDICATES = {
    "action": "hasAction",
    "date": "hasDate",
    "time": "hasTime",
    "attendees": "hasAttendee",
    "location": "hasLocation",
    "duration": "hasDuration",
    "recurrence": "hasRecurrence",
    "notes": "hasNote",
}
"""slot -> predicate mapping for the triple emitter (SURVEY.md §7.1)."""
