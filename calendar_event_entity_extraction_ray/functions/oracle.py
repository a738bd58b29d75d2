"""Single-process oracle emitter (SURVEY.md §7.2 step 3).

Runs the full reference-semantics extraction chain — html->text, language
filter, grammar extraction, date/time normalization, entity linking, triple
explosion, exact first-wins dedup by (url, warc_ts) order — in plain Python
over a pages table. This is both the pytest oracle and the P/R reference for
the distributed pipeline (BASELINE.md correctness gate).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

from calendar_event_entity_extraction_ray.functions.extract import EventGrammar
from calendar_event_entity_extraction_ray.functions.htmltext import html_to_text
from calendar_event_entity_extraction_ray.functions.linking import EntityLinker
from calendar_event_entity_extraction_ray.functions.triples import event_to_triples


def oracle_triples(
    pages: Iterable[Dict[str, Any]],
    use_html: bool = True,
    link: bool = True,
) -> List[Tuple[str, str, str, str]]:
    """pages: iterable of {url, warc_ts, html, text, lang} dicts.

    Returns deduped (subj, pred, obj, url) rows. Pages are processed in
    (warc_ts, url) order so first-wins dedup is deterministic.
    """
    grammar = EventGrammar()
    linker = EntityLinker() if link else None
    rows = sorted(pages, key=lambda p: (p["warc_ts"], p["url"]))
    seen = set()
    out: List[Tuple[str, str, str, str]] = []
    for p in rows:
        if p.get("lang") != "en":
            continue
        text = html_to_text(p["html"]) if use_html else (p.get("text") or "")
        for ev in grammar.extract_page(text):
            ordinal = ev.pop("event_ordinal")
            if linker is not None:
                if ev.get("attendees"):
                    ev["attendees"] = [linker.link(a, "person") for a in ev["attendees"]]
                if ev.get("location") is not None:
                    ev["location"] = linker.link(ev["location"], "place")
            for t in event_to_triples(p["url"], ordinal, ev):
                key = t[:3]
                if key in seen:
                    continue
                seen.add(key)
                out.append(t)
    return out


def golden_triples_from_slots(golden_rows: Iterable[Dict[str, Any]]) -> List[Tuple[str, str, str, str]]:
    """Golden (subj, pred, obj, url) straight from generator-truth slots."""
    out: List[Tuple[str, str, str, str]] = []
    for r in golden_rows:
        slots = {k: r.get(k) for k in (
            "action", "date", "time", "attendees", "location",
            "duration", "recurrence", "notes",
        )}
        out.extend(event_to_triples(r["url"], r["event_ordinal"], slots))
    return out
