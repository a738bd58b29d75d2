"""Approach-B ("enhanced") record rendering — the reference's second
training-data generator, reproduced as a SELECTABLE renderer variant.

Reference: src/create_enhanced_training_data.py:96-210 (template pool +
natural date formatting) and :303-313 (messages-record emission). The
template strings and the user-prompt text are the semantic payload and are
kept byte-identical (same adjudication as functions/render.py — byte parity
IS the contract); the surrounding code is restructured: injected seeded RNG
instead of module-global ``random``, and an explicit ``today`` parameter so
the relative-date branch ("today"/"tomorrow"/"next Friday") is
deterministic — when ``today`` is None that branch is skipped entirely
(the reference used ``datetime.now()``, which no reproducible pipeline can).
"""

from __future__ import annotations

import json
import random
import re
from datetime import datetime
from typing import Any, Dict, List, Optional, Sequence

from calendar_event_entity_extraction_ray import TARGET_KEYS

ENHANCED_TEMPLATES: List[str] = [
    # Basic templates
    "{action} with {attendees} at {location} on {date} at {time} for {duration}",
    "{action} scheduled for {date} at {time} with {attendees} in {location} ({duration})",
    "Please schedule a {action} on {date} at {time} with {attendees} at {location} for {duration}",
    "Set up {action} with {attendees} for {date} at {time} in {location}, duration: {duration}",
    # More natural variations
    "Can you book a {action} with {attendees} on {date} at {time}? Location: {location}, {duration}",
    "Need to arrange {action} for {date} at {time} with {attendees} at {location} ({duration})",
    "Schedule {action} - {date} {time}, attendees: {attendees}, venue: {location}, {duration}",
    "{action} planned for {date} at {time} with {attendees} in {location} for {duration}",
    # Question formats
    "Could you set up a {action} with {attendees} on {date} at {time} at {location} for {duration}?",
    "Can we have a {action} on {date} at {time} with {attendees} in {location}? Duration: {duration}",
    "Is it possible to schedule {action} with {attendees} for {date} at {time} at {location} ({duration})?",
    # Imperative formats
    "Book {action} with {attendees} on {date} at {time} at {location} for {duration}",
    "Reserve {location} for {action} with {attendees} on {date} at {time} ({duration})",
    "Set {action} with {attendees} - {date} {time} at {location}, {duration}",
    # Casual formats
    "{action} with {attendees} tomorrow at {time} in {location} for {duration}",
    "Quick {action} with {attendees} on {date} around {time} at {location} ({duration})",
    "Let's do a {action} with {attendees} on {date} at {time} - {location}, {duration}",
    # Recurring event templates
    "{action} with {attendees} every {recurrence} at {time} in {location} for {duration}",
    "Weekly {action} with {attendees} on {recurrence} at {time} at {location} ({duration})",
    "Regular {action} with {attendees} - {recurrence} at {time} in {location}, {duration}",
]

ENHANCED_USER_TEMPLATE = (
    'Extract calendar fields from: "{event_text}".\n'
    "Return ONLY valid JSON with keys "
    "[action,date,time,attendees,location,duration,recurrence,notes].\n"
    "Use null for unknown."
)

_PLACEHOLDER_RE = re.compile(r"\{(\w+)\}")


def format_date_naturally(
    date_str: str,
    rng: random.Random,
    today: Optional[datetime] = None,
) -> str:
    """dd/mm/yyyy -> one of the reference's natural variations
    (create_enhanced_training_data.py:185-210). Relative forms only when a
    deterministic ``today`` anchor is supplied."""
    try:
        d = datetime.strptime(date_str, "%d/%m/%Y")
    except (ValueError, TypeError):
        return date_str
    formats = [
        date_str,
        d.strftime("%B %d, %Y"),
        d.strftime("%d %B %Y"),
        d.strftime("%m/%d/%Y"),
        d.strftime("%Y-%m-%d"),
        d.strftime("%d-%m-%Y"),
    ]
    if today is not None:
        diff = (d - today).days
        if diff == 0:
            formats.extend(["today", "this morning", "this afternoon"])
        elif diff == 1:
            formats.extend(["tomorrow", "tomorrow morning", "tomorrow afternoon"])
        elif diff == -1:
            formats.extend(["yesterday"])
        elif 1 < diff <= 7:
            formats.append(f"this {d.strftime('%A')}")
        elif 7 < diff <= 14:
            formats.append(f"next {d.strftime('%A')}")
    return rng.choice(formats)


def _attendees_phrase(attendees: Optional[Sequence[str]]) -> str:
    if not attendees:
        return "the team"
    if len(attendees) == 1:
        return attendees[0]
    if len(attendees) == 2:
        return f"{attendees[0]} and {attendees[1]}"
    return f"{', '.join(attendees[:-1])}, and {attendees[-1]}"


def render_enhanced(
    slots: Dict[str, Any],
    rng: random.Random,
    today: Optional[datetime] = None,
) -> str:
    """Structured slots -> natural event text, approach-B semantics:
    pick among the templates whose placeholders are all fillable
    ('attendees' always counts as fillable — it defaults to "the team"),
    fill with the reference's safe defaults, collapse whitespace."""
    available = {k for k, v in slots.items() if v is not None}
    suitable = [
        t for t in ENHANCED_TEMPLATES
        if all(f in available or f == "attendees"
               for f in _PLACEHOLDER_RE.findall(t))
    ]
    if not suitable:
        suitable = ["{action} on {date} at {time}"]
    template = rng.choice(suitable)

    out = template
    out = out.replace("{action}", slots.get("action") or "meeting")
    out = out.replace("{attendees}", _attendees_phrase(slots.get("attendees")))
    out = out.replace("{location}", slots.get("location") or "office")
    out = out.replace(
        "{date}",
        format_date_naturally(slots.get("date") or "01/01/2024", rng, today))
    out = out.replace("{time}", slots.get("time") or "10:00 AM")
    out = out.replace("{duration}", slots.get("duration") or "1 hour")
    out = out.replace("{recurrence}", slots.get("recurrence") or "weekly")
    out = _PLACEHOLDER_RE.sub("", out)
    return re.sub(r"\s+", " ", out).strip()


def build_messages_record(event_text: str, output: Dict[str, Any]) -> Dict[str, Any]:
    """(event_text, slots) -> chat ``messages`` training record
    (create_enhanced_training_data.py:303-313); assistant content is the
    8-key JSON in canonical key order."""
    payload = {k: output.get(k) for k in TARGET_KEYS}
    return {
        "messages": [
            {"role": "user",
             "content": ENHANCED_USER_TEMPLATE.format(event_text=event_text)},
            {"role": "assistant",
             "content": json.dumps(payload, ensure_ascii=False)},
        ]
    }
