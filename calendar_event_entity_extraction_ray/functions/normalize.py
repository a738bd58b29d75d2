"""Date/time normalization — load-bearing reference semantics.

Reference: augmentation/main.py:76-96.

  - ``normalize_date``: ``dateutil.parser.parse(s, dayfirst=True, fuzzy=True)``
    formatted ``%d/%m/%Y``; **None on any failure** (silent).
  - ``normalize_time``: ``dateutil.parser.parse(s, fuzzy=True)`` formatted
    ``%I:%M %p`` then ``.lstrip("0")`` — note this strips ALL leading zeros
    ("09:05 AM" -> "9:05 AM"), exactly as the reference does.

Both are memoized: dateutil parsing is the hot-loop cost of the extractor
stage, and raw date/time surface strings repeat heavily in web text
(SURVEY.md §7.3 hard part (b)). The caches are per-process, i.e. per Ray
actor — built once per worker, shared across batches.
"""

from __future__ import annotations

from functools import lru_cache

from dateutil import parser as dateparser

# Surface forms that dateutil cannot parse but the grammar emits.
_TIME_SPECIAL = {
    "noon": "12:00 PM",
    "midnight": "12:00 AM",
}


@lru_cache(maxsize=65536)
def _normalize_date_cached(s: str) -> str | None:
    try:
        dt = dateparser.parse(s, dayfirst=True, fuzzy=True)
        return dt.strftime("%d/%m/%Y")
    except Exception:
        return None


def normalize_date(date_str: str | None) -> str | None:
    """``"10th, May 2025"`` -> ``"10/05/2025"``; dayfirst: ``05/04/2024`` = 5 Apr."""
    if date_str is None or str(date_str).strip() == "":
        return None
    return _normalize_date_cached(str(date_str))


@lru_cache(maxsize=65536)
def _normalize_time_cached(s: str) -> str | None:
    special = _TIME_SPECIAL.get(s.strip().lower())
    if special is not None:
        return special
    try:
        dt = dateparser.parse(s, fuzzy=True)
        out = dt.strftime("%I:%M %p")
        return out.lstrip("0")
    except Exception:
        return None


def normalize_time(time_str: str | None) -> str | None:
    """``"4pm"`` -> ``"4:00 PM"``; ``"13:00"`` -> ``"1:00 PM"``."""
    if time_str is None or str(time_str).strip() == "":
        return None
    return _normalize_time_cached(str(time_str))
