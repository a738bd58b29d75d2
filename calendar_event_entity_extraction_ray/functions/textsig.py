"""Text signatures and dedup keys.

  - ``event_text_signature``: lowercase, strip, collapse inner whitespace
    (reference: augmentation/augmentors.py:44-48) — the anti-join /
    split-leakage key.
  - ``record_signature``: exact-dedup key = (stripped text, key-sorted JSON of
    the 8-slot output) (reference: augmentation/utils.py:36-46
    ``dedupe_text_output``). The reference's "first wins" depends on input
    order; this engine defines order explicitly as ``(url, warc_ts)`` so that
    parallel dedup is deterministic (SURVEY.md §2.7).
  - ``hash64`` / ``stable_bucket``: deterministic 64-bit content hashes used
    as shuffle/partition keys (never Python's salted ``hash()``).
"""

from __future__ import annotations

import hashlib
import json
import struct
from typing import Any, Dict


def event_text_signature(text: str | None) -> str:
    t = (text or "").strip().lower()
    return " ".join(t.split())


def output_signature(output: Dict[str, Any]) -> str:
    """Key-order-insensitive JSON serialization of the slot dict."""
    return json.dumps(output, sort_keys=True, ensure_ascii=False, separators=(",", ":"))


def record_signature(event_text: str, output: Dict[str, Any]) -> str:
    return (event_text or "").strip() + "\x1f" + output_signature(output)


def hash64(s: str) -> int:
    """Deterministic unsigned 63-bit hash (md5-based; stable across processes)."""
    digest = hashlib.md5(s.encode("utf-8")).digest()
    return struct.unpack("<Q", digest[:8])[0] & 0x7FFF_FFFF_FFFF_FFFF


def stable_bucket(s: str, n_buckets: int) -> int:
    """md5-hex-prefix bucket — reproducible in DuckDB as
    ``CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % n``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def event_id(url: str, event_ordinal: int) -> str:
    """Deterministic subject id: hash of (url, ordinal) (SURVEY.md §7.1).

    128 bits: subject ids are IDENTITY, not partition keys — 64 bits would
    see birthday collisions at 10^12 events and silently merge two events'
    triples; at 128 bits the collision probability is ~1e-14."""
    return "ev_" + hashlib.sha1(f"{url}#{event_ordinal}".encode("utf-8")).hexdigest()[:32]
