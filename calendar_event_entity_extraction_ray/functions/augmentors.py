"""Augmentation kernels: whole-word substitution and entity swap.

Reference: augmentation/augmentors.py:9-39.
  - ``replace_substrings``: sequential whole-word, case-insensitive regex
    replacement over a mapping; iteration order of the mapping matters
    (each sub sees the previous result).
  - ``swap_entities_with_pools``: replace attendees/location in BOTH the
    text and the slot dict with pool samples; returns (None, None) when
    nothing was swappable.

RNG is injected (seeded deterministically per row in the distributed stage)
instead of the reference's module-global ``random``.
"""

from __future__ import annotations

import random
import re
from typing import Any, Dict, List, Optional, Tuple


def replace_substrings(text: str, mapping: Dict[str, str]) -> str:
    out = text
    for src, dst in mapping.items():
        out = re.sub(rf"\b{re.escape(src)}\b", dst, out, flags=re.IGNORECASE)
    return out


def swap_entities_with_pools(
    event_text: str,
    j: Dict[str, Any],
    att_pool: List[str],
    loc_pool: List[str],
    rng: random.Random,
) -> Tuple[Optional[str], Optional[Dict[str, Any]]]:
    atts = j.get("attendees") or []
    loc = j.get("location")
    repl: Dict[str, str] = {}
    new_j = {**j}
    if isinstance(atts, list) and atts:
        new_atts = []
        for a in atts:
            if isinstance(a, str) and a.strip():
                cand = rng.choice(att_pool) if att_pool else a
                repl[a] = cand
                new_atts.append(cand)
            else:
                new_atts.append(a)
        new_j["attendees"] = new_atts
    if isinstance(loc, str) and loc.strip():
        cand_l = rng.choice(loc_pool) if loc_pool else loc
        repl[loc] = cand_l
        new_j["location"] = cand_l
    if repl:
        return replace_substrings(event_text, repl), new_j
    return None, None
