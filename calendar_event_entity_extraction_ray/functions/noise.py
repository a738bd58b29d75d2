"""Light text-noise operator (synthetic-data realism knob).

Reference: augmentation/faker_synth.py:190-213 ``_noise`` — 10%-gated light
linguistic noise (typos, emoji, timezone suffix, abbreviation swaps,
Hinglish tail) applied to the TEXT only; slot values stay clean. Same op
set and gate probabilities; RNG injected for per-row determinism.
"""

from __future__ import annotations

import random


def apply_noise(text: str, rng: random.Random) -> str:
    if rng.random() >= 0.1:
        return text
    ops = []
    if rng.random() < 0.3:
        ops.append(lambda s: s.replace("meeting", "meting") if "meeting" in s else s)
    if rng.random() < 0.3:
        ops.append(lambda s: s.replace("calendar", "calender") if "calendar" in s else s)
    if rng.random() < 0.2:
        ops.append(lambda s: s + rng.choice([" 🙂", " ✨", " !"]))
    if rng.random() < 0.2:
        ops.append(lambda s: s.replace("minutes", "mins"))
    if rng.random() < 0.2:
        ops.append(lambda s: s.replace("tomorrow", "tmrw"))
    if rng.random() < 0.2:
        ops.append(lambda s: s + rng.choice([" (IST)", " (PST)"]))
    if rng.random() < 0.15:
        ops.append(lambda s: s.replace("meeting", "mtg"))
    if rng.random() < 0.1:
        ops.append(lambda s: s + rng.choice([" kal 11 baje", " mtg at 5"]))
    for op in ops:
        text = op(text)
    return text
