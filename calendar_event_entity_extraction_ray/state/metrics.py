"""Run-level metrics manifest (METRICS.json).

Captures per-run counters (rows in/out, docs/sec, stage wall breakdown from
``ds.stats()``) next to the output manifest — the engine's replacement for
the reference's print-statement telemetry (augmentation/main.py:122,166,191).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Dict, Optional


def write_metrics(
    out_dir: str,
    counters: Dict[str, Any],
    stats_str: Optional[str] = None,
    name: str = "METRICS.json",
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "written_at": time.time(),
        "counters": counters,
        "stats": (stats_str or "")[-20000:],
    }
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".metrics.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    path = os.path.join(out_dir, name)
    os.replace(tmp, path)
    return path


def read_metrics(out_dir: str, name: str = "METRICS.json") -> Dict[str, Any]:
    with open(os.path.join(out_dir, name)) as f:
        return json.load(f)
