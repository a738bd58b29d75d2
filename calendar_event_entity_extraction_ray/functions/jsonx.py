"""JSON extraction from free text.

Reference: src/infer.py:22-48 (``extract_first_json_object`` /
``safe_json_load``), duplicated at src/loss.py:102-121 and
src/test_model.py:35-54. Brace-depth scan for the first balanced ``{...}``
substring, tolerating prompt echo and trailing prose; None when absent or
unparseable.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional


def extract_first_json_object(text: str) -> Optional[str]:
    if not isinstance(text, str):
        return None
    start = text.find("{")
    if start == -1:
        return None
    depth = 0
    for i in range(start, len(text)):
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def safe_json_load(text: str) -> Optional[Dict[str, Any]]:
    blob = extract_first_json_object(text)
    if not blob:
        return None
    try:
        obj = json.loads(blob)
    except Exception:
        return None
    return obj if isinstance(obj, dict) else None
