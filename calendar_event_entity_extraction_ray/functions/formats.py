"""Record-format dispatch + prompt construction.

Reference surfaces:
  - 4-way format dispatch (src/data.py:17-51 ``CalendarJsonDataset``): a
    JSONL record may be (a) prompt/completion, (b) chat ``messages``,
    (c) ChatML ``text``, or (d) legacy ``{event_text, output}``; all
    normalize to a (prompt_text, completion_json_str) pair.
  - prompt builders (src/prompts.py:21-33): default / simple / few-shot /
    ChatML; event_text newlines flattened to spaces.
  - ``format_for_base_model`` (src/prepare_assignment_data.py:24-39):
    event_text+output -> {prompt, completion, full_text}.
  - prompt-echo strip (src/evaluate_baseline.py:137, src/evaluate.py:89).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional, Tuple

PROMPT_PREFIX = "Extract calendar information from: "
PROMPT_SUFFIX = "\nCalendar JSON:"

_CHATML_RE = re.compile(
    r"<\|im_start\|>user\s*(.*?)<\|im_end\|>\s*<\|im_start\|>assistant\s*(.*?)<\|im_end\|>",
    re.DOTALL,
)


def build_prompt(event_text: str) -> str:
    """Default prompt; newline-flatten the event text (src/prompts.py:21-24)."""
    flat = " ".join((event_text or "").splitlines())
    return f"{PROMPT_PREFIX}{flat}{PROMPT_SUFFIX}"


def build_simple_prompt(event_text: str) -> str:
    flat = " ".join((event_text or "").splitlines())
    return f"Text: {flat}\nJSON:"


def build_few_shot_prompt(event_text: str, examples: list[Tuple[str, str]] | None = None) -> str:
    parts = []
    for ex_text, ex_json in examples or []:
        parts.append(build_prompt(ex_text) + " " + ex_json)
    parts.append(build_prompt(event_text))
    return "\n\n".join(parts)


def build_chatml_prompt(event_text: str) -> str:
    flat = " ".join((event_text or "").splitlines())
    return (
        f"<|im_start|>user\n{PROMPT_PREFIX}{flat}<|im_end|>\n"
        f"<|im_start|>assistant\n"
    )


def strip_prompt_echo(text: str) -> str:
    """Recover event_text from a default-style prompt (prompt-echo strip)."""
    return (text or "").replace(PROMPT_PREFIX, "").replace(PROMPT_SUFFIX, "").strip()


def format_for_base_model(event_text: str, output: Dict[str, Any]) -> Dict[str, str]:
    """(event_text, output) -> {prompt, completion, full_text}
    (src/prepare_assignment_data.py:24-39)."""
    prompt = build_prompt(event_text)
    completion = " " + json.dumps(output, ensure_ascii=False)
    return {"prompt": prompt, "completion": completion,
            "full_text": prompt + completion}


def parse_record(rec: Dict[str, Any]) -> Optional[Tuple[str, str]]:
    """4-way dispatch -> (prompt_text, completion_json_str) or None.

    Order mirrors the reference (src/data.py:27-51): prompt/completion
    first, then messages, then ChatML text, then legacy event_text/output.
    """
    if "prompt" in rec and "completion" in rec:
        return str(rec["prompt"]), str(rec["completion"]).strip()
    if "messages" in rec and isinstance(rec["messages"], list):
        user, assistant = None, None
        for m in rec["messages"]:
            if not isinstance(m, dict):
                continue
            if m.get("role") == "user" and user is None:
                user = str(m.get("content") or "")
            elif m.get("role") == "assistant":
                assistant = str(m.get("content") or "")
        if user is not None and assistant is not None:
            return user, assistant.strip()
        return None
    if "text" in rec and isinstance(rec["text"], str) and "<|im_start|>" in rec["text"]:
        m = _CHATML_RE.search(rec["text"])
        if m:
            return m.group(1).strip(), m.group(2).strip()
        return None
    if "event_text" in rec:
        payload = rec.get("output") or rec.get("json") or {}
        return (
            build_prompt(rec["event_text"]),
            json.dumps(payload, ensure_ascii=False),
        )
    return None
