"""Tokenized training features: toy tokenizer + prompt-masked labels.

Reproduces the reference's ``build_feature`` semantics (src/data.py:60-222)
over a deterministic toy vocabulary (no HF tokenizer in this container):

  - 4-way record dispatch, same precedence as the reference
    (src/data.py:27-51): (a) prompt/completion, (b) chat ``messages``,
    (c) ChatML ``text``, (d) legacy prompt/response;
  - full text is tokenized once, ``labels`` starts as a copy of
    ``input_ids``, and the PROMPT-token prefix is masked to -100 so loss
    is computed only on the completion / assistant response;
  - the prompt length is measured by re-tokenizing the prompt part alone
    (prefix-consistency holds for this piece tokenizer because every
    prompt part ends on a piece boundary);
  - branch quirks kept: (a)/(b)/(c) guard ``prompt_len < len(labels)``
    before masking, the legacy branch (d) masks unconditionally
    (src/data.py:215 has no bounds check) — on truncation-to-prompt-only
    rows, (d) masks everything while (a) masks nothing;
  - truncation to ``max_length``; ``attention_mask`` is all ones
    (no padding, matching ``padding=False``).

The toy tokenizer: pieces are the engine's BPE-ish regex
(``[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]``, the same pieces as
``text_analysis.token_count_batch``); ids are a stable md5 hash of the
piece into [n_special, vocab_size). Whitespace carries no token.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, List, Sequence

_PIECE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

IGNORE_INDEX = -100
ASSISTANT_TAG = "<|im_start|>assistant\n"


class ToyTokenizer:
    """Deterministic hash-vocab tokenizer (a stand-in for a trained BPE:
    same API shape, stable ids across processes/nodes)."""

    N_SPECIAL = 4  # 0=pad 1=bos 2=eos 3=unk (reserved, unused by encode)

    def __init__(self, vocab_size: int = 32768) -> None:
        if vocab_size <= self.N_SPECIAL:
            raise ValueError("vocab_size must exceed the special ids")
        self.vocab_size = vocab_size
        self._cache: Dict[str, int] = {}

    def piece_id(self, piece: str) -> int:
        pid = self._cache.get(piece)
        if pid is None:
            h = int.from_bytes(hashlib.md5(piece.encode("utf-8")).digest()[:8],
                               "little")
            pid = self.N_SPECIAL + h % (self.vocab_size - self.N_SPECIAL)
            self._cache[piece] = pid
        return pid

    def encode(self, text: str) -> List[int]:
        return [self.piece_id(p) for p in _PIECE_RE.findall(text or "")]


def render_chatml(messages: Sequence[Dict[str, Any]]) -> str:
    """Manual ChatML join — the reference's no-chat-template fallback
    (src/data.py:110-115)."""
    return "\n".join(
        f"<|im_start|>{m.get('role')}\n{m.get('content')}<|im_end|>"
        for m in messages
    )


def render_chatml_generation_prompt(messages: Sequence[Dict[str, Any]]) -> str:
    """ChatML of all messages but the last, plus the assistant start tag
    (``apply_chat_template(messages[:-1], add_generation_prompt=True)``
    equivalent, src/data.py:131-136)."""
    head = render_chatml(messages[:-1])
    return (head + "\n" if head else "") + ASSISTANT_TAG


def build_feature(
    example: Dict[str, Any], tokenizer: ToyTokenizer, max_length: int = 512
) -> Dict[str, List[int]]:
    """One record -> {input_ids, attention_mask, labels}."""
    if "input_ids" in example and "labels" in example:
        return example  # already tokenized (defensive pass-through)

    if "prompt" in example and "completion" in example:
        full = str(example["prompt"]) + " " + str(example["completion"])
        ids = tokenizer.encode(full)[:max_length]
        labels = list(ids)
        plen = len(tokenizer.encode(str(example["prompt"])))
        if plen < len(labels):
            labels[:plen] = [IGNORE_INDEX] * plen
    elif "messages" in example:
        msgs = example["messages"]
        full = render_chatml(msgs)
        ids = tokenizer.encode(full)[:max_length]
        labels = list(ids)
        ulen = len(tokenizer.encode(render_chatml_generation_prompt(msgs)))
        if ulen < len(labels):
            labels[:ulen] = [IGNORE_INDEX] * ulen
    elif "text" in example:
        full = str(example["text"])
        ids = tokenizer.encode(full)[:max_length]
        labels = list(ids)
        cut = full.find(ASSISTANT_TAG)
        if cut != -1:  # no tag -> train on everything (src/data.py:155-168)
            plen = len(tokenizer.encode(full[: cut + len(ASSISTANT_TAG)]))
            if plen < len(labels):
                labels[:plen] = [IGNORE_INDEX] * plen
    else:
        prompt = str(example.get("prompt", ""))
        response = str(example.get("response", ""))
        ids = tokenizer.encode(prompt + "\n" + response)[:max_length]
        labels = list(ids)
        plen = len(tokenizer.encode(prompt + "\n"))
        # unconditional mask (reference quirk, src/data.py:215) — but clamped:
        # the reference's raw slice-assign EXTENDS labels past input_ids when
        # the prompt alone exceeds max_length (misaligned training features);
        # here the whole row is masked instead, keeping lengths aligned
        labels[:plen] = [IGNORE_INDEX] * min(plen, len(labels))

    return {
        "input_ids": ids,
        "attention_mask": [1] * len(ids),
        "labels": labels,
    }
