"""Tokenized-feature stage: records -> (input_ids, attention_mask, labels).

Actor-pool ``map_batches`` stage (the tokenizer/vocab is built once per
actor in ``__init__``, mirroring a real BPE load). Record shape dispatch
and prompt-token -100 masking follow the reference's ``build_feature``
(src/data.py:60-222) via ``functions/tokenizer.py``.

Input batches are Arrow; each row is re-shaped into the reference's record
dict from the configured columns:

  fmt="assignment": columns (prompt, completion)
  fmt="messages":   column  (user, assistant) -> [{role,content},...]
  fmt="chatml":     column  (text)
  fmt="legacy":     columns (prompt, response)

Output keeps ``id_col`` (if given) and appends list<int32> feature columns.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from calendar_event_entity_extraction_ray.functions.tokenizer import (
    ToyTokenizer,
    build_feature,
)


class TokenizeRecords:
    def __init__(
        self,
        fmt: str = "assignment",
        max_length: int = 512,
        vocab_size: int = 32768,
        id_col: Optional[str] = None,
    ) -> None:
        if fmt not in ("assignment", "messages", "chatml", "legacy"):
            raise ValueError(f"unknown fmt: {fmt}")
        self.fmt = fmt
        self.max_length = max_length
        self.id_col = id_col
        self.tok = ToyTokenizer(vocab_size=vocab_size)

    def _examples(self, batch: pa.Table) -> List[dict]:
        if self.fmt == "assignment":
            return [{"prompt": p, "completion": c}
                    for p, c in zip(batch.column("prompt").to_pylist(),
                                    batch.column("completion").to_pylist())]
        if self.fmt == "messages":
            return [{"messages": [{"role": "user", "content": u},
                                  {"role": "assistant", "content": a}]}
                    for u, a in zip(batch.column("user").to_pylist(),
                                    batch.column("assistant").to_pylist())]
        if self.fmt == "chatml":
            return [{"text": t} for t in batch.column("text").to_pylist()]
        return [{"prompt": p, "response": r}
                for p, r in zip(batch.column("prompt").to_pylist(),
                                batch.column("response").to_pylist())]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [build_feature(ex, self.tok, self.max_length)
                 for ex in self._examples(batch)]
        cols = {}
        if self.id_col:
            cols[self.id_col] = batch.column(self.id_col)
        cols["input_ids"] = pa.array(
            [f["input_ids"] for f in feats], pa.list_(pa.int32()))
        cols["attention_mask"] = pa.array(
            [f["attention_mask"] for f in feats], pa.list_(pa.int8()))
        cols["labels"] = pa.array(
            [f["labels"] for f in feats], pa.list_(pa.int32()))
        return pa.table(cols)
