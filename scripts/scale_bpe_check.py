"""BPE tokenizer training at corpus scale: synthesizes N docs over a
Zipf-distributed word vocabulary (natural-text-shaped histogram, so the
top-K cap and merge loop behave like they would on web text), trains the
merge table, encodes the corpus, and reports walls + coverage.

    python scripts/scale_bpe_check.py --docs 2000000
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa

# word surface forms: pseudo-morphology so merges have real structure
_STEMS = ["data", "event", "model", "train", "token", "graph", "node",
          "user", "click", "page", "text", "word", "count", "merge",
          "batch", "shard", "index", "query", "value", "score"]
_SUFFIX = ["", "s", "ing", "ed", "er", "ly", "ion", "ness"]


def _vocab(n: int) -> list[str]:
    out = []
    i = 0
    while len(out) < n:
        out.append(_STEMS[i % len(_STEMS)]
                   + _SUFFIX[(i // len(_STEMS)) % len(_SUFFIX)]
                   + (str(i // (len(_STEMS) * len(_SUFFIX)))
                      if i >= len(_STEMS) * len(_SUFFIX) else ""))
        i += 1
    return out


def synth_batch(batch: pa.Table, vocab: np.ndarray,
                n_words: int = 60) -> pa.Table:
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        digest = hashlib.md5(f"bpe-{int(i)}".encode()).digest()
        rng = np.random.RandomState(np.frombuffer(digest, dtype=np.uint32))
        # Zipf draw over the vocab (clip to range)
        idx = np.minimum(rng.zipf(1.3, n_words) - 1, len(vocab) - 1)
        texts.append(" ".join(vocab[idx]))
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--merges", type=int, default=500)
    ap.add_argument("--top-k", type=int, default=30_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.bpetrain import (
        bpe_tokenize,
        train_bpe,
    )

    vocab = np.array(_vocab(args.vocab))
    ds = (ray.data.range(args.docs)
          .map_batches(lambda b: synth_batch(b, vocab),
                       batch_format="pyarrow")
          .materialize())

    t0 = time.time()
    model = train_bpe(ds, n_merges=args.merges, top_k=args.top_k)
    t_train = time.time() - t0

    t0 = time.time()
    enc = bpe_tokenize(ds, model)
    n_tokens = 0
    for b in enc.iter_batches(batch_format="pyarrow", batch_size=None):
        n_tokens += int(np.sum(
            b.column("n_tokens").to_numpy(zero_copy_only=False)))
    t_enc = time.time() - t0

    print(json.dumps({
        "docs": args.docs,
        "n_merges": len(model.merges),
        "vocab_size": len(model.vocab),
        "coverage": round(model.kept_tokens / max(model.total_tokens, 1),
                          4),
        "train_sec": round(t_train, 1),
        "encode_sec": round(t_enc, 1),
        "encode_tokens_per_sec": int(n_tokens / max(t_enc, 1e-9)),
        "docs_per_sec_encode": int(args.docs / max(t_enc, 1e-9)),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
