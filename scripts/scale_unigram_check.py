"""Unigram-LM tokenizer training at corpus scale: the BPE scale check's
Zipf corpus (scale_bpe_check.py synth — pseudo-morphological vocabulary,
natural-text-shaped histogram), trained with the Viterbi-EM unigram
kernels, then a full-corpus encode.

What it evidences at scale: the corpus-sized cost is ONE word-histogram
exchange (shared with the BPE trainer); EM runs over the bounded capped
type table driver-side, so train wall is flat in docs beyond the
histogram; encode is the distinct-word-per-batch Viterbi path with the
head vocabulary pre-encoded.

    python scripts/scale_unigram_check.py --docs 2000000
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "scale_bpe_check",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "scale_bpe_check.py"))
_bpe_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bpe_check)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--pieces", type=int, default=4_000)
    ap.add_argument("--top-k", type=int, default=30_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.unigramtrain import (
        train_unigram,
        unigram_tokenize,
    )

    vocab = np.array(_bpe_check._vocab(args.vocab))
    ds = (ray.data.range(args.docs)
          .map_batches(lambda b: _bpe_check.synth_batch(b, vocab),
                       batch_format="pyarrow")
          .materialize())

    t0 = time.time()
    model = train_unigram(ds, vocab_size=args.pieces, top_k=args.top_k)
    t_train = time.time() - t0

    t0 = time.time()
    enc = unigram_tokenize(ds, model)
    n_pieces = 0
    for b in enc.iter_batches(batch_format="pyarrow", batch_size=None):
        n_pieces += int(np.sum(
            b.column("n_pieces").to_numpy(zero_copy_only=False)))
    t_enc = time.time() - t0

    print(json.dumps({
        "docs": args.docs,
        "pieces": len(model.logp),
        "coverage": round(model.kept_tokens / max(model.total_tokens, 1),
                          4),
        "train_sec": round(t_train, 1),
        "encode_sec": round(t_enc, 1),
        "encode_pieces_per_sec": int(n_pieces / max(t_enc, 1e-9)),
        "docs_per_sec_encode": int(args.docs / max(t_enc, 1e-9)),
        "pieces_per_doc": round(n_pieces / max(args.docs, 1), 2),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
