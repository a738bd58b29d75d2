"""Near-dup dedup at planted scale: the VERDICT-r2 #1 datapoint.

Synthesizes N diverse random-word documents with a planted near-dup rate
(each dup = one base doc with one word swapped, word-shingle Jaccard
~0.9), then runs the corpus_clean chain with ``broadcast_limit`` forced
to 0 so BOTH dup-rate-proportional paths take the exchange route:

  - candidate texts ship through the band-hash exchange (hash_join),
  - the drop set applies via stages/joins.py:anti_join,

i.e. nothing on the driver grows with the dup rate. Verifies the exact
expected survivor count (every planted dup must drop; bases are mutually
non-similar by construction) and prints one JSON line.

    python scripts/scale_dedup_check.py --docs 5000000 --dup-rate 0.4
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

def _word(i: int) -> str:
    # all-alphabetic (the quality filter rejects digit-heavy text)
    out = []
    for _ in range(4):
        out.append(chr(97 + i % 26))
        i //= 26
    return "".join(out)


VOCAB = [_word(i) for i in range(20_000)]
DOC_WORDS = 40  # 1-word swap -> shingle Jaccard ~0.854 (see __main__ gate)


def synth_batch(batch: pa.Table, n_base: int) -> pa.Table:
    """ids -> (doc_id, text). id < n_base: a base doc (deterministic
    40-word sample from the 20k vocab — diverse, so LSH bands only collide
    for true near-dups). id >= n_base: a near-dup of base ``id % n_base``
    with ONE word swapped (shingle Jaccard ~0.854 > the 0.75 threshold;
    dup-dup siblings sit at ~0.73, linked transitively via the base)."""
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        base_id = int(i) if i < n_base else int(i) % n_base
        # 128-bit seed: a 32-bit seed collides for ~n^2/2^33 base pairs
        # (measured: 1042 identical-text bases at 3M — correctly removed by
        # exact_dedup, but they pollute the planted-count arithmetic)
        digest = hashlib.md5(f"base-{base_id}".encode()).digest()
        rng = np.random.RandomState(np.frombuffer(digest, dtype=np.uint32))
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), DOC_WORDS)]
        if i >= n_base:
            # swap one mid-position word, varying by dup index so repeated
            # dups of one base are near each other AND the base
            k = 5 + (int(i) // n_base) % (DOC_WORDS - 10)
            words[k] = f"swap{int(i)}"
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--dup-rate", type=float, default=0.4)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.pipelines.corpus import (
        corpus_clean,
    )

    n = args.docs
    n_base = int(n * (1.0 - args.dup_rate))
    ncpu = int(ray.cluster_resources().get("CPU", 8))

    ds = ray.data.range(n, override_num_blocks=max(ncpu * 4, 8)).map_batches(
        lambda b: synth_batch(b, n_base), batch_format="pyarrow")

    t0 = time.time()
    # broadcast_limit=0: force exchange-routed candidate texts + anti_join
    out = corpus_clean(ds, keep_lang="", broadcast_limit=0,
                       minhash_threshold=0.75)
    n_out = out.count()
    wall = time.time() - t0

    # Verification is exact Jaccard, so false drops are impossible and a
    # base (the min id of its cluster) always survives: survivors >=
    # n_base, with the excess = planted dups the 16x4 LSH banding missed
    # (theoretical miss rate at J=0.854: (1-0.854^4)^16 ~= 5e-6).
    n_dups = n - n_base
    missed = int(n_out) - n_base
    recall = 1.0 - missed / n_dups if n_dups else 1.0
    ok = missed >= 0 and recall >= 0.9999
    print(json.dumps({
        "metric": "corpus_clean_exchange_route",
        "docs": n, "dup_rate": args.dup_rate, "n_base": n_base,
        "survivors": int(n_out), "expected": n_base,
        "missed_dups": missed, "recall": round(recall, 6), "ok": bool(ok),
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n / wall, 1),
        "num_cpus": ncpu,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
