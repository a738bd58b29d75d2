"""Decontamination + packing at planted scale (round-3 datapoints).

Synthesizes a train corpus of N random-word docs and an eval set of M
docs; a planted fraction of train docs embeds an exact 8-gram copied
from some eval doc (all other 8-gram collisions are combinatorially
impossible against the 20k vocab). Runs contaminated_doc_ids on the
EXCHANGE regime (nothing driver-side grows with either corpus) and
verifies the flagged set is exactly the planted set; then times the
broadcast regime on the same input for comparison, and packs the train
corpus with pack_first_fit as the packing throughput datapoint.

    python scripts/scale_decontam_check.py --train 2000000 --eval 20000 \
        --contam-rate 0.05
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
    out = []
    for _ in range(4):
        out.append(chr(97 + i % 26))
        i //= 26
    return "".join(out)


VOCAB = [_word(i) for i in range(20_000)]
DOC_WORDS = 40
GRAM_N = 8


def _rng_for(tag: str) -> np.random.RandomState:
    digest = hashlib.md5(tag.encode()).digest()
    return np.random.RandomState(np.frombuffer(digest, dtype=np.uint32))


def _eval_gram(eval_id: int) -> str:
    """The 8-gram at position 10 of eval doc ``eval_id`` (deterministic)."""
    rng = _rng_for(f"eval-{eval_id}")
    words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), DOC_WORDS)]
    return " ".join(words[10:10 + GRAM_N])


def synth_eval_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        rng = _rng_for(f"eval-{int(i)}")
        texts.append(" ".join(VOCAB[j]
                              for j in rng.randint(0, len(VOCAB), DOC_WORDS)))
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def synth_train_batch(batch: pa.Table, n_contam: int, n_eval: int) -> pa.Table:
    """ids -> (doc_id, text). id < n_contam: embeds eval doc (id % n_eval)'s
    marker 8-gram at position 20; others are pure random word soup."""
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        rng = _rng_for(f"train-{int(i)}")
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), DOC_WORDS)]
        if i < n_contam:
            words[20:20 + GRAM_N] = _eval_gram(int(i) % n_eval).split(" ")
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=int, default=2_000_000)
    ap.add_argument("--eval", type=int, default=20_000)
    ap.add_argument("--contam-rate", type=float, default=0.05)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--skip-broadcast", action="store_true")
    ap.add_argument("--skip-bloom", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.decontam import (
        contaminated_doc_ids,
    )
    from calendar_event_entity_extraction_ray.stages.pack import (
        pack_first_fit,
    )

    n_tr, n_ev = args.train, args.eval
    n_contam = int(n_tr * args.contam_rate)
    ncpu = int(ray.cluster_resources().get("CPU", 8))

    train = ray.data.range(n_tr, override_num_blocks=max(ncpu * 4, 8)) \
        .map_batches(lambda b: synth_train_batch(b, n_contam, n_ev),
                     batch_format="pyarrow").materialize()
    ev = ray.data.range(n_ev, override_num_blocks=max(ncpu, 4)) \
        .map_batches(synth_eval_batch, batch_format="pyarrow").materialize()

    result = {"metric": "decontam_scale", "train_docs": n_tr,
              "eval_docs": n_ev, "planted": n_contam, "num_cpus": ncpu}

    t0 = time.time()
    flagged = contaminated_doc_ids(train, ev, n=GRAM_N, mode="exchange")
    n_flagged = flagged.count()
    wall = time.time() - t0
    # exact-string semi join: flagged must be EXACTLY the planted ids
    ok = n_flagged == n_contam
    result.update(exchange_wall_sec=round(wall, 1),
                  exchange_docs_per_sec=round(n_tr / wall, 1),
                  flagged=int(n_flagged), ok=bool(ok))

    if not args.skip_broadcast:
        t0 = time.time()
        n_b = contaminated_doc_ids(train, ev, n=GRAM_N,
                                   mode="broadcast").count()
        result.update(broadcast_wall_sec=round(time.time() - t0, 1),
                      broadcast_flagged=int(n_b))
        ok = ok and n_b == n_contam
        result["ok"] = bool(ok)

    if not args.skip_bloom:
        # the corpus-scale-eval-side regime: fixed 1 MiB bitset prefilter
        # + exact exchange verify of candidates only — must still flag
        # EXACTLY the planted set (no false negatives by construction)
        t0 = time.time()
        n_bl = contaminated_doc_ids(train, ev, n=GRAM_N,
                                    mode="bloom").count()
        result.update(bloom_wall_sec=round(time.time() - t0, 1),
                      bloom_docs_per_sec=round(n_tr / (time.time() - t0), 1),
                      bloom_flagged=int(n_bl))
        ok = ok and n_bl == n_contam
        result["ok"] = bool(ok)

    t0 = time.time()
    n_packed = pack_first_fit(train, capacity=256, bucket_size=64).count()
    result.update(pack_wall_sec=round(time.time() - t0, 1),
                  pack_docs_per_sec=round(n_tr / (time.time() - t0), 1),
                  packed_rows=int(n_packed))

    print(json.dumps(result))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
