"""Repeated-span removal at planted scale.

Synthesizes N 40-word random docs; a planted fraction embeds one of K
shared 8-token spans at position 16 (the only cross-doc repeated grams —
random 20k-vocab flanks never collide). Expected output: every doc
survives, and exactly 8 tokens are removed from each planted doc —
verified by exact total-token accounting.

    python scripts/scale_spandedup_check.py --docs 1000000 --plant-rate 0.2
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
SPAN_N = 8
N_SPANS = 64  # distinct shared spans, each planted in many docs


def _span(k: int) -> list:
    rng = np.random.RandomState(
        np.frombuffer(hashlib.md5(f"span-{k}".encode()).digest(),
                      dtype=np.uint32))
    return [f"sp{k}w{j}" for j in range(SPAN_N)]  # vocabulary-disjoint


def synth_batch(batch: pa.Table, n_plant: int) -> pa.Table:
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        rng = np.random.RandomState(
            np.frombuffer(hashlib.md5(f"doc-{int(i)}".encode()).digest(),
                          dtype=np.uint32))
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), DOC_WORDS)]
        if i < n_plant:
            words[16:16 + SPAN_N] = _span(int(i) % N_SPANS)
            # doc-unique flanks: otherwise two docs sharing span k AND
            # the same random neighbor word (p ~ 1/20000 per pair, ~12
            # expected at 20k docs) legitimately repeat the boundary
            # 8-gram too and the token accounting below under-counts
            words[15] = f"u{int(i)}a"
            words[16 + SPAN_N] = f"u{int(i)}b"
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--plant-rate", type=float, default=0.2)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.spandedup import (
        remove_repeated_spans,
    )

    n = args.docs
    n_plant = int(n * args.plant_rate)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    docs = ray.data.range(n, override_num_blocks=max(ncpu * 4, 8)) \
        .map_batches(lambda b: synth_batch(b, n_plant),
                     batch_format="pyarrow").materialize()

    t0 = time.time()
    out = remove_repeated_spans(docs, n=SPAN_N)

    def tok_counts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_tok = pc.add(
            pc.count_substring(b.column("clean_text"), " "), 1)
        return pa.table({"rows": pa.array([b.num_rows], pa.int64()),
                         "toks": pa.array(
                             [pc.sum(n_tok).as_py() or 0], pa.int64())})

    agg = out.map_batches(tok_counts, batch_format="pyarrow").to_pandas()
    wall = time.time() - t0
    rows, toks = int(agg["rows"].sum()), int(agg["toks"].sum())
    expect_toks = n * DOC_WORDS - n_plant * SPAN_N
    ok = rows == n and toks == expect_toks
    print(json.dumps({
        "metric": "span_removal_scale", "docs": n, "planted": n_plant,
        "rows_out": rows, "toks_out": toks, "expect_toks": expect_toks,
        "ok": bool(ok), "wall_sec": round(wall, 1),
        "docs_per_sec": round(n / wall, 1), "num_cpus": ncpu,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
