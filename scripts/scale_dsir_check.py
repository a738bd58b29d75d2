"""DSIR importance resampling at corpus scale: synthesizes N docs from two
topic vocabularies (half target-like, half off-topic; deterministic per-id
seeds), fits the hashed-n-gram importance weights against a smaller
target-only sample, Gumbel-top-k selects, and reports selection precision
(fraction of selected docs that are target-topic) + wall.

    python scripts/scale_dsir_check.py --docs 2000000
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


def _doc_text(i: int, topic: str, n_words: int = 40) -> str:
    digest = hashlib.md5(f"dsir-{topic}-{i}".encode()).digest()
    rng = np.random.RandomState(np.frombuffer(digest, dtype=np.uint32))
    return " ".join(f"{topic}{w}" for w in rng.randint(0, 2000, n_words))


def synth_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    texts = [_doc_text(int(i), "wiki" if i % 2 == 0 else "spam")
             for i in ids]
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--target-docs", type=int, default=50_000)
    ap.add_argument("--select", type=int, default=10_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.dsir import dsir_select

    # materialize: the synthetic generator (per-doc md5-seeded RNG) is
    # far more expensive than the operator under test, and dsir_score
    # legitimately scans raw twice (q-counts + scoring) — pin the input
    # so the measurement is the operator, not the fixture
    raw = (ray.data.range(args.docs)
           .repartition(args.num_cpus * 3)
           .map_batches(synth_batch, batch_format="pyarrow")
           .materialize())
    # target: a disjoint id range of purely target-topic docs
    target = (ray.data.range(args.target_docs)
              .repartition(args.num_cpus)
              .map_batches(
                  lambda b: pa.table({"text": pa.array(
                      [_doc_text(int(i) + 10**9, "wiki")
                       for i in b.column("id").to_numpy()],
                      pa.string())}),
                  batch_format="pyarrow"))

    t0 = time.time()
    out = dsir_select(target, raw, k=args.select).to_pandas()
    wall = time.time() - t0

    precision = float((out["doc_id"] % 2 == 0).mean())
    print(json.dumps({
        "docs": args.docs, "selected": len(out),
        "precision_target_topic": round(precision, 4),
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(args.docs / wall, 1),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
