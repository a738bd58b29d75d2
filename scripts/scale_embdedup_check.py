"""Embedding near-dup LSH at >= 1M vectors: the VERDICT-r2 #3 datapoint.

Synthesizes N unit vectors (deterministic per-id seeds) with a planted
near-dup rate (dup = base + small Gaussian noise, cosine ~0.99), runs
``stages/knn.py:embedding_dup_pairs_lsh`` (planes scale with log2(n) ->
constant expected bucket size; per-bucket verify on the explicit
exchange) and reports planted-pair recall + wall. Random base pairs are
~orthogonal at dim 64, so precision is enforced by the exact in-bucket
verification and recall is measured against the planted pairs.

    python scripts/scale_embdedup_check.py --vectors 1000000
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

DIM = 64


def synth_batch(batch: pa.Table, n_base: int) -> pa.Table:
    ids = batch.column("id").to_numpy()
    out = np.empty((len(ids), DIM), dtype=np.float32)
    for row, i in enumerate(ids):
        base_id = int(i) if i < n_base else int(i) % n_base
        digest = hashlib.md5(f"vec-{base_id}".encode()).digest()
        rng = np.random.RandomState(np.frombuffer(digest, dtype=np.uint32))
        v = rng.normal(size=DIM)
        if i >= n_base:
            d2 = hashlib.md5(f"noise-{int(i)}".encode()).digest()
            rng2 = np.random.RandomState(np.frombuffer(d2, dtype=np.uint32))
            v = v + rng2.normal(scale=0.05, size=DIM)  # cosine ~0.999
        out[row] = (v / np.linalg.norm(v)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.float32()), DIM).cast(
                pa.list_(pa.float32())),
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dup-rate", type=float, default=0.2)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.knn import (
        embedding_dup_pairs_lsh,
    )

    n = args.vectors
    n_base = int(n * (1.0 - args.dup_rate))
    n_dups = n - n_base
    ncpu = int(ray.cluster_resources().get("CPU", 8))

    ds = ray.data.range(n, override_num_blocks=max(ncpu * 4, 8)).map_batches(
        lambda b: synth_batch(b, n_base), batch_format="pyarrow")

    t0 = time.time()
    pairs = embedding_dup_pairs_lsh(
        ds, threshold=args.threshold, n_vectors=n)
    # planted pair = (base_id, dup_id >= n_base with dup % n_base == base);
    # count recall distributed (never collect the pair list)
    def is_planted(b: pa.Table) -> pa.Table:
        a = b.column("vec_id_a").to_numpy()
        c = b.column("vec_id_b").to_numpy()
        hit = ((a < n_base) & (c >= n_base) & (c % n_base == a))
        return pa.table({"planted": pa.array(hit.astype(np.int64)),
                         "one": pa.array(np.ones(len(a), dtype=np.int64))})

    import pandas as pd

    agg = pairs.map_batches(is_planted, batch_format="pyarrow").sum(
        ["planted", "one"])
    wall = time.time() - t0
    found = int(agg["sum(planted)"])
    total_pairs = int(agg["sum(one)"])
    recall = found / n_dups if n_dups else 1.0
    ok = recall >= 0.9
    print(json.dumps({
        "metric": "embedding_dups_lsh_scale",
        "vectors": n, "dup_rate": args.dup_rate, "dim": DIM,
        "threshold": args.threshold,
        "planted": n_dups, "found_planted": found,
        "pairs_total": total_pairs,
        "recall": round(recall, 5), "ok": bool(ok),
        "wall_sec": round(wall, 1),
        "vecs_per_sec": round(n / wall, 1),
        "num_cpus": ncpu,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
