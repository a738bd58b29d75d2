"""SemDeDup at >= 1M vectors: synthesizes N unit vectors with a planted
twin rate (twin = base + tiny noise, cosine ~0.999; deterministic per-id
seeds), runs ``stages/semdedup.py:semdedup_drop`` with k scaled to a
bounded expected cluster size, and reports planted-twin recall (a twin is
recovered iff its id is dropped — the base has the smaller id) + wall.

    python scripts/scale_semdedup_check.py --vectors 1000000
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
            v = v + rng2.normal(scale=0.05, size=DIM)
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
    ap.add_argument("--tau", type=float, default=0.9)
    ap.add_argument("--cluster-target", type=int, default=2_000,
                    help="expected vectors per k-means cluster")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.semdedup import (
        semdedup_drop,
    )

    n = args.vectors
    n_base = int(n * (1.0 - args.dup_rate))
    k = max(8, n // args.cluster_target)
    ds = (ray.data.range(n)
          .repartition(args.num_cpus * 3)
          .map_batches(lambda b: synth_batch(b, n_base),
                       batch_format="pyarrow"))

    t0 = time.time()
    dropped = semdedup_drop(ds, k=k, tau=args.tau, iters=3).to_pandas()
    wall = time.time() - t0

    twins = set(range(n_base, n))
    got = set(dropped["vec_id"].tolist())
    recall = len(twins & got) / max(len(twins), 1)
    print(json.dumps({
        "vectors": n, "k": k, "dropped": len(got),
        "planted_twins": len(twins),
        "twin_recall": round(recall, 4),
        "wall_sec": round(wall, 1),
        "vecs_per_sec": round(n / wall, 1),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
