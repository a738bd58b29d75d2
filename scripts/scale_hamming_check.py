"""Banded hamming near-pair join at scale: N random 64-bit fingerprints
with planted <=3-bit twins; reports wall, pair counts, and planted-twin
recall (must be 1.0 — the banding is exact).

    python scripts/scale_hamming_check.py --rows 2000000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 — every row's hash is a pure function of its id, so
    twins can regenerate their source's hash in any batch."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def synth(batch: pa.Table, twin_every: int) -> pa.Table:
    ids = batch.column("id").to_numpy().astype(np.int64)
    u = ids.view(np.uint64)
    h = _mix(u.copy())
    # planted twin: id % twin_every == 1 copies id-1's hash with <= 3
    # flipped bits (flip positions also pure functions of id)
    tw = (ids % twin_every) == 1
    src = _mix((u[tw] - np.uint64(1)))
    for salt in (0xA5, 0xC3, 0xE7):
        pos = _mix(u[tw] ^ np.uint64(salt)) % np.uint64(64)
        src ^= np.uint64(1) << pos
    h[tw] = src
    return pa.table({"vid": pa.array(ids, pa.int64()),
                     "h": pa.array(h.view(np.int64), pa.int64())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--twin-every", type=int, default=100)
    ap.add_argument("--max-dist", type=int, default=3)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.hamming import (
        hamming_near_pairs,
    )

    # NOTE: the synth regenerates each batch's source hashes
    # independently, so a twin and its source may land in different
    # batches yet still agree — ids are globally consistent
    ds = (ray.data.range(args.rows)
          .map_batches(lambda b: synth(b, args.twin_every),
                       batch_format="pyarrow").materialize())

    t0 = time.time()
    pairs = hamming_near_pairs(ds, "h", "vid",
                               args.max_dist).materialize()
    wall = time.time() - t0

    n_pairs = pairs.count()
    planted = 0
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=None):
        a = b.column("id_a").to_numpy(zero_copy_only=False)
        bb = b.column("id_b").to_numpy(zero_copy_only=False)
        planted += int(np.sum((bb == a + 1)
                              & (bb % args.twin_every == 1)))
    expect = sum(1 for i in range(1, args.rows, args.twin_every))
    print(json.dumps({
        "rows": args.rows, "max_dist": args.max_dist,
        "wall_sec": round(wall, 1),
        "rows_per_sec": int(args.rows / max(wall, 1e-9)),
        "pairs": n_pairs,
        "planted_found": planted,
        "planted_expected": expect,
        "recall": round(planted / max(expect, 1), 4),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
