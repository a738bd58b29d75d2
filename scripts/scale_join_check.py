"""Wide-join scale datapoints: composite-key and FULL OUTER hash joins.

Synthesizes two N-row sides keyed on a composite (a, b) pair where only
a deterministic subset matches, runs hash_join in the requested mode,
and verifies the exact expected output row count (the synthetic key
layout makes it computable in closed form).

    python scripts/scale_join_check.py --rows 10000000 --how full
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def synth_side(batch: pa.Table, side: str, n_keys: int) -> pa.Table:
    """Row i -> key pair (i % n_keys, (i % n_keys) % 97). The left side
    keeps every key; the right side shifts the low half of the key space
    by n_keys (no match), so exactly half the key range matches."""
    ids = batch.column("id").to_numpy()
    a = ids % n_keys
    if side == "r":
        a = np.where(a < n_keys // 2, a + n_keys, a)
    b = a % 97
    t = {"a": pa.array(a.astype(np.int64)), "b": pa.array(b.astype(np.int64))}
    t["lv" if side == "l" else "rv"] = pa.array(ids.astype(np.int64))
    return pa.table(t)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--how", default="inner",
                    choices=["inner", "left", "full"])
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.joins import hash_join

    n, k = args.rows, args.keys
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    blocks = max(ncpu * 4, 8)
    left = ray.data.range(n, override_num_blocks=blocks).map_batches(
        lambda b: synth_side(b, "l", k), batch_format="pyarrow")
    right = ray.data.range(n, override_num_blocks=blocks).map_batches(
        lambda b: synth_side(b, "r", k), batch_format="pyarrow")

    t0 = time.time()
    out = hash_join(left, right, ["a", "b"], ["a", "b", "lv"],
                    ["a", "b", "rv"], how=args.how)
    n_out = out.count()
    wall = time.time() - t0

    # per matching key: n/k rows on each side -> (n/k)^2 joined rows over
    # k/2 matching keys; unmatched keys contribute their bare rows for
    # left (left half) / full (both halves) joins
    per_key = n // k
    matched = (k // 2) * per_key * per_key
    unmatched_side = (k - k // 2) * per_key
    expect = {"inner": matched,
              "left": matched + unmatched_side,
              "full": matched + 2 * unmatched_side}[args.how]
    ok = n_out == expect
    print(json.dumps({
        "metric": f"hash_join_{args.how}_composite_scale",
        "rows_per_side": n, "distinct_pairs": k, "how": args.how,
        "out_rows": int(n_out), "expect_rows": int(expect), "ok": bool(ok),
        "wall_sec": round(wall, 1),
        "input_rows_per_sec": round(2 * n / wall, 1),
        "num_cpus": ncpu,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
