"""Set-operator scale datapoints: INTERSECT / EXCEPT / UNION at planted
overlap.

Synthesizes two N-row bags (each key repeated ~N/n_keys times) whose key
ranges overlap by exactly half, runs set_op, and verifies the exact
closed-form distinct-output count:

  left keys  = [0, n_keys)           right keys = [n_keys/2, 3*n_keys/2)
  intersect  = n_keys/2              except      = n_keys/2
  union      = 3*n_keys/2

    python scripts/scale_setop_check.py --rows 20000000 --keys 2000000 --op intersect
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
    ids = batch.column("id").to_numpy()
    k = ids % n_keys
    if side == "r":
        k = k + n_keys // 2
    return pa.table({"k": pa.array(k.astype(np.int64))})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--op", default="intersect",
                    choices=["union", "intersect", "except"])
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--pre-distinct", default="on", choices=["on", "off"])
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.setops import set_op

    n, k = args.rows, args.keys
    blocks = max(int(ray.cluster_resources().get("CPU", 8)) * 4, 8)
    left = ray.data.range(n, override_num_blocks=blocks).map_batches(
        lambda b: synth_side(b, "l", k), batch_format="pyarrow")
    right = ray.data.range(n, override_num_blocks=blocks).map_batches(
        lambda b: synth_side(b, "r", k), batch_format="pyarrow")

    expect = {"intersect": k // 2, "except": k // 2,
              "union": k + k // 2}[args.op]
    t0 = time.time()
    out = set_op(left, right, ["k"], args.op,
                 pre_distinct=args.pre_distinct == "on")
    got = out.count()
    wall = time.time() - t0
    ok = got == expect
    print(json.dumps({
        "metric": f"setop_{args.op}_scale", "rows_per_side": n,
        "keys_per_side": k, "rows_out": got, "expect": expect,
        "ok": bool(ok), "wall_sec": round(wall, 1),
        "pre_distinct": args.pre_distinct,
        "rows_per_sec": round(2 * n / wall, 1),
        "num_cpus": int(ray.cluster_resources().get("CPU", 8)),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
