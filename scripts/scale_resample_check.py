"""resample_fill at scale: N events over K users across a 30-day span,
hourly buckets — the output grid is span-bound (users x hours), usually
LARGER than the input. Consumed streaming (never pulled to the driver).

    python scripts/scale_resample_check.py --events 10000000 --users 50000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa

SPAN_S = 30 * 24 * 3600


def synth(batch: pa.Table, users: int) -> pa.Table:
    ids = batch.column("id").to_numpy().astype(np.int64)
    rng = np.random.RandomState(int(ids[0]) % (2**31) if len(ids) else 0)
    ts = rng.randint(0, SPAN_S, len(ids)) * 1_000_000
    return pa.table({
        "user_id": pa.array(rng.randint(0, users, len(ids))
                            .astype(np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array(rng.uniform(0, 100, len(ids)).round(2)),
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=50_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.windows import (
        resample_fill,
    )

    ds = (ray.data.range(args.events)
          .map_batches(lambda b: synth(b, args.users),
                       batch_format="pyarrow").materialize())

    t0 = time.time()
    out = resample_fill(ds, bucket_s=3600)
    rows = 0
    n_total = 0
    zero_rows = 0
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        rows += b.num_rows
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        n_total += int(n.sum())
        zero_rows += int((n == 0).sum())
    wall = time.time() - t0

    print(json.dumps({
        "events": args.events, "users": args.users,
        "wall_sec": round(wall, 1),
        "events_per_sec": int(args.events / max(wall, 1e-9)),
        "grid_rows": rows,
        "gap_rows": zero_rows,
        "events_conserved": bool(n_total == args.events),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
