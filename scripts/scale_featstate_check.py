"""Epoch-incremental decayed counters at scale: 10M events over 100k
keys, ingested as 3 time-ordered epochs, then verified EXACTLY against
the single-shot batch operator (stages/windows.py:decayed_counts) over
the full concatenated history — the invariant that makes the state
store trustworthy.

    python scripts/scale_featstate_check.py --rows 10000000 --keys 100000
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pyarrow as pa


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--half-life", type=int, default=2)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.featstate import (
        decayed_counter_epoch,
        read_decayed_counters,
    )
    from calendar_event_entity_extraction_ray.stages.windows import (
        decayed_counts,
    )

    N, K, E = args.rows, args.keys, args.epochs
    span_s = 3600 * 400  # 400 h >> cap x half_life: the horizon engages

    def synth(b: pa.Table, lo: int, hi: int) -> pa.Table:
        # deterministic event i: key = i % K, ts in [lo, hi) by a hash mix
        i = b.column("id").to_numpy()
        t = lo + (i * 2654435761 % (hi - lo))
        return pa.table({
            "user_id": pa.array((i % K).astype(np.int64)),
            "ts": pa.array((t * 1_000_000).astype(np.int64)).cast(
                pa.timestamp("us")),
        })

    blocks = max(args.num_cpus * 4, 8)
    per = N // E
    bounds = [(e * span_s // E, (e + 1) * span_s // E) for e in range(E)]

    sd = "/tmp/featstate_scale"
    shutil.rmtree(sd, ignore_errors=True)
    t0 = time.time()
    for e, (lo, hi) in enumerate(bounds):
        ds = ray.data.range(per, override_num_blocks=blocks).map_batches(
            lambda b, lo=lo, hi=hi: synth(b, lo, hi),
            batch_format="pyarrow")
        decayed_counter_epoch(ds, sd, f"e{e}",
                              half_life_hours=args.half_life,
                              num_partitions=32)
    t_ingest = time.time() - t0

    t0 = time.time()
    got = read_decayed_counters(sd).to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    t_read = time.time() - t0

    # single-shot batch operator over the SAME full history
    full = None
    for lo, hi in bounds:
        d = ray.data.range(per, override_num_blocks=blocks).map_batches(
            lambda b, lo=lo, hi=hi: synth(b, lo, hi),
            batch_format="pyarrow")
        full = d if full is None else full.union(d)
    ref_us = (max(hi for _, hi in bounds) - 1) * 1_000_000
    # exact ref: the state's ref is the true max ts; recompute it
    import pandas as pd

    ref_us = int(pd.Timestamp(full.max("ts")).value // 1_000)
    t0 = time.time()
    want = decayed_counts(full, "user_id", "ts", ref_us,
                          half_life_hours=args.half_life).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    t_batch = time.time() - t0

    ok = (len(got) == len(want) == K
          and (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
          and (got["n_events"].to_numpy(np.int64)
               == want["n_events"].to_numpy(np.int64)).all()
          and (got["decayed_num"].to_numpy(np.int64)
               == want["decayed_num"].to_numpy(np.int64)).all())
    print(json.dumps({
        "metric": "featstate_scale", "rows": N, "keys": K, "epochs": E,
        "ingest_sec": round(t_ingest, 1),
        "events_per_sec_ingest": round(N / t_ingest, 1),
        "read_sec": round(t_read, 1), "batch_sec": round(t_batch, 1),
        "state_exact_vs_batch": bool(ok), "ok": bool(ok),
        "num_cpus": args.num_cpus,
    }))
    shutil.rmtree(sd, ignore_errors=True)
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
