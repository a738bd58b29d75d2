"""Scale check: epoch-incremental HLL distinct state (stages/hllstate.py).

10M events / 3 epochs / 100k keys: the state after all epochs must equal
the single-shot batch operator's registers BIT-FOR-BIT (max-merge order
independence at scale), and sampled estimates must land within 5% of the
exact per-key distinct counts (closed-form construction: key i sees
exactly `50 + i % 400` distinct users).

Usage: python scripts/scale_hllstate_check.py [--events 10000000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_epoch(n, seed, n_keys):
    rng = np.random.RandomState(seed)
    ki = rng.randint(0, n_keys, size=n)
    n_dist = 50 + (ki % 400)                 # per-key distinct universe
    ui = rng.randint(0, 1 << 30, size=n) % n_dist
    keys = pd.Series(ki).map(lambda i: f"key{i:06d}").to_numpy(object)
    vals = pd.Series(ki * 1000 + ui).map(lambda u: f"u{u}") \
        .to_numpy(object)
    return pa.table({"k": pa.array(keys, pa.string()),
                     "v": pa.array(vals, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    args = ap.parse_args()

    import ray

    from calendar_event_entity_extraction_ray.stages import hllstate as H

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    sd = "/tmp/cee_hll_scale"
    shutil.rmtree(sd, ignore_errors=True)
    per = args.events // 3
    tables = [make_epoch(per, s, args.keys) for s in (1, 2, 3)]

    t0 = time.time()
    for i, t in enumerate(tables):
        ds = ray.data.from_arrow(t).repartition(64)
        H.hll_distinct_epoch(ds, sd, f"e{i}", "k", "v", p=12,
                             num_partitions=32)
    w_ingest = time.time() - t0

    t0 = time.time()
    state = H.read_hll_registers(sd)
    w_read = time.time() - t0

    # bit-for-bit vs the batch operator over the full history
    full = ray.data.from_arrow(pa.concat_tables(tables)).repartition(48)
    batch = H._register_rows(full, "k", "v", 12, num_partitions=24)
    batch = batch.sort_values(["k", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        state[["k", "bucket", "rank"]].astype({"rank": "int64"}),
        batch[["k", "bucket", "rank"]].astype({"rank": "int64"}))

    # sampled estimate accuracy vs the OBSERVED exact distinct (driver-
    # side pandas over the already-in-memory event tables; the sample is
    # deterministic)
    est = H.read_hll_distinct(sd).set_index("key")["est"]
    ev = pa.concat_tables(tables).to_pandas()
    sample = {f"key{i:06d}" for i in range(0, args.keys,
                                           max(1, args.keys // 200))}
    truth = (ev[ev["k"].isin(sample)].groupby("k")["v"].nunique())
    bad = 0
    for k, n in truth.items():
        if abs(est[k] - n) / n > 0.06:
            bad += 1
    assert bad <= max(4, len(truth) // 50), (bad, len(truth))

    print(f"events={args.events}  keys={args.keys}  "
          f"ingest {w_ingest:.1f}s ({args.events/1e6/w_ingest:.2f}M ev/s)  "
          f"state rows={len(state)}  serving read {w_read:.1f}s  "
          f"state == batch registers bit-for-bit; "
          f"sampled estimates within tolerance ({bad}/{len(truth)} outliers)")
    shutil.rmtree(sd, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
