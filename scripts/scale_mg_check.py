"""Grouped Misra-Gries heavy hitters at planted scale.

Synthesizes N rows over G groups; within each group, exactly 30% of rows
carry a planted per-group heavy item (id = -1 - group) and the rest
spread over a 100k-item tail. Verifies that EVERY group's planted item
survives the distributed sketch merge with an estimate inside the
guaranteed [true - group_n/(k+1), true] band, and that group_n is exact.

    python scripts/scale_mg_check.py --rows 20000000 --groups 1000 --k 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def synth(batch: pa.Table, n_groups: int) -> pa.Table:
    ids = batch.column("id").to_numpy()
    g = (ids % n_groups).astype(np.int64)
    seq = ids // n_groups
    heavy = (seq % 10) < 3  # exactly 30% of each group's rows
    tail = (ids * np.int64(2654435761)) % 100_000
    v = np.where(heavy, -1 - g, tail).astype(np.int64)
    return pa.table({"g": pa.array(g), "v": pa.array(v)})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--groups", type=int, default=1000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_heavy_hitters,
    )

    n, gs, k = args.rows, args.groups, args.k
    blocks = max(int(ray.cluster_resources().get("CPU", 8)) * 4, 8)
    ds = ray.data.range(n, override_num_blocks=blocks).map_batches(
        lambda b: synth(b, gs), batch_format="pyarrow")

    t0 = time.time()
    out = grouped_heavy_hitters(ds, "g", "v", k=k).to_pandas()
    wall = time.time() - t0

    bad = 0
    found = 0
    per_group = out.set_index(["g", "v"])
    for g in range(gs):
        group_n = n // gs + (1 if g < n % gs else 0)
        # exactly 30%: seq in [0, group_n), heavy where seq % 10 < 3
        true = (group_n // 10) * 3 + min(group_n % 10, 3)
        bound = group_n / (k + 1)
        key = (g, -1 - g)
        if key not in per_group.index:
            bad += 1
            continue
        row = per_group.loc[key]
        found += 1
        if not (true - bound <= int(row["mg_est"]) <= true
                and int(row["group_n"]) == group_n):
            bad += 1
    ok = bad == 0 and found == gs
    print(json.dumps({
        "metric": "grouped_mg_scale", "rows": n, "groups": gs, "k": k,
        "planted_found": found, "violations": bad,
        "sketch_rows_out": int(len(out)), "ok": bool(ok),
        "wall_sec": round(wall, 1), "rows_per_sec": round(n / wall, 1),
        "num_cpus": int(ray.cluster_resources().get("CPU", 8)),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
