"""Persisted-IVF vector store at scale: build a 1M x 64-dim store with
planted cluster structure, then verify (a) queries read only the probed
fraction of files, (b) planted nearest neighbors are recovered exactly.

Construction: 64 well-separated cluster centers; vector i = center[i %
64] + tiny noise, so each query (a clean center) must return vectors of
its own cluster and the IVF cells align with the planted clusters.

    python scripts/scale_vecstore_check.py --rows 1000000 --dim 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--pq-m", type=int, default=0,
                    help="PQ subquantizers (0 = full-precision store)")
    ap.add_argument("--append-rows", type=int, default=0,
                    help="also drive the LSM append + compact cycle "
                         "with this many extra vectors")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.vecstore import (
        append_ivf_store,
        build_ivf_store,
        compact_ivf_store,
        query_ivf_store,
    )

    n, d, C = args.rows, args.dim, args.clusters
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(C, d)) * 10.0
    centers_ref = ray.put(centers)

    def synth(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy()
        c = ray.get(centers_ref)
        g = np.random.default_rng(int(i[0]) + 1)
        v = c[i % C] + g.normal(size=(len(i), d)) * 0.05
        return pa.table({
            "vec_id": pa.array(i.astype(np.int64)),
            "embedding": pa.array(list(v), pa.list_(pa.float64())),
        })

    blocks = max(int(ray.cluster_resources().get("CPU", 8)) * 4, 8)
    ds = ray.data.range(n, override_num_blocks=blocks).map_batches(
        synth, batch_format="pyarrow")

    t0 = time.time()
    manifest = build_ivf_store(ds, "/tmp/vstore_scale", n_cells=C,
                               sample_size=8192,
                               pq_m=(args.pq_m or None))
    t_build = time.time() - t0
    rows_stored = sum(e["rows"] for e in manifest["cells"].values())

    # query 8 clean centers: every returned vec must belong to that
    # cluster (vec_id % C == cluster of the query center)
    qc = [0, 7, 13, 21, 33, 42, 55, 63]
    t0 = time.time()
    res = query_ivf_store("/tmp/vstore_scale", centers[qc], k=10,
                          n_probe=4).to_pandas()
    t_query = time.time() - t0
    files_read = query_ivf_store.last_files_read
    total_cells = query_ivf_store.total_cells
    ok = rows_stored == n
    wrong = 0
    for qi, c in enumerate(qc):
        got = res[res.query_id == qi]
        ok &= len(got) == 10
        wrong += int((got["vec_id"].to_numpy() % C != c).sum())
    ok = ok and wrong == 0 and files_read < total_cells
    recall = 1.0 - wrong / (len(qc) * 10)

    # LSM cycle at the same scale: append a delta epoch, query (must
    # still be planted-exact over base + deltas), compact, re-query
    lsm = {}
    if args.append_rows:
        extra = ray.data.range(
            args.append_rows,
            override_num_blocks=max(8, blocks // 8)).map_batches(
            lambda b: synth(
                pa.table({"id": pa.array(
                    b.column("id").to_numpy() + n)})),
            batch_format="pyarrow")
        t0 = time.time()
        append_ivf_store(extra, "/tmp/vstore_scale", "day2")
        t_append = time.time() - t0
        res2 = query_ivf_store("/tmp/vstore_scale", centers[qc], k=10,
                               n_probe=4).to_pandas()
        wrong2 = sum(int((res2[res2.query_id == qi]["vec_id"]
                          .to_numpy() % C != c).sum())
                     for qi, c in enumerate(qc))
        t0 = time.time()
        m3 = compact_ivf_store("/tmp/vstore_scale")
        t_compact = time.time() - t0
        res3 = query_ivf_store("/tmp/vstore_scale", centers[qc], k=10,
                               n_probe=4).to_pandas()
        wrong3 = sum(int((res3[res3.query_id == qi]["vec_id"]
                          .to_numpy() % C != c).sum())
                     for qi, c in enumerate(qc))
        rows3 = sum(e["rows"] for e in m3["cells"].values())
        lsm = {"append_rows": args.append_rows,
               "append_sec": round(t_append, 1),
               "compact_sec": round(t_compact, 1),
               "rows_after_compact": rows3,
               "wrong_hits_after_append": wrong2,
               "wrong_hits_after_compact": wrong3,
               "post_compact_results_equal": bool(
                   res2.equals(res3))}
        ok = ok and wrong2 == 0 and wrong3 == 0 \
            and rows3 == n + args.append_rows

    print(json.dumps({
        "metric": "ivf_store_scale", "rows": n, "dim": d, "cells": C,
        "pq_m": args.pq_m or None,
        "rows_stored": rows_stored, "build_sec": round(t_build, 1),
        "query_sec": round(t_query, 2), "files_read": files_read,
        "total_cells": total_cells, "wrong_cluster_hits": wrong,
        "recall_at_10": recall,
        **({"lsm": lsm} if lsm else {}),
        "ok": bool(ok),
        "build_vecs_per_sec": round(n / t_build, 1),
        "num_cpus": int(ray.cluster_resources().get("CPU", 8)),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
