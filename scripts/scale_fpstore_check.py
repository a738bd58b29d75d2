"""Incremental crawl dedup at scale: build a 2M-doc fingerprint store
(epoch 1), then dedup a 500k-doc epoch 2 with a planted cross-epoch dup
rate against it — incremental cost is O(epoch), the rebuild baseline is
O(corpus). Reports both regimes (broadcast / exchange) + the union
re-dedup baseline + recovery correctness.

    python scripts/scale_fpstore_check.py --base 2000000 --delta 500000
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def _text(i: int, fresh: bool) -> str:
    # deterministic per-id; dup rows re-generate a base-epoch text
    tag = "base" if fresh else "dup"
    digest = hashlib.md5(f"fp-{tag}-{i}".encode()).digest()
    rng = np.random.RandomState(np.frombuffer(digest, dtype=np.uint32))
    return " ".join(f"w{w}" for w in rng.randint(0, 50_000, 30))


def synth(batch: pa.Table, offset: int, dup_of: int,
          dup_rate: float) -> pa.Table:
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        i = int(i)
        if dup_of and (i % 1000) < dup_rate * 1000:
            # copy a base-epoch doc's text (cross-epoch duplicate)
            texts.append(_text(i % dup_of, True))
        else:
            texts.append(_text(i + offset, True))
    return pa.table({
        "doc_id": pa.array(ids.astype(np.int64) + offset, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=2_000_000)
    ap.add_argument("--delta", type=int, default=500_000)
    ap.add_argument("--dup-rate", type=float, default=0.5)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.dedup import (
        exact_dedup,
    )
    from calendar_event_entity_extraction_ray.stages.fpstore import (
        dedup_incremental,
        filter_against_store,
        with_fingerprints,
    )

    store = tempfile.mkdtemp(prefix="fpstore-scale-")
    # pin both epochs to DISK (untimed): every timed op below reads its
    # input from parquet, like a real crawl pipeline — the rebuild
    # baseline must pay the full prior-corpus text scan, the incremental
    # path only the 16 B/doc fingerprint store
    data_dir = tempfile.mkdtemp(prefix="fpstore-data-")
    (ray.data.range(args.base)
     .map_batches(lambda b: synth(b, 0, 0, 0.0), batch_format="pyarrow")
     .write_parquet(data_dir + "/base"))
    (ray.data.range(args.delta)
     .map_batches(
         lambda b: synth(b, args.base, args.base, args.dup_rate),
         batch_format="pyarrow")
     .write_parquet(data_dir + "/delta"))
    base = ray.data.read_parquet(data_dir + "/base")
    delta = ray.data.read_parquet(data_dir + "/delta")

    t0 = time.time()
    s1 = dedup_incremental(base, store, "e1").materialize()
    t_e1 = time.time() - t0

    t0 = time.time()
    s2 = dedup_incremental(delta, store, "e2", mode="exchange"
                           ).materialize()
    t_e2_exchange = time.time() - t0
    n_e2 = s2.count()

    # broadcast regime on the same epoch (exclude own epoch -> identical
    # membership test), timed separately
    fp = with_fingerprints(delta, "text")
    t0 = time.time()
    n_bc = filter_against_store(fp, store, exclude_epoch="e2",
                                mode="broadcast").count()
    t_e2_broadcast = time.time() - t0

    # baseline: re-dedup the UNION corpus from scratch
    t0 = time.time()
    n_union = exact_dedup(base.union(delta), ["text"], "doc_id").count()
    t_rebuild = time.time() - t0

    # Bloom-sidecar IO report (round-4 verdict item 4): a SMALL daily
    # epoch at a low dup rate against the now-2.5M-fp store — the
    # sidecar prefilter should skip most fingerprint files outright
    # (membership stays exact; checked against the broadcast regime)
    small_n = max(10_000, args.delta // 25)
    (ray.data.range(small_n)
     .map_batches(lambda b: synth(b, args.base + args.delta, args.base,
                                  0.001), batch_format="pyarrow")
     .write_parquet(data_dir + "/small"))
    small = ray.data.read_parquet(data_dir + "/small")
    fp_small = with_fingerprints(small, "text")
    iolog = tempfile.mkdtemp(prefix="fpstore-iolog-")
    t0 = time.time()
    n_small_ex = filter_against_store(
        fp_small, store, exclude_epoch="e3", mode="exchange",
        io_log_dir=iolog).count()
    t_small_ex = time.time() - t0
    n_small_bc = filter_against_store(
        fp_small, store, exclude_epoch="e3", mode="broadcast").count()
    import os as _os
    recs = [json.load(open(_os.path.join(iolog, f)))
            for f in _os.listdir(iolog)]
    io = {k: sum(r[k] for r in recs)
          for k in ("files_read", "files_skipped",
                    "bytes_read", "bytes_skipped")}
    shutil.rmtree(iolog, ignore_errors=True)

    expect = int(args.delta * (1 - args.dup_rate))
    print(json.dumps({
        "base": args.base, "delta": args.delta,
        "dup_rate": args.dup_rate,
        "e1_sec": round(t_e1, 1),
        "e2_exchange_sec": round(t_e2_exchange, 1),
        "e2_broadcast_sec": round(t_e2_broadcast, 1),
        "rebuild_sec": round(t_rebuild, 1),
        "e2_survivors": n_e2,
        "e2_survivors_broadcast_regime": n_bc,
        "expected_survivors": expect,
        "union_total": n_union,
        "bloom_small_epoch": {
            "rows": small_n, "dup_rate": 0.001,
            "survivors_exchange": n_small_ex,
            "survivors_broadcast": n_small_bc,
            "sec": round(t_small_ex, 1), **io,
            "fp_bytes_untouched_pct": round(
                100.0 * io["bytes_skipped"]
                / max(1, io["bytes_read"] + io["bytes_skipped"]), 1),
        },
        "ok": bool(n_e2 == n_bc
                   and n_union == s1.count() + n_e2
                   and n_small_ex == n_small_bc),
    }))
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(data_dir, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
