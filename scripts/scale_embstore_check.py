"""Epoch-incremental SemDeDup at scale with planted truth.

Epoch 1 ingests N random unit vectors (dim 64 -> pairwise cosine ~0,
nothing drops at tau 0.8). Epoch 2 ingests M vectors where every
``dup_mod``-th is an EXACT copy of an epoch-1 vector (cosine 1 against
the store, and an identical vector assigns to the identical cell, so
every copy MUST drop) and the rest are fresh (must survive: max cosine
against ~N/k stored vectors concentrates near 4.5/sqrt(dim) ~ 0.56
<< tau). The check verifies the survivor set EXACTLY (count + id-sum,
computed by streaming aggregates — nothing lands on the driver) and
reports per-epoch wall + store size.

    python scripts/scale_embstore_check.py --base 1000000 --delta 200000
"""

from __future__ import annotations

import argparse

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa

from calendar_event_entity_extraction_ray.functions.bloom import _mix

DIM = 64


def _unit(ids: np.ndarray) -> np.ndarray:
    """Deterministic unit vector per id, fully vectorized: splitmix64
    mixes (id, dim-pair) to uniforms, Box-Muller to normals. A given id
    always yields the same vector — what the planted-copy truth needs."""
    ids = ids.astype(np.uint64)
    cols = []
    for j in range(0, DIM, 2):
        h = _mix(ids * np.uint64(DIM + 1) + np.uint64(j),
                 0x9E3779B97F4A7C15)
        u1 = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        h2 = _mix(h, 0xBF58476D1CE4E5B9)
        u2 = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        r = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-300)))
        cols.append(r * np.cos(2 * np.pi * u2))
        cols.append(r * np.sin(2 * np.pi * u2))
    out = np.stack(cols[:DIM], axis=1)
    return out / np.linalg.norm(out, axis=1, keepdims=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--delta", type=int, default=200_000)
    ap.add_argument("--dup-mod", type=int, default=10,
                    help="every dup_mod-th delta row copies a base row")
    ap.add_argument("--cells", type=int, default=64)
    # tau 0.9 = 7.2 sigma of the random-pair cosine (sd 1/sqrt(64)):
    # ~2e-3 expected spurious in-cell pairs across 1M base vectors,
    # while planted copies sit at cosine exactly 1.0
    ap.add_argument("--tau", type=float, default=0.9)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages import embstore as EB

    N, M, DM = args.base, args.delta, args.dup_mod

    def synth_base(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy().astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(_unit(ids)),
                                  pa.list_(pa.float64()))})

    def synth_delta(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy().astype(np.int64)
        # copies reuse the BASE id's seed -> identical vector
        src = np.where(ids % DM == 0, ids % N, ids + N)
        return pa.table({
            "vec_id": pa.array(ids + N),
            "embedding": pa.array(list(_unit(src)),
                                  pa.list_(pa.float64()))})

    blocks = max(args.num_cpus * 4, 8)
    sd = tempfile.mkdtemp(prefix="embstore_scale_")
    try:
        e1 = ray.data.range(N, override_num_blocks=blocks).map_batches(
            synth_base, batch_format="pyarrow")
        t0 = time.time()
        s1 = EB.dedup_epoch(e1, sd, "e1", k=args.cells, tau=args.tau)
        n1 = s1.count()
        t_e1 = time.time() - t0

        e2 = ray.data.range(M, override_num_blocks=blocks).map_batches(
            synth_delta, batch_format="pyarrow")
        t0 = time.time()
        s2 = EB.dedup_epoch(e2, sd, "e2", k=args.cells, tau=args.tau)
        t_e2 = time.time() - t0

        # exact survivor verification by streaming aggregates: the
        # planted survivors are exactly the fresh rows (ids + N where
        # ids % DM != 0) — count AND id-sum must both match
        n_dups = len(range(0, M, DM))
        stats = s2.map_batches(
            lambda b: pa.table({
                "n": pa.array([b.num_rows], pa.int64()),
                "id_sum": pa.array(
                    [int(b.column("vec_id").to_numpy().sum())]
                    if b.num_rows else [0], pa.int64())}),
            batch_format="pyarrow").sum(["n", "id_sum"])
        n2 = int(stats["sum(n)"])
        got_sum = int(stats["sum(id_sum)"])
        fresh = np.arange(M, dtype=np.int64)
        fresh = fresh[fresh % DM != 0] + N   # vec_id = delta idx + N
        want_sum = int(fresh.sum())
    finally:
        shutil.rmtree(sd, ignore_errors=True)

    ok = (n1 == N and n2 == M - n_dups and got_sum == want_sum)
    print(json.dumps({
        "metric": "embstore_scale", "base": N, "delta": M,
        "dim": DIM, "cells": args.cells, "tau": args.tau,
        "e1_sec": round(t_e1, 1), "e2_sec": round(t_e2, 1),
        "e1_survivors": n1, "e2_survivors": n2,
        "planted_dups": n_dups, "survivor_id_sum_exact": got_sum == want_sum,
        "vecs_per_sec_e2": int(M / t_e2),
        "ok": bool(ok),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
