"""Scale check: CDC chunk dedup (stages/cdcdedup.py).

Corpus: docs assembled from a shared segment pool (planted redundancy)
plus unique salt, ~1 KB each. Verifies at scale:
  1. partitioning-independence — two runs with different input blocks
     and exchange partition counts produce IDENTICAL per-doc rows;
  2. conservation — sum(total_bytes) == corpus bytes, dup <= total;
  3. redundancy detection — corpus-level dup-byte fraction must be
     substantial (docs share pool segments; CDC must find them without
     alignment).
Prints wall + MB/s for the measured run.

Usage: python scripts/scale_cdc_check.py [--docs 200000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_corpus(n_docs: int, seed: int = 3):
    rng = np.random.RandomState(seed)
    pool = ["".join(chr(97 + c) for c in rng.randint(0, 26, size=300))
            for _ in range(64)]
    texts = []
    for i in range(n_docs):
        segs = [pool[j] for j in rng.randint(0, 64, size=3)]
        salt = "".join(chr(97 + c) for c in rng.randint(0, 26, size=100))
        # unique prefix shifts alignment: fixed-size chunking would miss
        # the shared segments; CDC must resync
        texts.append(salt[: (i % 37) + 1] + segs[0] + salt + segs[1]
                     + segs[2])
    return texts


def run(texts, in_blocks: int, n_parts: int):
    import ray

    from calendar_event_entity_extraction_ray.stages.cdcdedup import (
        cdc_dedup_docs,
    )

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(in_blocks).materialize()
    t0 = time.time()
    out = cdc_dedup_docs(ds, num_partitions=n_parts).to_pandas()
    wall = time.time() - t0
    return out.sort_values("doc_id").reset_index(drop=True), wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    texts = make_corpus(args.docs)
    total = sum(len(t) for t in texts)

    a, wall = run(texts, 64, 32)
    b, _ = run(texts, 37, 17)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert int(a["total_bytes"].sum()) == total
    assert (a["dup_bytes"] <= a["total_bytes"]).all()
    frac = a["dup_bytes"].sum() / total
    assert frac > 0.5, frac   # 3 of ~4 segments per doc come from the pool
    print(f"docs={args.docs}  {total/1e6:.0f} MB  wall={wall:.1f}s  "
          f"{total/1e6/wall:.1f} MB/s  dup_frac={frac:.3f}  "
          f"partitioning-independent: exact")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
