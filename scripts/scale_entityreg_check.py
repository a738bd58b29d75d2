"""Scale check: persistent entity registry (stages/entityreg.py).

Construction with exact planted truth: base epoch = N distinct machine
names `ent<k>xq` (pairwise distance >= 2 by construction spacing, so
every base surface is its own canonical); delta epoch = M typos, each a
single-char substitution of a known base name (distance exactly 1, and
the typo alphabet keeps typos >= 2 apart from every OTHER base name and
from each other), plus M fresh names never seen. Verifies EXACTLY:
  * every typo resolved to its intended base canonical;
  * every fresh name minted itself;
  * every base id unchanged after the delta epoch;
and measures the incremental claim: delta-epoch wall << base wall
(epoch cost is O(delta x neighborhood + touched partitions), not
O(registry)).

Usage: python scripts/scale_entityreg_check.py [--base 300000] [--delta 30000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def base_names(n):
    # DOUBLED digits: two distinct ids differ in >= 1 digit -> >= 2
    # chars, so base names are pairwise distance >= 2 (no accidental
    # base-base clustering); the trailing 'xq' is the typo target
    return ["ent" + "".join(c * 2 for c in f"{k:09d}") + "xq"
            for k in range(n)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=300_000)
    ap.add_argument("--delta", type=int, default=30_000)
    args = ap.parse_args()

    import ray

    from calendar_event_entity_extraction_ray.stages.entityreg import (
        lookup_surfaces,
        register_epoch,
        registry_rows,
    )

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    store = "/tmp/cee_entreg_scale"
    shutil.rmtree(store, ignore_errors=True)
    rng = np.random.RandomState(5)

    base = base_names(args.base)
    victims = rng.choice(args.base, size=args.delta, replace=False)
    typos = {}
    for v in victims:
        s = base[v]
        # mutate the 'x' of the unique suffix: distance 1 from the
        # victim, >= 2 from every other base name (their digits differ),
        # and unique per victim (the digit core is preserved)
        typo = s[:-2] + "Z" + s[-1]
        typos[typo] = s
    fresh = ["new" + "".join(c * 2 for c in f"{k:09d}") + "xq"
             for k in range(args.delta)]

    def ds_of(surfs):
        return ray.data.from_arrow(pa.table({
            "surface": pa.array(surfs, pa.string())})) \
            .repartition(64).materialize()

    P = 64
    t0 = time.time()
    s1 = register_epoch(ds_of(base), store, "base", num_partitions=P)
    w_base = time.time() - t0
    assert s1["n_new"] == args.base

    t0 = time.time()
    s2 = register_epoch(ds_of(sorted(typos) + fresh), store, "delta",
                        num_partitions=P)
    w_delta = time.time() - t0
    assert s2["n_new"] == 2 * args.delta, s2

    t0 = time.time()
    look = lookup_surfaces(
        ds_of(sorted(typos) + fresh + base[:1000]), store).to_pandas()
    w_look = time.time() - t0
    got = dict(zip(look["surface"], look["entity_id"]))
    for t_, b_ in typos.items():
        assert got[t_] == b_, (t_, got[t_], b_)
    for f_ in fresh:
        assert got[f_] == f_, (f_, got[f_])
    for b_ in base[:1000]:
        assert got[b_] == b_
    print(f"base={args.base}: {w_base:.1f}s  "
          f"delta={2 * args.delta} new over {args.base}-entity registry: "
          f"{w_delta:.1f}s ({w_base / w_delta:.1f}x faster than base)  "
          f"lookup {len(look)} surfaces: {w_look:.1f}s  "
          f"store rows={registry_rows(store)}  all mappings verified exact")
    shutil.rmtree(store, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
