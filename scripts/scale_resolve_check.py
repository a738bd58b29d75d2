"""Entity resolution at scale: N surface forms (random names + planted
one-edit variants); reports wall, cluster counts, and planted-variant
recovery (must be 1.0 — deletion blocking is exact for d=1).

    python scripts/scale_resolve_check.py --rows 1000000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _name(u: int) -> str:
    """Deterministic 10-16 char name — a pure function of the id, so a
    variant row can regenerate its source's name in any batch."""
    uu = np.uint64(u)
    ln = 10 + int(_mix(np.array([uu ^ np.uint64(0x51)]))[0] % np.uint64(7))
    out = []
    for k in range(ln):
        c = int(_mix(np.array([uu ^ np.uint64(0x1000 + k)]))[0]
                % np.uint64(26))
        out.append(chr(ord("a") + c))
    return "".join(out)


def _variant(u: int) -> str:
    """One deterministic edit of id u-1's name (sub always CHANGES the
    char, so the edit distance is exactly 1)."""
    base = _name(u - 1)
    uu = np.uint64(u)
    op = int(_mix(np.array([uu ^ np.uint64(0x71)]))[0] % np.uint64(3))
    pos = int(_mix(np.array([uu ^ np.uint64(0x72)]))[0]
              % np.uint64(len(base)))
    ch = _mix(np.array([uu ^ np.uint64(0x73)]))[0]
    if op == 0:  # substitute with a DIFFERENT char
        old = ord(base[pos]) - ord("a")
        new = (old + 1 + int(ch % np.uint64(25))) % 26
        return base[:pos] + chr(ord("a") + new) + base[pos + 1:]
    if op == 1:  # delete
        return base[:pos] + base[pos + 1:]
    return base[:pos] + chr(ord("a") + int(ch % np.uint64(26))) + base[pos:]


def synth(batch: pa.Table, variant_every: int) -> pa.Table:
    ids = batch.column("id").to_numpy().astype(np.int64)
    names = [(_variant(i) if (i % variant_every == 1 and i > 0)
              else _name(i)) for i in ids.tolist()]
    return pa.table({"surface": pa.array(names, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--variant-every", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.resolve import (
        resolve_surface_forms,
    )

    ds = (ray.data.range(args.rows)
          .map_batches(lambda b: synth(b, args.variant_every),
                       batch_format="pyarrow").materialize())

    t0 = time.time()
    out = resolve_surface_forms(ds, col="surface", max_d=1,
                                method="deletions").materialize()
    wall = time.time() - t0

    # check-side only (the operator itself never collects): every planted
    # variant must share its source's entity — chain-safe (extra merges
    # from accidental near-collisions keep the pair in one component)
    ent: dict = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        ent.update(zip(b.column("surface").to_pylist(),
                       b.column("entity_id").to_pylist()))
    planted = missed = 0
    for i in range(1, args.rows, args.variant_every):
        if i == 0:
            continue
        v, s = _variant(i), _name(i - 1)
        planted += 1
        if ent[v] != ent[s]:
            missed += 1
    n_entities = len(set(ent.values()))
    print(json.dumps({
        "rows": args.rows,
        "n_surfaces": len(ent),
        "n_entities": n_entities,
        "wall_sec": round(wall, 1),
        "rows_per_sec": int(args.rows / max(wall, 1e-9)),
        "planted": planted,
        "missed": missed,
        "recall": round(1 - missed / max(planted, 1), 4),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
