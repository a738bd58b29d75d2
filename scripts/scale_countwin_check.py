"""Scale check for count-based windows with planted closed-form truth.

Synthesizes N events over K keys (event i: key = i % K, per-key sequence
position = i // K, ts = position seconds, value = 1.0) — every key gets
exactly E = N/K events in a known order, so the window layout is closed
form: tumbling windows of n have ceil(E/n) windows per key with sizes
(n, ..., n, E mod n or n); sliding windows (n, slide s) have
floor((E-1)/s)+1 windows per key, window w holding min(n, E - w*s)
events. Sums are exact cents (value=1.0 -> 100 per event), so every
window's sum_cents == 100 * n_events.

Usage:
    python scripts/scale_countwin_check.py --rows 10000000 --keys 100000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pyarrow as pa


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--slide", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.windows import (
        count_windows,
    )

    N, K, n, s = args.rows, args.keys, args.n, args.slide
    assert N % K == 0, "--rows must be a multiple of --keys"
    E = N // K

    def synth(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy()
        pos = (i // K).astype(np.int64)
        return pa.table({
            "user_id": pa.array((i % K).astype(np.int64)),
            "ts": pa.array(pos * 1_000_000).cast(pa.timestamp("us")),
            "event_id": pa.array(i.astype(np.int64)),
            "value": pa.array(np.ones(len(i))),
        })

    blocks = max(args.num_cpus * 4, 8)
    results = {}
    ok = True
    for form, slide in (("tumbling", None), ("sliding", s)):
        ds = ray.data.range(N, override_num_blocks=blocks).map_batches(
            synth, batch_format="pyarrow")
        t0 = time.time()
        out = count_windows(ds, n=n, slide=slide)
        # verify via bounded aggregates: per-(window_id, n_events) counts
        import collections

        hist: collections.Counter = collections.Counter()
        total_rows = 0
        sum_ok = True
        for b in out.iter_batches(batch_format="pyarrow",
                                  batch_size=None):
            wid = b.column("window_id").to_numpy()
            ne = b.column("n_events").to_numpy()
            sc = b.column("sum_cents").to_numpy()
            sum_ok &= bool((sc == ne * 100).all())
            total_rows += len(wid)
            key = np.stack([wid, ne])
            uq, cnt = np.unique(key, axis=1, return_counts=True)
            for (w, e2), c in zip(uq.T, cnt):
                hist[(int(w), int(e2))] += int(c)
        wall = time.time() - t0
        # closed form
        want: dict = {}
        if slide is None:
            n_w = -(-E // n)
            for w in range(n_w):
                size = n if (w + 1) * n <= E else E - w * n
                want[(w, size)] = K
        else:
            n_w = (E - 1) // slide + 1
            for w in range(n_w):
                size = min(n, E - w * slide)
                want[(w, size)] = K
        form_ok = sum_ok and dict(hist) == want and \
            total_rows == len(want) * K
        ok &= form_ok
        results[form] = {"wall_sec": round(wall, 1),
                         "windows": total_rows, "ok": bool(form_ok),
                         "events_per_sec": round(N / wall, 1)}

    print(json.dumps({
        "metric": "count_windows_scale", "rows": N, "keys": K,
        "n": n, "slide": s, **results, "ok": bool(ok),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
