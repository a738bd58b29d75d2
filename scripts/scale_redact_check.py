"""PII-redaction throughput at planted scale.

Synthesizes N ~60-word docs; every 3rd doc carries one e-mail, every 5th
one phone number, every 7th one IPv4 (deterministic from doc id).
Verifies exact per-category replacement totals and that no placeholder
token is missing or doubled.

    python scripts/scale_redact_check.py --docs 5000000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def synth(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy()
    texts = []
    for i in ids:
        i = int(i)
        words = [f"w{(i * 31 + j) % 9973}" for j in range(60)]
        if i % 3 == 0:
            words[10] = f"user{i}@example-{i % 50}.org"
        if i % 5 == 0:
            words[25] = f"+1-{100 + i % 900}-555-{1000 + i % 9000}"
        if i % 7 == 0:
            words[40] = f"10.{i % 256}.{(i // 256) % 256}.{i % 200}"
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                     "text": pa.array(texts, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.redact import (
        redact_pii,
    )

    n = args.docs
    blocks = max(int(ray.cluster_resources().get("CPU", 8)) * 4, 8)
    docs = ray.data.range(n, override_num_blocks=blocks).map_batches(
        synth, batch_format="pyarrow").materialize()

    t0 = time.time()
    out = redact_pii(docs)

    def agg(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tok = {f"tok_{t}": pc.sum(pc.count_substring(
            b.column("clean_text"), f"<{t}>")).as_py() or 0
            for t in ("EMAIL", "PHONE", "IP")}
        return pa.table({
            "n_email": pa.array([pc.sum(b.column("n_email")).as_py() or 0]),
            "n_phone": pa.array([pc.sum(b.column("n_phone")).as_py() or 0]),
            "n_ipv4": pa.array([pc.sum(b.column("n_ipv4")).as_py() or 0]),
            **{k: pa.array([v]) for k, v in tok.items()},
        })

    tot = out.map_batches(agg, batch_format="pyarrow").to_pandas().sum()
    wall = time.time() - t0

    def planted(mod: int) -> int:
        return (n + mod - 1) // mod

    ok = (tot["n_email"] == planted(3) == tot["tok_EMAIL"]
          and tot["n_phone"] == planted(5) == tot["tok_PHONE"]
          and tot["n_ipv4"] == planted(7) == tot["tok_IP"])
    print(json.dumps({
        "metric": "redact_scale", "docs": n,
        "emails": int(tot["n_email"]), "phones": int(tot["n_phone"]),
        "ips": int(tot["n_ipv4"]),
        "expect": [planted(3), planted(5), planted(7)],
        "ok": bool(ok), "wall_sec": round(wall, 1),
        "docs_per_sec": round(n / wall, 1),
        "num_cpus": int(ray.cluster_resources().get("CPU", 8)),
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
