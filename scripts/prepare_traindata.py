"""Training-data preparation job entry point (third pipeline surface).

    python scripts/prepare_traindata.py --input /path/documents.parquet \
        --out /tmp/traindata
    ray job submit --working-dir . -- python scripts/prepare_traindata.py ...

Runs pipelines/traindata.py end-to-end (id-hash split -> corpus_clean ->
n-gram decontamination vs the raw eval side -> first-fit packing ->
packed sequences) and writes the sequences as hash-partitioned Parquet +
_MANIFEST.json (resumable: re-running with the same fingerprint skips
completed partitions) + METRICS.json.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import pyarrow as pa


def main() -> int:
    ap = argparse.ArgumentParser(
        description="documents -> packed training sequences")
    ap.add_argument("--input", required=True, help="documents Parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--bucket-size", type=int, default=32)
    ap.add_argument("--n-gram", type=int, default=4)
    ap.add_argument("--lm-quantile", type=float, default=0.0,
                    help="drop this fraction of lowest bigram-LM-scoring "
                         "docs after cleaning (0 = off)")
    ap.add_argument("--fingerprint", default="")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.pipelines.corpus import (
        write_corpus,
    )
    from calendar_event_entity_extraction_ray.pipelines.traindata import (
        training_sequences,
    )
    from calendar_event_entity_extraction_ray.state.metrics import write_metrics

    t0 = time.time()
    docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    seqs = training_sequences(docs, n_gram=args.n_gram,
                              capacity=args.capacity,
                              bucket_size=args.bucket_size,
                              lm_quantile=args.lm_quantile)

    def add_seq_id(b: pa.Table) -> pa.Table:
        # deterministic total order for the partition writer's sort
        import numpy as np

        sid = (b.column("bucket").to_numpy() * 1_000_000
               + b.column("bin").to_numpy()).astype(np.int64)
        return b.append_column("seq_id", pa.array(sid))

    seqs = seqs.map_batches(add_seq_id, batch_format="pyarrow")
    fingerprint = args.fingerprint or (
        f"traindata-{args.input}-{args.capacity}-{args.bucket_size}-"
        f"{args.n_gram}"
        # appended only when set so pre-existing manifests keep resuming
        + (f"-lmq{args.lm_quantile}" if args.lm_quantile else ""))
    manifest = write_corpus(seqs, args.out, fingerprint=fingerprint,
                            id_col="seq_id",
                            num_partitions=args.partitions)
    wall = time.time() - t0
    n_out = sum(e["rows"] for e in manifest["partitions"].values())
    metrics = {
        "n_sequences": n_out,
        "wall_sec": round(wall, 2),
        "partitions": len(manifest["partitions"]),
        "fingerprint": fingerprint,
    }
    write_metrics(args.out, metrics)
    print(metrics)
    from calendar_event_entity_extraction_ray.stages.exchange import (
        cleanup_pending_spill,
    )

    cleanup_pending_spill()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
