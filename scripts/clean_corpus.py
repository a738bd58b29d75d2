"""Corpus-cleanup job entry point (the second production pipeline).

    python scripts/clean_corpus.py --input /path/documents.parquet --out /tmp/clean
    ray job submit --working-dir . -- python scripts/clean_corpus.py \
        --input s3://bucket/docs/ --out s3://bucket/clean/

Reads a documents Parquet (doc_id, text), runs quality filter -> langid
filter -> exact dedup -> MinHash near-dup anti-join, and writes the
surviving rows as hash-partitioned Parquet + _MANIFEST.json (resumable:
re-running with the same fingerprint skips completed partitions) +
METRICS.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser(description="documents -> cleaned corpus")
    ap.add_argument("--input", required=True, help="documents Parquet path")
    ap.add_argument("--out", required=True, help="output corpus directory")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--min-chars", type=int, default=50)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--fingerprint", default="")
    ap.add_argument("--redact", action="store_true",
                    help="scrub PII (email/phone/IPv4 -> typed tokens) "
                         "after cleaning; text column is replaced")
    ap.add_argument("--epoch", default="",
                    help="incremental-crawl mode: drop docs already "
                         "fingerprinted by PRIOR epochs (<out>/_FPSTORE), "
                         "record this epoch's survivors, write under "
                         "<out>/epoch=<e>/ — idempotent per epoch")
    ap.add_argument("--compact-store", action="store_true",
                    help="fold the fingerprint store's epoch files into "
                         "one file per partition (membership unchanged, "
                         "atomic manifest swap) and exit")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # CEE_RAY_ADDRESS: connect to an existing cluster (multi-node —
        # see RUNBOOK.md); default "local" starts a private session
        ray.init(address=os.environ.get("CEE_RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.pipelines.corpus import (
        corpus_clean,
        write_corpus,
    )
    from calendar_event_entity_extraction_ray.state.metrics import write_metrics

    if args.compact_store:
        from calendar_event_entity_extraction_ray.stages.fpstore import (
            compact_store,
        )

        m = compact_store(os.path.join(args.out, "_FPSTORE"))
        print({"compacted_epochs": m.get("compacted_epochs", []),
               "rows": sum(int(e["rows"]) for e in m["epochs"].values()),
               "partitions": len(next(iter(m["epochs"].values()))
                                 ["parts"]) if m["epochs"] else 0})
        ray.shutdown()
        return 0

    t0 = time.time()
    docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    cleaned = corpus_clean(
        docs, minhash_threshold=args.minhash_threshold,
        min_chars=args.min_chars, keep_lang=args.lang)
    if args.redact:
        import pyarrow as pa

        from calendar_event_entity_extraction_ray.stages.redact import (
            redact_pii,
        )

        def _swap_text(b: "pa.Table") -> "pa.Table":
            keep = [c for c in b.column_names
                    if c not in ("text", "n_email", "n_phone", "n_ipv4")]
            b = b.select(keep)
            return b.rename_columns(
                ["text" if c == "clean_text" else c for c in b.column_names])

        cleaned = redact_pii(cleaned).map_batches(
            _swap_text, batch_format="pyarrow")
    out_dir = args.out
    if args.epoch:
        from calendar_event_entity_extraction_ray.stages.fpstore import (
            append_epoch,
            filter_against_store,
            with_fingerprints,
        )

        store = os.path.join(args.out, "_FPSTORE")
        fp = with_fingerprints(cleaned, "text")
        surv = filter_against_store(
            fp, store, exclude_epoch=args.epoch).materialize()
        append_epoch(surv, store, args.epoch)
        cleaned = surv.drop_columns(["_h1", "_h2"])
        out_dir = os.path.join(args.out, f"epoch={args.epoch}")
    fingerprint = args.fingerprint or (
        f"clean-{args.input}-{args.min_chars}-{args.lang}-"
        f"{args.minhash_threshold}"
        + ("-redact" if args.redact else "")
        + (f"-epoch{args.epoch}" if args.epoch else ""))
    if args.epoch and cleaned.count() == 0:
        # a fully-duplicate epoch: nothing to write, epoch recorded above
        manifest = {"partitions": {}}
    else:
        manifest = write_corpus(cleaned, out_dir, fingerprint=fingerprint,
                                num_partitions=args.partitions)
    wall = time.time() - t0
    n_out = sum(e["rows"] for e in manifest["partitions"].values())
    metrics = {
        "n_docs_out": n_out,
        "wall_sec": round(wall, 2),
        "partitions": len(manifest["partitions"]),
        "fingerprint": fingerprint,
    }
    write_metrics(args.out, metrics)
    print(metrics)
    # outputs are on disk: spill dirs deferred by shared-root exchanges
    # are safe to drop now (lineage can no longer need them)
    from calendar_event_entity_extraction_ray.stages.exchange import (
        cleanup_pending_spill,
    )

    cleanup_pending_spill()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
