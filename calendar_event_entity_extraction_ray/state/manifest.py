"""Resumable partitioned output: per-partition Parquet + _MANIFEST.json.

"Resumable from checkpoint" for a batch pipeline (SURVEY.md §4, ray_guide.md
"Sources & sinks"): the graph materialize writes one directory per partition
(key = hash(subj) % num_partitions), each written atomically (temp file +
rename), and records a manifest entry (partition id, file, row count, input
fingerprint). A re-run with the same fingerprint skips completed partitions
and recomputes only the missing ones.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_MANIFEST.json"


def load_manifest(out_dir: str) -> Dict:
    path = os.path.join(out_dir, MANIFEST_NAME)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"fingerprint": None, "partitions": {}, "lineage": []}


def save_manifest(out_dir: str, manifest: Dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, MANIFEST_NAME)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def completed_partitions(out_dir: str, fingerprint: str) -> set:
    m = load_manifest(out_dir)
    if m.get("fingerprint") != fingerprint:
        return set()
    return set(int(k) for k in m["partitions"])


def write_partition_file(out_dir: str, part_id: int, table: pa.Table) -> str:
    """Atomic per-partition data write (temp file + rename). Safe to call
    concurrently from many workers — it does NOT touch the manifest; the
    DRIVER records completed partitions afterwards (a shared-manifest
    read-modify-write from workers would race and lose entries)."""
    part_dir = os.path.join(out_dir, f"part_key={part_id}")
    os.makedirs(part_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=part_dir, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(table, tmp)
    final = os.path.join(part_dir, "data.parquet")
    os.replace(tmp, final)
    return final


def record_partitions(
    out_dir: str, fingerprint: str, entries: Dict[int, Dict],
    num_partitions: Optional[int] = None,
) -> Dict:
    """Driver-side manifest update: merge completed-partition entries
    (part_id -> {file, rows, lineage...}) under the given fingerprint.
    ``num_partitions`` records the hash modulus so later delta appends
    route rows identically even if some partitions received zero rows
    (and therefore have no manifest entry to infer it from)."""
    manifest = load_manifest(out_dir)
    if manifest.get("fingerprint") != fingerprint:
        manifest = {"fingerprint": fingerprint, "partitions": {}, "lineage": []}
    now = time.time()
    for part_id, e in entries.items():
        manifest["partitions"][str(part_id)] = {
            "file": e["file"],
            "rows": e["rows"],
            "written_at": now,
        }
        lineage = e.get("lineage")
        if lineage:
            manifest["lineage"].append({"part_id": part_id, **lineage})
    if num_partitions is not None:
        manifest["num_partitions"] = int(num_partitions)
    save_manifest(out_dir, manifest)
    return manifest


def record_append(
    out_dir: str, epoch: str, entries: Dict[int, Dict],
) -> Dict:
    """Driver-side manifest update for a delta-append epoch: touched
    partitions are overwritten (tagged with the epoch), untouched ones
    keep their existing entries, and the epoch id is recorded in
    ``manifest["epochs"]``. The base ``fingerprint`` is left unchanged —
    base-build resume identity is separate from append history. Written
    ONCE by the driver after every partition merge is durable; a crash
    before this point leaves the manifest without the epoch, and the
    re-run's distinct-union merges are idempotent, so no partial-epoch
    bookkeeping is needed."""
    manifest = load_manifest(out_dir)
    now = time.time()
    for part_id, e in entries.items():
        manifest["partitions"][str(part_id)] = {
            "file": e["file"],
            "rows": e["rows"],
            "written_at": now,
            "epoch": epoch,
        }
        lineage = e.get("lineage")
        if lineage:
            manifest["lineage"].append(
                {"part_id": part_id, "epoch": epoch, **lineage})
    epochs = manifest.setdefault("epochs", [])
    if epoch not in epochs:
        epochs.append(epoch)
    save_manifest(out_dir, manifest)
    return manifest


def read_output(out_dir: str) -> pa.Table:
    m = load_manifest(out_dir)
    tables: List[pa.Table] = []
    for part_id in sorted(m["partitions"], key=int):
        entry = m["partitions"][part_id]
        t = pq.read_table(os.path.join(out_dir, entry["file"]))
        tables.append(t)
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)
