"""Generic two-phase hash exchange (partition -> per-partition fold).

Ray Data's built-in ``groupby``/``sort`` shuffle is sort-based and, for the
many-small-blocks / few-partitions shapes this engine produces, costs more
than the compute it feeds (measured in round 1; see CLAUDE.md). This module
generalizes the explicit exchange already used by
``pipelines/kg.py:materialize_graph`` into a reusable operator:

  phase 1 (map, no barrier): each block splits its rows by
    ``hash % num_partitions`` and writes one uniquely-named spill file per
    touched partition (atomic temp+rename), RETURNING the file names — the
    Spark-style attempt commit: phase 2 reads only files listed by the one
    attempt Ray kept, so retried/speculative attempts cannot duplicate
    rows. Local disk here; shared object storage on a real cluster.
  phase 2 (reduce, parallel ray tasks): one task per touched partition
    reads its spill files and applies ``fold_fn`` to the whole partition
    table; the folded tables stay in the object store
    (``ray.data.from_arrow_refs`` — never collected to the driver).

Because the partition key is a uniform content hash, partitions stay
balanced regardless of key skew in the data (hot KEYS still co-locate —
salt upstream if a single key exceeds a worker, as grouped_count does).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


SMALL_ROWS = 100_000           # below this, one vectorized fold task wins
TARGET_ROWS_PER_PARTITION = 100_000

# Multi-node spill location. When set (env var or EngineConfig.spill_root
# plumbed through scripts/run_job.py), every exchange creates a unique
# subdirectory under this root; point it at storage every node can read
# (NFS / fuse-mounted object store) and phase-2 folds work across nodes.
# Unset -> node-local tempdir, correct only while map and reduce tasks
# share a filesystem (single node — this sandbox).
SPILL_ROOT_ENV = "CEE_SPILL_ROOT"

# Spill dirs whose cleanup is deferred (shared-root exchanges): deleting
# right after ray.wait would break Ray lineage reconstruction — if a fold
# output object is later lost to node failure, re-running fold needs the
# files. The job driver calls cleanup_pending_spill() once outputs are
# durably consumed (scripts/run_job.py does).
_PENDING_SPILL_DIRS: List[str] = []


def resolve_spill_root() -> Optional[str]:
    """Configured shared spill root, or None for node-local tempdir."""
    root = os.environ.get(SPILL_ROOT_ENV, "").strip()
    return root or None


def cleanup_pending_spill() -> int:
    """Delete deferred spill dirs (call after outputs are durably written).
    Returns the number of directories removed."""
    n = 0
    while _PENDING_SPILL_DIRS:
        shutil.rmtree(_PENDING_SPILL_DIRS.pop(), ignore_errors=True)
        n += 1
    return n


def defer_cleanup(path: str) -> None:
    """Register a temp directory for deferred removal alongside the spill
    dirs. For datasets that READ the directory lazily (e.g. a sorted-store
    export a query returns a lazy reader over): eager rmtree would break
    the consumer, so it is removed at cleanup_pending_spill() / process
    exit instead."""
    _PENDING_SPILL_DIRS.append(path)


# Last-resort cleanup so query-surface callers (bench / correctness runs,
# which never call cleanup_pending_spill themselves) do not accumulate
# orders-sized temp dirs in /tmp across repeated invocations.
import atexit  # noqa: E402

atexit.register(cleanup_pending_spill)


def claim_crash_sentinel(path: Optional[str]) -> None:
    """Test-only fault injection shared by every attempt-commit write
    path (exchange spill, graph materialize merge, corpus write fold,
    vector-store delta append): the FIRST caller to claim the sentinel
    file (O_EXCL) hard-kills its worker with ``os._exit`` — AFTER its
    durable writes but BEFORE returning the attempt commit, the exact
    worker-loss window the protocol exists for. Ray retries the task
    (system failure); only the retry's returned names/rows are
    committed, and rewrites are atomic (temp+rename), so the dead
    attempt changes nothing a reader sees."""
    if path is None:
        return
    try:
        os.close(os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        os._exit(1)
    except FileExistsError:
        pass


def default_num_partitions(cap: int = 64) -> int:
    """~2x cluster CPUs (CLAUDE.md: granularity via block/partition count)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(cap, cpus * 2))


def hash_partition_map(
    ds: "ray.data.Dataset",
    hash_col: str,
    fold_fn: Callable[[pa.Table], pa.Table],
    num_partitions: Optional[int] = None,
    spill_root: Optional[str] = None,
    _crash_sentinel: Optional[str] = None,
) -> "ray.data.Dataset":
    """Partition ``ds`` by ``hash_col % num_partitions`` and apply
    ``fold_fn`` once per whole partition table.

    ``hash_col`` must be a non-null int64 column (a uniform content hash —
    see ``stages/dedup.py:add_hash_column``). Rows with equal hash values
    are guaranteed to land in the same partition, so any fold whose
    semantics only need equal-key co-location (dedup, set-difference,
    grouped fold) is exact.

    This is an execution barrier: phase 1 runs to completion before phase 2
    starts (the price of any all-to-all exchange). The input is pinned
    (materialized) first — every shuffle implementation stages its input
    somewhere; here it buys an exact row count that sizes the exchange:

      - small inputs (<= ``SMALL_ROWS``) skip the disk exchange entirely
        and fold in ONE task (a 64-block x 64-partition spill of a 5k-row
        table costs ~4096 tiny files — measured 4x slower than the fold);
      - large inputs get ``rows / TARGET_ROWS_PER_PARTITION`` partitions
        (bounded by [default, 256]) so spill files stay chunky.

    Passing ``num_partitions`` explicitly SKIPS the materialize+count: the
    input streams straight into phase-1 spill with backpressure and is
    never pinned in the object store — the path a 100 TB job takes (size
    the partition count from the job's input manifest instead).

    ``_crash_sentinel`` (test-only fault injection): a path; the FIRST
    spill task to claim it (O_EXCL) hard-kills its worker with
    ``os._exit`` AFTER writing its spill files but BEFORE returning the
    attempt commit — simulating the worker-loss window the protocol
    exists for. Ray retries the task (system failure); the retry writes
    new unique file names and only those are folded, so the dead
    attempt's orphaned files are ignored. Pinned by
    tests/test_exchange.py's crash-injection test.
    """
    if num_partitions is None:
        ds = ds.materialize()
        n_rows = ds.count()
        if n_rows == 0:
            schema = ds.schema()
            if schema is None:
                return ds
            return ray.data.from_arrow(
                fold_fn(schema.base_schema.empty_table()))
        if n_rows <= SMALL_ROWS:
            # single-task global fold: all keys trivially co-locate
            return ds.repartition(1).map_batches(
                fold_fn, batch_format="pyarrow", batch_size=None)
        num_partitions = max(default_num_partitions(),
                             min(256, n_rows // TARGET_ROWS_PER_PARTITION))
    if spill_root:
        # caller-owned dir (assumed unique to this exchange): pre-clean so
        # a crashed prior attempt's files cannot double rows; cleanup is
        # DEFERRED — the dir may be shared storage, where keeping the files
        # lets lineage reconstruction of a lost fold output re-read them
        spill_dir = spill_root
        shutil.rmtree(spill_dir, ignore_errors=True)
        os.makedirs(spill_dir, exist_ok=True)
        eager_cleanup = False
    elif resolve_spill_root():
        # configured shared root: unique dir per exchange (no cross-run
        # clobbering), cleanup deferred as above
        root = resolve_spill_root()
        os.makedirs(root, exist_ok=True)
        spill_dir = tempfile.mkdtemp(prefix="cee_exchange_", dir=root)
        eager_cleanup = False
    else:
        # node-local tempdir: single-filesystem assumption (this sandbox);
        # safe to delete as soon as folds complete — on one node an object
        # lost from plasma means the node (and job) is gone anyway
        spill_dir = tempfile.mkdtemp(prefix="cee_exchange_")
        eager_cleanup = True
    n_parts = int(num_partitions)

    def spill(b: pa.Table) -> pa.Table:
        # Spark-style attempt commit: every attempt writes UNIQUE file names
        # and returns them; only files listed in the summary the driver
        # receives (i.e. from the one attempt Ray kept) are read in phase 2.
        # Duplicate files from retried/speculative attempts are ignored, so
        # the exchange is exactly-once without content-addressed naming.
        touched: List[int] = []
        names: List[str] = []
        if b.num_rows:
            h = b.column(hash_col).to_numpy()
            part = (h % n_parts).astype(np.int64)
            for part_id in np.unique(part):
                sub = b.filter(pa.array(part == part_id))
                pdir = os.path.join(spill_dir, f"part={int(part_id)}")
                os.makedirs(pdir, exist_ok=True)
                fd, tmp = tempfile.mkstemp(dir=pdir, suffix=".tmp")
                os.close(fd)
                # intermediate (merged then deleted): uncompressed saves CPU
                pq.write_table(sub, tmp, compression="none")
                final = tmp[:-4] + ".parquet"
                os.replace(tmp, final)  # atomic: readers never see partials
                touched.append(int(part_id))
                names.append(os.path.basename(final))
        if names:
            # fault injection (see docstring): die after spilling, before
            # the attempt commit — exactly the window retries must survive
            claim_crash_sentinel(_crash_sentinel)
        return pa.table({"part_id": pa.array(touched, pa.int64()),
                         "file": pa.array(names, pa.string())})

    touched_df = ds.map_batches(spill, batch_format="pyarrow").to_pandas()

    if touched_df.empty:
        # preserve the output schema on empty input
        shutil.rmtree(spill_dir, ignore_errors=True)
        sch = ds.schema()
        if sch is None:
            # zero-block input: no schema to synthesize the fold's empty
            # table from — the empty input IS the (empty) result
            return ds
        empty_in = sch.base_schema.empty_table()
        return ray.data.from_arrow(fold_fn(empty_in))

    @ray.remote(num_cpus=1)
    def fold(part_id: int, files: List[str]) -> pa.Table:
        pdir = os.path.join(spill_dir, f"part={part_id}")
        # permissive promote: unioned two-sided inputs (joins) carry the
        # same column NAMES but differing order / null-typed pad columns
        t = pa.concat_tables(
            [pq.read_table(os.path.join(pdir, f)) for f in sorted(files)],
            promote_options="permissive")
        return fold_fn(t)

    by_part = touched_df.groupby("part_id")["file"].apply(list)
    refs = [fold.remote(int(p), files) for p, files in by_part.items()]
    ray.wait(refs, num_returns=len(refs))
    if eager_cleanup:
        # single-node: folds done, files consumed (see branch above)
        shutil.rmtree(spill_dir, ignore_errors=True)
    else:
        # shared storage: keep files so lineage reconstruction of a lost
        # fold output can re-read them; driver cleans up at job end
        _PENDING_SPILL_DIRS.append(spill_dir)
    return ray.data.from_arrow_refs(refs)
