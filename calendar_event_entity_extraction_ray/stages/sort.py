"""Distributed global sort / global ROW_NUMBER via range partitioning.

Ray's built-in ``Dataset.sort`` runs the same sort-based shuffle whose
high-cardinality cliff this repo's exchange exists to avoid (CLAUDE.md),
so the global order operator rides the exchange instead:

  1. sample the order column (bounded, deterministic per-batch stride)
     and cut ``n`` range boundaries;
  2. route each row to its range bucket — the bucket INDEX is the
     exchange's routing value (``idx % n == idx``), so the generic
     hash exchange becomes a range exchange with no new machinery;
  3. one fold per bucket sorts locally and assigns 1-based local ranks —
     equal order values co-locate (searchsorted routes by value), so
     tie-breaks resolve inside one partition;
  4. bucket sizes (a kilobyte) become exclusive prefix offsets, added in
     one final streamed pass.

Total order requires ``order_col`` + ``tiebreak_cols`` to be unique.
NULL order values route to the LAST bucket and sort last (SQL ASC
NULLS LAST, DuckDB's default).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _sample_values(ds: "ray.data.Dataset", col: str,
                   per_batch: int = 256) -> np.ndarray:
    """Deterministic stride sample of ``col`` (no RNG — resume-stable)."""
    def samp(b: pa.Table) -> pa.Table:
        v = b.column(col).to_pandas().dropna().to_numpy()
        if len(v) > per_batch:
            v = v[:: max(1, len(v) // per_batch)][:per_batch]
        return pa.table({"_s": pa.array(v)})

    out = ds.map_batches(samp, batch_format="pyarrow").to_pandas()
    return np.sort(out["_s"].to_numpy())


def global_row_number(
    ds: "ray.data.Dataset",
    order_col: str,
    tiebreak_cols: Optional[List[str]] = None,
    out_col: str = "rank",
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Adds ``out_col`` = SQL ``ROW_NUMBER() OVER (ORDER BY order_col,
    *tiebreak_cols)`` (1-based, global). Output is range-partitioned and
    sorted within each partition — i.e. a distributed global sort whose
    partition k holds ranks (offset_k, offset_{k+1}]."""
    from calendar_event_entity_extraction_ray.stages.exchange import (
        default_num_partitions,
        hash_partition_map,
    )

    tiebreak_cols = tiebreak_cols or []
    ds = ds.materialize()  # consumed twice: sample + route
    n_parts = num_partitions or default_num_partitions()
    sample = _sample_values(ds, order_col)
    if len(sample) == 0:
        n_parts = 1
        bounds = np.array([])
    else:
        cuts = np.linspace(0, len(sample) - 1,
                           n_parts + 1)[1:-1].astype(np.int64)
        bounds = np.unique(sample[cuts])
        n_parts = len(bounds) + 1

    def route(b: pa.Table) -> pa.Table:
        v = b.column(order_col).to_pandas().to_numpy(dtype=np.float64,
                                                     copy=False)
        rb = np.searchsorted(bounds, v, side="right").astype(np.int64)
        rb[np.isnan(v)] = n_parts - 1  # SQL ASC: NULLS LAST
        return b.append_column("_rb", pa.array(rb))

    sort_cols = [order_col] + tiebreak_cols

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(sort_cols, kind="mergesort",
                                       na_position="last")
        df["_lr"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    folded = hash_partition_map(ds.map_batches(route,
                                               batch_format="pyarrow"),
                                "_rb", fold,
                                num_partitions=n_parts).materialize()

    sizes = (folded.map_batches(
        lambda b: pa.Table.from_pandas(
            b.select(["_rb"]).to_pandas().groupby("_rb").size()
            .reset_index(name="n"), preserve_index=False),
        batch_format="pyarrow").to_pandas()
        .groupby("_rb")["n"].sum())
    offsets = {int(rb): int(off) for rb, off in zip(
        sizes.index, np.concatenate(([0], np.cumsum(sizes.to_numpy())[:-1])))}
    off_ref = ray.put(offsets)

    def add_offset(b: pa.Table, _ref=off_ref) -> pa.Table:
        off = ray.get(_ref) if hasattr(_ref, "hex") else _ref
        rb = b.column("_rb").to_pandas().map(off).to_numpy(np.int64)
        rank = b.column("_lr").to_numpy() + rb
        return (b.drop_columns(["_rb", "_lr"])
                .append_column(out_col, pa.array(rank, pa.int64())))

    return folded.map_batches(add_offset, batch_format="pyarrow")


def write_sorted(
    ds: "ray.data.Dataset",
    order_col: str,
    out_dir: str,
    fingerprint: str,
    tiebreak_cols: Optional[List[str]] = None,
    num_partitions: Optional[int] = None,
) -> dict:
    """Globally-SORTED resumable Parquet export: partition k holds the
    k-th key range (sampled boundaries, deterministic — so a re-run
    derives the SAME ranges and resume is well-defined), each partition
    file is sorted internally, and the manifest records every
    partition's [min, max] so a downstream reader can binary-search
    straight to the right file (the sorted-export contract columnar
    consumers want). Workers write data files, the driver records the
    manifest (the shared-manifest rule); re-running with the same
    fingerprint skips completed partitions."""
    from calendar_event_entity_extraction_ray.state import manifest as M
    from calendar_event_entity_extraction_ray.stages.exchange import (
        default_num_partitions,
        hash_partition_map,
    )

    tiebreak_cols = tiebreak_cols or []
    ds = ds.materialize()  # consumed twice: sample + route
    n_parts = num_partitions or default_num_partitions()
    sample = _sample_values(ds, order_col)
    if len(sample) == 0:
        bounds = np.array([])
        n_parts = 1
    else:
        cuts = np.linspace(0, len(sample) - 1,
                           n_parts + 1)[1:-1].astype(np.int64)
        bounds = np.unique(sample[cuts])
        n_parts = len(bounds) + 1

    done = M.completed_partitions(out_dir, fingerprint)
    sort_cols = [order_col] + tiebreak_cols

    def route(b: pa.Table) -> pa.Table:
        v = b.column(order_col).to_pandas().to_numpy(dtype=np.float64,
                                                     copy=False)
        rb = np.searchsorted(bounds, v, side="right").astype(np.int64)
        rb[np.isnan(v)] = n_parts - 1
        b = b.append_column("_rb", pa.array(rb))
        if done:
            b = b.filter(pa.array(~np.isin(rb, sorted(done))))
        return b

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"part_id": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64()),
                             "vmin": pa.array([], pa.float64()),
                             "vmax": pa.array([], pa.float64())})
        part_id = int(t.column("_rb")[0].as_py())
        df = t.drop_columns(["_rb"]).to_pandas().sort_values(
            sort_cols, kind="mergesort", na_position="last")
        out = pa.Table.from_pandas(df, preserve_index=False)
        M.write_partition_file(out_dir, part_id, out)
        vals = df[order_col].dropna()
        return pa.table({
            "part_id": pa.array([part_id], pa.int64()),
            "rows": pa.array([t.num_rows], pa.int64()),
            "vmin": pa.array([float(vals.min()) if len(vals)
                              else float("nan")], pa.float64()),
            "vmax": pa.array([float(vals.max()) if len(vals)
                              else float("nan")], pa.float64()),
        })

    written = hash_partition_map(
        ds.map_batches(route, batch_format="pyarrow"), "_rb", fold,
        num_partitions=n_parts).to_pandas()
    entries = {}
    if "part_id" in written.columns:
        for r in written.itertuples():
            entries[int(r.part_id)] = {
                "file": f"part_key={int(r.part_id)}/data.parquet",
                "rows": int(r.rows),
                "lineage": {"rows_out": int(r.rows),
                            "min": None if r.vmin != r.vmin else r.vmin,
                            "max": None if r.vmax != r.vmax else r.vmax},
            }
    manifest = M.record_partitions(out_dir, fingerprint, entries)
    # self-describing sorted export: readers (read_sorted_range) learn
    # the order column from the manifest, not from the caller
    if manifest.get("order_col") != order_col:
        manifest["order_col"] = order_col
        M.save_manifest(out_dir, manifest)
    return manifest


def pruned_partition_files(
    out_dir: str,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> List[str]:
    """Partition files of a ``write_sorted`` export whose manifest
    [min, max] intersects [lo, hi] — the driver-side zone-map prune
    (kilobyte manifest read; no data file is opened). All-NULL
    partitions never match a range predicate (SQL comparison
    semantics)."""
    import os

    from calendar_event_entity_extraction_ray.state import manifest as M

    m = M.load_manifest(out_dir)
    # lineage is a top-level list (manifest.py:record_partitions); last
    # entry per part_id wins (resume re-runs only append missing parts)
    ranges = {}
    for ln in m.get("lineage", []):
        if "min" in ln:
            ranges[str(ln["part_id"])] = (ln["min"], ln["max"])
    out = []
    for pid in sorted(m["partitions"], key=int):
        mn, mx = ranges.get(pid, (None, None))
        if mn is None or mx is None:
            continue
        if lo is not None and mx < lo:
            continue
        if hi is not None and mn > hi:
            continue
        out.append(os.path.join(out_dir, m["partitions"][pid]["file"]))
    return out


def read_sorted_range(
    out_dir: str,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    columns: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Range scan over a ``write_sorted`` export, pruned at THREE levels:
    whole partitions via the manifest zone map (pruned_partition_files),
    row groups inside surviving files via a pyarrow statistics filter,
    and rows via the same filter at decode — only then does data reach
    the object store. The inclusive [lo, hi] predicate applies to the
    export's order column (recorded in the manifest); NULL order values
    never match (SQL range semantics)."""
    from calendar_event_entity_extraction_ray.state import manifest as M

    m = M.load_manifest(out_dir)
    order_col = m.get("order_col")
    if order_col is None:
        raise ValueError(f"{out_dir}: not a write_sorted export "
                         "(no order_col in manifest)")
    files = pruned_partition_files(out_dir, lo, hi)
    if not files:
        import os

        import pyarrow.parquet as pq

        # typed empty result: schema from any partition file's footer
        any_e = next(iter(m["partitions"].values()), None)
        if any_e is None:
            raise ValueError(f"{out_dir}: empty manifest")
        sch = pq.read_schema(os.path.join(out_dir, any_e["file"]))
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
        return ray.data.from_arrow(sch.empty_table())

    import pyarrow.dataset as pds

    pred = None
    if lo is not None:
        pred = pds.field(order_col) >= lo
    if hi is not None:
        p2 = pds.field(order_col) <= hi
        pred = p2 if pred is None else pred & p2
    kwargs = {"columns": columns} if columns else {}
    if pred is not None:
        kwargs["filter"] = pred
    return ray.data.read_parquet(files, **kwargs)
