"""Broadcast (map-side) join: the small side ships once via ``ray.put``,
every task maps keys through it vectorized — no shuffle.

This is THE join for star-schema shapes (fact x small dimension): the
dimension dict is built once on the driver from a pruned read, broadcast
once, fetched once per task (Ray caches the object per worker), and the
lookup is a single ``pandas.Series.map`` C call per batch — never a
Python per-row loop, never a re-ship per batch, never an all-to-all.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_dict(ds: "ray.data.Dataset", key_col: str, val_col: str):
    """Small side -> driver dict -> object-store ref (one ``ray.put``)."""
    mapping = {}
    for b in ds.select_columns([key_col, val_col]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        mapping.update(zip(b.column(key_col).to_pylist(),
                           b.column(val_col).to_pylist()))
    return ray.put(mapping)


def broadcast_dict_local(parquet_path: str, key_col: str, val_col: str):
    """Dim-table fast path: read the small side driver-side with ONE
    column-pruned pyarrow read instead of a Ray plan (each plan execution
    costs a flat ~0.5-1 s — BASELINE.md §small-query profiling — which
    dominates a kilobyte dimension read). Same driver-memory contract as
    ``broadcast_dict``: that path builds the dict on the driver anyway,
    so this changes WHERE the bytes are read, not what must fit where."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[key_col, val_col])
    return ray.put(dict(zip(t.column(key_col).to_pylist(),
                            t.column(val_col).to_pylist())))


def broadcast_lookup(
    ds: "ray.data.Dataset",
    mapping_ref,
    key_col: str,
    out_col: str,
    inner: bool = True,
    out_type: Optional[pa.DataType] = None,
) -> "ray.data.Dataset":
    """Add ``out_col`` = mapping[key_col] to every row. ``inner=True``
    drops unmatched keys (INNER semantics, pairing with plain SQL JOIN
    oracles); ``inner=False`` keeps them with a null (LEFT semantics)."""
    import pyarrow.compute as pc

    def lookup(b: pa.Table) -> pa.Table:
        mapping = ray.get(mapping_ref)  # once per task; worker-cached
        keys = b.column(key_col).to_pandas()
        vals = keys.map(mapping)  # vectorized C lookup
        arr = pa.Array.from_pandas(vals, type=out_type)
        b = b.append_column(out_col, arr)
        if inner:
            b = b.filter(pc.is_valid(b.column(out_col)))
        return b

    return ds.map_batches(lookup, batch_format="pyarrow")
