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


# ---------------------------------------------------------------------------
# Zero-copy array broadcasts (the at-scale form of the dict broadcast)
# ---------------------------------------------------------------------------
#
# ray.get() of a large dict RE-UNPICKLES it in every task (measured
# unusable at ~10^7 entries — CLAUDE.md round-3, stages/lmfilter.py);
# numpy arrays and pyarrow arrays come out of the object store zero-copy
# and the lookup vectorizes as one searchsorted per batch. Use these for
# any dimension that can grow with the data (part, supplier, customer);
# the plain dict stays fine for enum-sized dims (region, nation).


def broadcast_sorted_map(keys, values: "pa.Array"):
    """(int keys, arrow values) -> one ray.put of (sorted int64 key
    array, value array in key order). Duplicate keys: last wins."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64)
    order = np.argsort(k, kind="stable")
    ks = k[order]
    # last-wins on duplicates (dict-comprehension semantics): keep the
    # final element of each equal-key run, so left-searchsorted in
    # lookup_sorted lands on it
    if len(ks):
        keep = np.r_[ks[1:] != ks[:-1], True]
        order, ks = order[keep], ks[keep]
    vals = values.take(pa.array(order)) if not isinstance(
        values, pa.ChunkedArray) else values.combine_chunks().take(
            pa.array(order))
    return ray.put((ks, vals))


def broadcast_sorted_map_local(parquet_path: str, key_col: str,
                               val_col: str):
    """Dim fast path: ONE driver-side column-pruned read (a Ray plan
    costs ~0.5-1 s flat), shipped as sorted arrays. Same driver-memory
    contract as broadcast_dict_local; at dimension sizes where even two
    columns strain the driver, use joins.auto_join instead."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[key_col, val_col])
    return broadcast_sorted_map(
        t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64),
        t.column(val_col).combine_chunks())


def broadcast_keyset(keys):
    """Membership set as ONE sorted int64 numpy array (zero-copy)."""
    import numpy as np

    return ray.put(np.unique(np.asarray(keys, dtype=np.int64)))


def lookup_sorted(ds: "ray.data.Dataset", map_ref, key_col: str,
                  out_col: str, inner: bool = True) -> "ray.data.Dataset":
    """broadcast_lookup over a broadcast_sorted_map ref: one
    searchsorted + one arrow take per batch; misses become nulls
    (dropped under inner=True, the SQL INNER JOIN pairing)."""
    import pyarrow.compute as pc

    def lookup(b: pa.Table) -> pa.Table:
        import numpy as np

        s_keys, s_vals = ray.get(map_ref)   # zero-copy arrays
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        k = np.asarray(k, dtype=np.int64)
        if len(s_keys) == 0:
            hit = np.zeros(len(k), dtype=bool)
            pos = np.zeros(len(k), dtype=np.int64)
        else:
            pos = np.clip(np.searchsorted(s_keys, k), 0, len(s_keys) - 1)
            hit = s_keys[pos] == k
        vals = s_vals.take(pa.array(pos, mask=~hit))   # nulls on miss
        b = b.append_column(out_col, vals)
        if inner:
            b = b.filter(pa.array(hit))
        return b

    return ds.map_batches(lookup, batch_format="pyarrow")


def semi_filter_sorted(ds: "ray.data.Dataset", keyset_ref,
                       key_col: str, keep: bool = True
                       ) -> "ray.data.Dataset":
    """Map-side semi (keep=True) / anti (keep=False) join against a
    broadcast_keyset ref — one searchsorted per batch."""

    def filt(b: pa.Table) -> pa.Table:
        import numpy as np

        s_keys = ray.get(keyset_ref)
        k = np.asarray(
            b.column(key_col).to_numpy(zero_copy_only=False),
            dtype=np.int64)
        if len(s_keys) == 0:
            hit = np.zeros(len(k), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(s_keys, k), 0, len(s_keys) - 1)
            hit = s_keys[pos] == k
        return b.filter(pa.array(hit if keep else ~hit))

    return ds.map_batches(filt, batch_format="pyarrow")
