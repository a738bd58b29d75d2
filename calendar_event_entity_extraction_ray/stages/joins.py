"""Relational joins for two large sides.

The reference has no relational joins (SURVEY.md §2.4) — these are the
engine-level operators a 100 TB pipeline needs when neither side fits a
broadcast:

  - ``hash_join``: explicit partitioned hash join (ray_guide.md "Joins"):
    both sides get a ``bucket = hash64(key) % B`` column and a side tag,
    are unioned, and matching buckets join pairwise inside ``map_groups``
    (one all-to-all on a uniform hash key; salt a hot key by widening B).
  - ``asof_join``: per-key backward as-of join: hash-partition both sides
    on the equality key, sort by timestamp within the group, and run
    ``pandas.merge_asof`` per group. Assumes per-key data fits a worker
    (document the partitioning assumption; compound keys salt naturally).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _tag_and_bucket(ds: "ray.data.Dataset", key: str, side: str,
                    num_buckets: int, cols: List[str]) -> "ray.data.Dataset":
    def prep(b: pa.Table) -> pa.Table:
        from calendar_event_entity_extraction_ray.stages.dedup import (
            hash64_columns,
        )

        b = b.select(cols)
        # vectorized content hash (stable across processes); the join itself
        # re-checks exact key equality inside the bucket (pandas merge), so
        # the bucket hash only needs equal-keys-co-locate
        buckets = (hash64_columns(b, [key]) % num_buckets).astype("int32")
        b = b.append_column("_bucket", pa.array(buckets, pa.int32()))
        return b.append_column("_side", pa.array([side] * b.num_rows, pa.string()))

    return ds.map_batches(prep, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_cols: List[str],
    right_cols: List[str],
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Inner join on ``key``; output columns = left_cols ∪ right_cols.

    Column sets must be disjoint apart from ``key``.
    """
    lt = _tag_and_bucket(left, key, "l", num_buckets, left_cols)
    rt = _tag_and_bucket(right, key, "r", num_buckets, right_cols)

    # union of two differently-shaped tables: pad each side with the other's
    # columns as nulls so blocks share one schema
    l_only = [c for c in left_cols if c != key]
    r_only = [c for c in right_cols if c != key]

    def pad(missing: List[str]):
        def fn(b: pa.Table) -> pa.Table:
            for c in missing:
                b = b.append_column(c, pa.nulls(b.num_rows))
            return b

        return fn

    lt = lt.map_batches(pad(r_only), batch_format="pyarrow")
    rt = rt.map_batches(pad(l_only), batch_format="pyarrow")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"][[key] + l_only]
        rg = g[g["_side"] == "r"][[key] + r_only]
        out = lg.merge(rg, on=key, how="inner")
        return out

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    left_cols: List[str],
    right_cols: List[str],
    suffix: str = "_right",
    tolerance: Optional[pd.Timedelta] = None,
) -> "ray.data.Dataset":
    """Backward as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` key. Partitioning
    assumption: all rows of one ``by`` key fit in one group."""
    import pyarrow.compute as pc

    lt = left.select_columns(left_cols).map_batches(
        lambda b: b.append_column("_side", pa.array(["l"] * b.num_rows)),
        batch_format="pyarrow")
    r_only = [c for c in right_cols if c not in (on, by)]
    # SQL equality never matches NULL = NULL: drop right rows with a NULL
    # key so they can't as-of-match a NULL-keyed left row (left NULL-key
    # rows still pass through unmatched, like an ASOF LEFT JOIN)
    def _tag_right(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(by)))
        return b.append_column("_side", pa.array(["r"] * b.num_rows))

    rt = right.select_columns(right_cols).map_batches(
        _tag_right, batch_format="pyarrow")

    l_only = [c for c in left_cols if c not in (on, by)]

    def pad(missing):
        def fn(b: pa.Table) -> pa.Table:
            for c in missing:
                b = b.append_column(c, pa.nulls(b.num_rows))
            return b

        return fn

    lt = lt.map_batches(pad(r_only), batch_format="pyarrow")
    rt = rt.map_batches(pad(l_only), batch_format="pyarrow")
    both = lt.union(rt)

    out_cols = [on, by] + l_only + [on + suffix] + r_only

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"][[on, by] + l_only].sort_values(on, kind="stable")
        rg = g[g["_side"] == "r"][[on] + r_only].sort_values(on, kind="stable")
        rg = rg.rename(columns={on: on + suffix})
        if lg.empty:
            # right-only group: emit a 0-row frame with the FULL output
            # schema so every block the operator yields is schema-consistent
            empty = lg.copy()
            empty[on + suffix] = pd.Series([], dtype=rg[on + suffix].dtype)
            for c in r_only:
                empty[c] = pd.Series([], dtype=rg[c].dtype)
            return empty[out_cols]
        out = pd.merge_asof(
            lg, rg, left_on=on, right_on=on + suffix, direction="backward",
            tolerance=tolerance,
        )
        return out[out_cols]

    return both.groupby(by).map_groups(asof_group, batch_format="pandas")
