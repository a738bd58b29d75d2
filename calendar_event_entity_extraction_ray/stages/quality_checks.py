"""Data-quality check suite (the Deequ / dbt-test shape): declarative
constraints evaluated over ONE streaming pass, published as a small
(check, column, value) report table — the gate every production
pipeline runs before promoting an output.

Single-pass checks (row count, per-column null counts, integer min/max,
accepted-value violations, numeric-bound violations) ride per-batch
integer partials folded with ``stream_reduce`` — the report is
check-cardinality-sized, so the reduce is the enum-sized regime by
construction. Uniqueness (rows minus distinct keys) is the one check
that genuinely needs a shuffle: it reuses ``grouped_count``'s exchange
and ships <= 1 row per (key, batch) thanks to the per-batch pre-agg.

Every check value is an exact int64 — the SQL oracle reproduces each
one verbatim (COUNT / SUM(CASE ...) / COUNT(DISTINCT ...))."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def quality_report(
    ds: "ray.data.Dataset",
    null_cols: Sequence[str] = (),
    accepted_values: Optional[Dict[str, Sequence]] = None,
    bounds: Optional[Dict[str, Tuple[int, int]]] = None,
    unique_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """-> (check, column, value) exact-int64 report.

    checks emitted: ``row_count`` (once), ``null_count`` per null_col,
    ``bad_value_count`` per accepted_values col (NULLs don't violate —
    pair with null_count), ``out_of_bounds_count`` per bounds col
    (inclusive integer bounds on floor(value)), ``dup_row_count`` per
    unique_col (rows - distinct non-null keys; NULL keys count as rows
    but never as keys, matching COUNT(DISTINCT))."""
    accepted_values = accepted_values or {}
    bounds = bounds or {}
    av_sets = {c: set(v) for c, v in accepted_values.items()}

    def partial(b: pa.Table) -> pa.Table:
        checks: List[str] = ["row_count"]
        cols: List[str] = ["*"]
        vals: List[int] = [b.num_rows]
        for c in null_cols:
            checks.append("null_count")
            cols.append(c)
            vals.append(b.column(c).null_count)
        for c, ok in av_sets.items():
            arr = b.column(c).to_pylist()
            checks.append("bad_value_count")
            cols.append(c)
            vals.append(sum(1 for v in arr
                            if v is not None and v not in ok))
        for c, (lo, hi) in bounds.items():
            v = b.column(c).to_numpy(zero_copy_only=False)
            v = np.floor(v[~pd.isna(v)]).astype(np.int64)
            checks.append("out_of_bounds_count")
            cols.append(c)
            vals.append(int(np.sum((v < lo) | (v > hi))))
        return pa.table({
            "check": pa.array(checks, pa.string()),
            "column": pa.array(cols, pa.string()),
            "value": pa.array(vals, pa.int64()),
        })

    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_count,
        grouped_sums,
    )

    ds = ds.materialize()  # consumed once per unique_col + once here
    rep = grouped_sums(ds.map_batches(partial, batch_format="pyarrow"),
                       ["check", "column"], ["value"], count_alias="_nb",
                       stream_reduce=True).to_pandas()
    rep = rep[["check", "column", "value"]]

    rows = int(rep.loc[rep["check"] == "row_count", "value"].iloc[0])
    extra = []
    for c in unique_cols:
        # distinct non-null keys via the exchange (never Ray's groupby);
        # dup_row_count = non-null rows - distinct keys
        cnt = grouped_count(ds.select_columns([c]), c, out_col="_n")
        n_distinct = 0
        n_nonnull = 0
        for b in cnt.iter_batches(batch_format="pyarrow", batch_size=None):
            n_distinct += b.num_rows
            n_nonnull += int(np.sum(
                b.column("_n").to_numpy(zero_copy_only=False)))
        extra.append(("dup_row_count", c, n_nonnull - n_distinct))
    if extra:
        rep = pd.concat(
            [rep, pd.DataFrame(extra,
                               columns=["check", "column", "value"])],
            ignore_index=True)
    rep["value"] = rep["value"].astype("int64")
    return rep.sort_values(["check", "column"]).reset_index(drop=True)
