"""Two-sample distribution-drift test (exact Kolmogorov-Smirnov): the
monitor a training pipeline runs between corpus snapshots / splits
("did the length or quality distribution move?").

KS = sup_x |F_A(x) - F_B(x)| over the pooled support. Published EXACTLY
as the cross-multiplied integer ``ks_num = max |cumA * nB - cumB * nA|``
with denominators (nA, nB) — no float CDFs anywhere, so the SQL oracle
(window cumulative counts) matches bit-for-bit.

Plan: per-batch (value, side) count partials -> ONE exchange grouped
reduce (the shuffle moves |support| x |batches| rows) -> the support-
sized (value, nA, nB) table folds on the DRIVER with one sort + cumsum.
The driver fold is value-CARDINALITY-sized, not corpus-sized — right
for integer-valued signals (lengths, scaled scores, histogram bins);
floor-scale continuous signals first (the numeric_histogram rule).
int64 overflow bound: |cum * n| <= nA * nB, safe to ~3e9 rows per side.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def ks_drift(
    ds_a: "ray.data.Dataset",
    ds_b: "ray.data.Dataset",
    col: str,
) -> Tuple[int, int, int, int]:
    """-> (ks_num, n_a, n_b, arg_value): sup |cumA*nB - cumB*nA| over the
    pooled sorted support of integer column ``col`` (NULLs dropped), and
    the smallest value attaining it. KS statistic = ks_num / (n_a*n_b)."""
    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )

    def tag(side: str):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            arr = b.column(col)
            arr = arr.filter(pc.is_valid(arr))
            return pa.table({
                "v": arr,
                "side": pa.array([side] * len(arr), pa.string()),
            })

        return f

    both = ds_a.map_batches(tag("a"), batch_format="pyarrow").union(
        ds_b.map_batches(tag("b"), batch_format="pyarrow"))
    counts = grouped_sums(both, ["v", "side"], [],
                          count_alias="n").to_pandas()
    piv = (counts.pivot_table(index="v", columns="side", values="n",
                              aggfunc="sum", fill_value=0)
           .reindex(columns=["a", "b"], fill_value=0).sort_index())
    na = int(piv["a"].sum())
    nb = int(piv["b"].sum())
    cum_a = piv["a"].to_numpy(np.int64).cumsum()
    cum_b = piv["b"].to_numpy(np.int64).cumsum()
    diff = np.abs(cum_a * nb - cum_b * na)
    i = int(np.argmax(diff))
    return int(diff[i]), na, nb, int(piv.index[i])
