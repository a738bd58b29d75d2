"""Distributed EXACT rank selection (quantiles) without a global sort.

``quantile_disc`` semantics (verified against DuckDB): the q-quantile of a
column with n non-null values is the element at 1-based rank
``max(1, ceil(q * n))`` in sorted order — an actual data value, so results
compare exactly against a SQL oracle (no interpolation drift).

Algorithm — iterative histogram refinement (the classic distributed
selection: count -> histogram the candidate interval -> descend into the
bin holding the target rank):

  pass 0   one aggregate: n / min / max (nulls and NaNs dropped, as SQL
           aggregates do).
  pass i   ONE map_batches over the column histograms every still-open
           candidate interval with B equal-width bins; partials merge on
           the driver (B x |open quantiles| ints — tiny). Each target
           rank descends into its bin; the rank is rebased to the bin's
           local offset. Intervals are half-open [lo, hi) except at the
           global maximum (bin k covers [edge_k, edge_k+1), so closedness
           must follow the binning exactly or edge-valued rows would be
           counted twice / dropped).
  resolve  when a bin's population <= ``collect_cap`` (or its value range
           collapses to a point), its members are collected in one final
           filtered pass and the rank is picked exactly.

At 10^12 rows with B=4096, two refinement passes bound a bin to
n / B^2 ≈ 60k rows — driver memory stays bounded by ``collect_cap`` per
quantile, never by the input. All per-batch work is numpy-vectorized.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa

import ray.data

# interval: (lo, hi, closed) — values v with lo <= v < hi, or <= hi when
# closed (the global-max edge). rank is 1-based WITHIN the interval.
Interval = Tuple[float, float, bool]


def _column_f64(b: pa.Table, col: str) -> np.ndarray:
    v = b.column(col).to_pandas().to_numpy(dtype=np.float64, copy=False)
    return v[~np.isnan(v)]


def _select(v: np.ndarray, iv: Interval) -> np.ndarray:
    lo, hi, closed = iv
    return v[(v >= lo) & ((v <= hi) if closed else (v < hi))]


def disc_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc rank rule (1-based)."""
    return max(1, math.ceil(q * n))


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: Sequence[float],
    bins: int = 4096,
    collect_cap: int = 1_000_000,
    max_passes: int = 6,
) -> List[Tuple[float, float]]:
    """[(q, value)] with value = the exact quantile_disc element of
    ``col``. ``ds`` is pinned once (consumed 2 + #passes times)."""
    from ray.data.aggregate import Count, Max, Min

    ds = ds.select_columns([col]).materialize()

    stats = ds.map_batches(
        lambda b: pa.table({"_v": pa.array(_column_f64(b, col),
                                           pa.float64())}),
        batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Min("_v", alias_name="lo"),
        Max("_v", alias_name="hi"))
    n = int(stats["n"])
    if n == 0:
        return [(float(q), float("nan")) for q in qs]
    glo, ghi = float(stats["lo"]), float(stats["hi"])

    open_qs: Dict[int, Tuple[Interval, int]] = {
        i: ((glo, ghi, True), disc_rank(q, n)) for i, q in enumerate(qs)}
    resolved: Dict[int, float] = {}

    for _ in range(max_passes):
        # point-collapsed intervals resolve without touching data (every
        # remaining candidate value equals lo)
        for i in [i for i, (iv, _) in open_qs.items() if iv[0] == iv[1]]:
            resolved[i] = open_qs.pop(i)[0][0]
        if not open_qs:
            break
        intervals = sorted({iv for iv, _ in open_qs.values()})
        edges = [np.linspace(iv[0], iv[1], bins + 1) for iv in intervals]

        def hist_partial(b: pa.Table, _edges=edges,
                         _ivals=intervals) -> pa.Table:
            v = _column_f64(b, col)
            rows = []
            for k, iv in enumerate(_ivals):
                sel = _select(v, iv)
                idx = np.clip(
                    np.searchsorted(_edges[k], sel, side="right") - 1,
                    0, bins - 1)
                rows.append(np.bincount(idx, minlength=bins))
            return pa.table({"hist": pa.array(
                [np.concatenate(rows).astype(np.int64)])})

        total = np.zeros(len(intervals) * bins, dtype=np.int64)
        for b in ds.map_batches(hist_partial,
                                batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            for h in b.column("hist").to_pylist():
                total += np.asarray(h, dtype=np.int64)

        ival_index = {iv: k for k, iv in enumerate(intervals)}
        collect_now: Dict[int, Tuple[Interval, int]] = {}
        still_open: Dict[int, Tuple[Interval, int]] = {}
        for i, (iv, rank) in open_qs.items():
            k = ival_index[iv]
            hist = total[k * bins:(k + 1) * bins]
            cum = np.cumsum(hist)
            bin_i = int(np.searchsorted(cum, rank, side="left"))
            local_rank = rank - (int(cum[bin_i - 1]) if bin_i else 0)
            child: Interval = (
                float(edges[k][bin_i]), float(edges[k][bin_i + 1]),
                iv[2] if bin_i == bins - 1 else False)
            if int(hist[bin_i]) <= collect_cap:
                collect_now[i] = (child, local_rank)
            else:
                still_open[i] = (child, local_rank)
        resolved.update(_collect_pick(ds, col, collect_now))
        open_qs = still_open

    # safety net: anything still open after max_passes collects as-is
    # (population bounded by n / bins^max_passes in the non-degenerate
    # case; degenerate point-masses resolved via the collapse check)
    if open_qs:
        resolved.update(_collect_pick(ds, col, open_qs))

    return [(float(q), float(resolved[i])) for i, q in enumerate(qs)]


def percentile_cont(
    ds: "ray.data.Dataset",
    col: str,
    qs: Sequence[float],
    bins: int = 4096,
    collect_cap: int = 1_000_000,
    max_passes: int = 6,
) -> List[Tuple[float, float]]:
    """[(q, value)] with DuckDB ``quantile_cont`` semantics: linear
    interpolation ``lo + (hi - lo) * frac`` between the order statistics
    at 0-based ranks floor/ceil((n-1)*q) — DuckDB's exact interpolation
    expression, so cent-scaled comparisons hold bit-for-bit.

    Runs the same histogram-refinement rank selection as
    ``exact_quantiles``; the needed ranks are reached by synthesizing
    ``q' = (rank - 0.5) / n`` (ceil(q'*n) == rank, robust to fp)."""
    ds = ds.select_columns([col]).materialize()
    n = int(ds.map_batches(
        lambda b: pa.table({"_v": pa.array(_column_f64(b, col),
                                           pa.float64())}),
        batch_format="pyarrow").count())
    if n == 0:
        return [(float(q), float("nan")) for q in qs]

    ranks = sorted({r for q in qs
                    for r in (math.floor((n - 1) * q) + 1,
                              math.ceil((n - 1) * q) + 1)})
    synth = [(r - 0.5) / n for r in ranks]
    vals = exact_quantiles(ds, col, synth, bins=bins,
                           collect_cap=collect_cap, max_passes=max_passes)
    by_rank = {r: v for r, (_, v) in zip(ranks, vals)}
    out = []
    for q in qs:
        x = (n - 1) * q
        lo_r, hi_r = math.floor(x) + 1, math.ceil(x) + 1
        lo_v, hi_v = by_rank[lo_r], by_rank[hi_r]
        out.append((float(q), lo_v + (hi_v - lo_v) * (x - (lo_r - 1))))
    return out


def _collect_pick(ds: "ray.data.Dataset", col: str,
                  targets: Dict[int, Tuple[Interval, int]]) -> Dict[int, float]:
    """One filtered pass: collect each target interval's members and pick
    the local rank exactly. Driver memory = sum of target populations
    (<= collect_cap each by construction)."""
    if not targets:
        return {}
    intervals = sorted({iv for iv, _ in targets.values()})

    def members(b: pa.Table, _ivals=intervals) -> pa.Table:
        v = _column_f64(b, col)
        outs, tags = [], []
        for k, iv in enumerate(_ivals):
            sel = _select(v, iv)
            outs.append(sel)
            tags.append(np.full(len(sel), k, dtype=np.int32))
        return pa.table({"_v": pa.array(np.concatenate(outs), pa.float64()),
                         "_k": pa.array(np.concatenate(tags), pa.int32())})

    vals: Dict[int, list] = {k: [] for k in range(len(intervals))}
    for b in ds.map_batches(members, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        ks = b.column("_k").to_numpy()
        vs = b.column("_v").to_numpy()
        for k in np.unique(ks):
            vals[int(k)].append(vs[ks == k])
    sorted_vals = {k: np.sort(np.concatenate(v)) if v else np.array([])
                   for k, v in vals.items()}
    ival_index = {iv: k for k, iv in enumerate(intervals)}
    out = {}
    for i, (iv, rank) in targets.items():
        arr = sorted_vals[ival_index[iv]]
        out[i] = float(arr[min(rank, len(arr)) - 1])
    return out


def grouped_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    group_col: str,
    qs: Sequence[float],
    bins: int = 1024,
    collect_cap: int = 1_000_000,
    max_passes: int = 6,
) -> List[Tuple[object, float, float]]:
    """Exact quantile_disc per group — [(group, q, value)].

    Same histogram-refinement as ``exact_quantiles`` with every open
    target tagged by group; each pass histograms all (group, interval)
    targets in ONE map_batches. Driver state is |groups| x |qs| x bins
    ints, so this is for LOW-CARDINALITY group columns (event types,
    languages, sources — up to a few thousand groups); higher-cardinality
    grouping should exchange on the group key and run per-partition
    sorts instead. NULL groups are kept (SQL GROUP BY semantics); NULL /
    NaN values are dropped within each group (SQL aggregate semantics).
    """
    import pandas as pd

    ds = ds.select_columns([group_col, col]).materialize()

    def stats_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        agg = (df.groupby(group_col, dropna=False)[col]
               .agg(["count", "min", "max"]).reset_index())
        return pa.Table.from_pandas(agg, preserve_index=False)

    gstats: dict = {}
    for b in ds.map_batches(stats_partial,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for g, n, lo, hi in zip(b.column(group_col).to_pylist(),
                                b.column("count").to_pylist(),
                                b.column("min").to_pylist(),
                                b.column("max").to_pylist()):
            cur = gstats.get(g)
            if cur is None:
                # n == 0: the group exists but every value is NULL/NaN —
                # SQL still emits the group (quantile NULL), so track it
                gstats[g] = [n, lo, hi]
            elif n:
                if cur[0]:
                    cur[1] = min(cur[1], lo)
                    cur[2] = max(cur[2], hi)
                else:
                    cur[1], cur[2] = lo, hi
                cur[0] += n

    # open targets: (group, q-index) -> (interval, rank-within)
    open_qs: dict = {}
    resolved: dict = {}
    for g, (n, lo, hi) in gstats.items():
        for i, q in enumerate(qs):
            if n:
                open_qs[(g, i)] = ((float(lo), float(hi), True),
                                   disc_rank(q, n))
            else:
                resolved[(g, i)] = float("nan")   # SQL NULL quantile

    def run_pass(targets, collect: bool):
        """One map_batches over all (group, interval) targets; returns
        merged histograms or collected values per target key."""
        keys = sorted(targets, key=repr)
        specs = [(k, targets[k][0]) for k in keys]

        def partial(b: pa.Table, _specs=specs, _collect=collect):
            import numpy as np

            df = b.to_pandas()
            gvals = df[group_col]
            out_hist, out_vals, out_tags = [], [], []
            for idx, ((g, _), iv) in enumerate(_specs):
                mask = gvals.isna() if pd.isna(g) else (gvals == g)
                v = df.loc[mask, col].to_numpy(dtype=np.float64,
                                               na_value=np.nan)
                v = v[~np.isnan(v)]
                sel = _select(v, iv)
                if _collect:
                    out_vals.append(sel)
                    out_tags.append(np.full(len(sel), idx, dtype=np.int32))
                else:
                    edges = np.linspace(iv[0], iv[1], bins + 1)
                    bi = np.clip(
                        np.searchsorted(edges, sel, side="right") - 1,
                        0, bins - 1)
                    out_hist.append(np.bincount(bi, minlength=bins))
            if _collect:
                import numpy as np
                return pa.table({
                    "_v": pa.array(np.concatenate(out_vals)
                                   if out_vals else [], pa.float64()),
                    "_k": pa.array(np.concatenate(out_tags)
                                   if out_tags else [], pa.int32())})
            import numpy as np
            return pa.table({"hist": pa.array(
                [np.concatenate(out_hist).astype(np.int64)])})

        import numpy as np

        if collect:
            vals = {i: [] for i in range(len(keys))}
            for b in ds.map_batches(partial,
                                    batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None):
                ks = b.column("_k").to_numpy()
                vs = b.column("_v").to_numpy()
                for kk in np.unique(ks):
                    vals[int(kk)].append(vs[ks == kk])
            return keys, vals
        total = np.zeros(len(keys) * bins, dtype=np.int64)
        for b in ds.map_batches(partial,
                                batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            for h in b.column("hist").to_pylist():
                total += np.asarray(h, dtype=np.int64)
        return keys, total

    import numpy as np

    for _ in range(max_passes):
        for kk in [k for k, (iv, _) in open_qs.items() if iv[0] == iv[1]]:
            resolved[kk] = open_qs.pop(kk)[0][0]
        if not open_qs:
            break
        keys, total = run_pass(open_qs, collect=False)
        collect_now: dict = {}
        still: dict = {}
        for idx, kk in enumerate(keys):
            iv, rank = open_qs[kk]
            hist = total[idx * bins:(idx + 1) * bins]
            cum = np.cumsum(hist)
            bi = int(np.searchsorted(cum, rank, side="left"))
            local = rank - (int(cum[bi - 1]) if bi else 0)
            edges = np.linspace(iv[0], iv[1], bins + 1)
            child = (float(edges[bi]), float(edges[bi + 1]),
                     iv[2] if bi == bins - 1 else False)
            (collect_now if int(hist[bi]) <= collect_cap
             else still)[kk] = (child, local)
        if collect_now:
            ckeys, vals = run_pass(collect_now, collect=True)
            for idx, kk in enumerate(ckeys):
                arr = np.sort(np.concatenate(vals[idx])
                              if vals[idx] else np.array([]))
                _, rank = collect_now[kk]
                resolved[kk] = float(arr[min(rank, len(arr)) - 1])
        open_qs = still
    if open_qs:
        ckeys, vals = run_pass(open_qs, collect=True)
        for idx, kk in enumerate(ckeys):
            arr = np.sort(np.concatenate(vals[idx])
                          if vals[idx] else np.array([]))
            _, rank = open_qs[kk]
            resolved[kk] = float(arr[min(rank, len(arr)) - 1])

    out = []
    for g in gstats:
        for i, q in enumerate(qs):
            out.append((g, float(q), resolved[(g, i)]))
    return out
