"""Relational joins for two large sides.

The reference has no relational joins (SURVEY.md §2.4) — these are the
engine-level operators a 100 TB pipeline needs when neither side fits a
broadcast:

  - ``hash_join``: partitioned hash join — both sides get a vectorized
    content-hash column and a side tag, are unioned, and each partition of
    the two-phase exchange (stages/exchange.py) joins its co-located sides
    with ONE vectorized ``pandas.merge`` (exact key equality — the hash is
    only the routing key). Salt a hot key by widening ``num_partitions``.
  - ``asof_join``: backward as-of join — both sides exchange on the
    equality key's hash, then each partition runs ONE ``pandas.merge_asof``
    with ``by=<key>`` over all of its keys (vectorized across keys; round 1
    ran a Python ``merge_asof`` per key via ``groupby.map_groups``).
    Partitioning assumption: all rows of one ``by`` key fit a worker's
    partition (uniform hash => partitions stay balanced; a single
    pathological key that exceeds a partition needs a range split on
    ``on`` — documented, not implemented).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _sample_boundaries(ds: "ray.data.Dataset", col: str,
                       n_buckets: int, per_batch: int = 512) -> np.ndarray:
    """Deterministic stride sample of ``col`` -> (n_buckets - 1) ascending
    quantile boundaries. Bucket balance only affects load, never results,
    so a bounded sample is enough (the exact-quantile operator would cost
    extra passes)."""
    vals = []

    def sample(b: pa.Table) -> pa.Table:
        v = b.column(col).to_pandas().dropna()
        stride = max(1, len(v) // per_batch)
        return pa.table({col: pa.Array.from_pandas(v.iloc[::stride])})

    for b in (ds.select_columns([col])
              .map_batches(sample, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        vals.append(b.column(col).to_numpy(zero_copy_only=False))
    allv = np.concatenate(vals) if vals else np.array([])
    if len(allv) == 0:
        return np.array([])
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return np.sort(np.quantile(allv, qs))


def _tag_side(ds: "ray.data.Dataset", key, side: str,
              cols: List[str], pad_cols: List[str],
              drop_null_key: bool = False,
              bucket_on=None, carry_latest: bool = False) -> "ray.data.Dataset":
    """Select + side-tag + null-pad to the union schema + vectorized key
    hash (the exchange routing column). ``key`` is one column name or a
    list (composite key: rows route on the tuple hash; ``drop_null_key``
    drops rows where ANY key column is NULL — SQL composite equality
    can't match through a NULL component).

    ``bucket_on=(col, boundaries)`` adds a ``_tb`` range-bucket column and
    routes on hash(key, _tb) instead of hash(key) — the as-of hot-key
    split. ``carry_latest`` additionally emits, per (key, bucket j>0), the
    batch's latest row STRICTLY BEFORE bucket j's start, tagged ``_tb=j``
    (the backward-as-of carry-in; see asof_join)."""
    import pyarrow.compute as pc

    from calendar_event_entity_extraction_ray.stages.dedup import (
        hash64_columns,
    )

    keys = [key] if isinstance(key, str) else list(key)

    def prep(b: pa.Table) -> pa.Table:
        b = b.select(cols)
        if drop_null_key:
            for kc in keys:
                b = b.filter(pc.is_valid(b.column(kc)))
        b = b.append_column("_side", pa.array([side] * b.num_rows, pa.string()))
        for c in pad_cols:
            b = b.append_column(c, pa.nulls(b.num_rows))
        if bucket_on is None:
            return b.append_column(
                "_kh", pa.array(hash64_columns(b, keys), pa.int64()))
        on_col, bounds = bucket_on
        ov = b.column(on_col).to_numpy(zero_copy_only=False)
        # nulls -> bucket 0 (they never match; merge_asof sees them per
        # partition exactly as the unbucketed fold would)
        valid = ~pd.isna(ov)
        tb = np.zeros(len(ov), dtype=np.int64)
        if valid.any() and len(bounds):
            tb[valid] = np.searchsorted(bounds, ov[valid], side="right")
        b = b.append_column("_tb", pa.array(tb, pa.int64()))
        if carry_latest and len(bounds) and b.num_rows:
            df = b.to_pandas()
            carries = []
            for j in range(1, len(bounds) + 1):
                start = bounds[j - 1]
                before = df[np.asarray(valid) & (ov < start)]
                if before.empty:
                    continue
                ix = before.groupby(key, sort=False)[on_col].idxmax()
                c = df.loc[ix].copy()
                c["_tb"] = j
                carries.append(c)
            if carries:
                df = pd.concat([df] + carries, ignore_index=True)
                b = pa.Table.from_pandas(df, preserve_index=False).cast(
                    b.schema)
        return b.append_column(
            "_kh", pa.array(hash64_columns(b, keys + ["_tb"]), pa.int64()))

    return ds.map_batches(prep, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key,
    left_cols: List[str],
    right_cols: List[str],
    num_buckets: Optional[int] = None,  # None = exchange sizes itself
    how: str = "inner",
) -> "ray.data.Dataset":
    """Inner / left- / full-outer join on ``key`` (one column name or a
    list for a composite key); output columns = left_cols ∪ right_cols.

    Column sets must be disjoint apart from ``key``. SQL equality never
    matches NULL = NULL, so NULL-key rows are dropped on BOTH sides up
    front (pandas ``merge`` would otherwise happily join NaN to NaN) —
    except sides whose NULL-key rows are SQL OUTPUT rows: the left side
    of ``how="left"`` and both sides of ``how="full"`` (kept, unmatched,
    other side's columns NULL; the merge itself only ever sees non-null
    keys, so the NaN==NaN quirk can't fire). Unmatched columns surface
    as nulls, so integer columns widen to float64 in outer-join output —
    the same NULL-widening any SQL client sees."""
    if how not in ("inner", "left", "full"):
        raise ValueError(f"how={how!r}: only 'inner', 'left', 'full'")
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    keys = [key] if isinstance(key, str) else list(key)
    l_only = [c for c in left_cols if c not in keys]
    r_only = [c for c in right_cols if c not in keys]
    lt = _tag_side(left, keys, "l", left_cols, r_only,
                   drop_null_key=(how == "inner"))
    rt = _tag_side(right, keys, "r", right_cols, l_only,
                   drop_null_key=(how != "full"))
    both = lt.union(rt)

    out_cols = keys + l_only + r_only

    def join_fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # side-split in ARROW before pandas: each side's own columns carry
        # no nulls, so integer dtypes survive (converting the unioned table
        # first would see the other side's null pads and float-poison them)
        lg = (t.filter(pc.equal(t.column("_side"), "l"))
              .select(keys + l_only).to_pandas())
        rg = (t.filter(pc.equal(t.column("_side"), "r"))
              .select(keys + r_only).to_pandas())
        if how == "full":
            # any-NULL-key rows on either side are unmatched OUTPUT rows;
            # excise them before the merge (NaN must never join NaN),
            # re-append padded after
            # (composite: one NULL component fails the whole equality)
            l_nullmask = lg[keys].isna().any(axis=1)
            r_nullmask = rg[keys].isna().any(axis=1)
            out = lg[~l_nullmask].merge(
                rg[~r_nullmask], on=keys, how="outer")
            if l_nullmask.any() or r_nullmask.any():
                out = pd.concat([out, lg[l_nullmask], rg[r_nullmask]],
                                ignore_index=True)
            out = out[out_cols]
        else:
            out = lg.merge(rg, on=keys, how=how)[out_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    return hash_partition_map(both, "_kh", join_fold,
                              num_partitions=num_buckets)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    left_cols: List[str],
    right_cols: List[str],
    suffix: str = "_right",
    tolerance: Optional[pd.Timedelta] = None,
    time_buckets: int = 0,
) -> "ray.data.Dataset":
    """Backward as-of join: for each left row, the latest right row with
    ``right.on <= left.on`` within the same ``by`` key (LEFT join: unmatched
    left rows keep nulls). SQL equality never matches NULL = NULL, so right
    rows with a NULL key are dropped up front and NULL-key left rows pass
    through unmatched.

    ``time_buckets`` is the HOT-KEY ESCAPE HATCH: by default the exchange
    co-locates ALL rows of a ``by`` key in one partition (one pathological
    key exceeding a worker breaks that). With ``time_buckets > 1`` every
    key is additionally RANGE-SPLIT on ``on`` into that many buckets
    (boundaries = deterministic sample quantiles of ``left.on``), the
    exchange routes on hash(by, bucket), and the right side replicates one
    boundary carry-in per (key, bucket): the per-batch latest right row
    strictly before each bucket's start (the only earlier-bucket row a
    backward as-of can need; per-batch maxima are superseded inside the
    fold by ``merge_asof`` taking the latest, so duplicates are harmless).
    Results are identical to the unbucketed join; the cost is the carry
    replication (<= time_buckets rows per key per right batch)."""
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    l_only = [c for c in left_cols if c not in (on, by)]
    r_only = [c for c in right_cols if c not in (on, by)]
    if time_buckets and time_buckets > 1:
        boundaries = _sample_boundaries(left, on, time_buckets)
    else:
        boundaries = None
    lt = _tag_side(left, by, "l", left_cols, r_only,
                   bucket_on=(on, boundaries) if boundaries is not None
                   else None)
    rt = _tag_side(right, by, "r", right_cols, l_only, drop_null_key=True,
                   bucket_on=(on, boundaries) if boundaries is not None
                   else None,
                   carry_latest=boundaries is not None)
    both = lt.union(rt)

    on_r = on + suffix
    out_cols = [on, by] + l_only + [on_r] + r_only

    def asof_fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # side-split in ARROW first (see join_fold: dtype preservation)
        lg = (t.filter(pc.equal(t.column("_side"), "l"))
              .select([on, by] + l_only).to_pandas())
        rg = (t.filter(pc.equal(t.column("_side"), "r"))
              .select([on, by] + r_only).to_pandas()
              .rename(columns={on: on_r}))
        if lg.empty:
            empty = lg.copy()
            empty[on_r] = pd.Series([], dtype=rg[on_r].dtype)
            for c in r_only:
                empty[c] = pd.Series([], dtype=rg[c].dtype)
            return pa.Table.from_pandas(empty[out_cols], preserve_index=False)
        # NULL-key left rows can never match — route them around merge_asof
        null_l = lg[lg[by].isna()].copy()
        lg = lg[lg[by].notna()]
        if lg.empty or rg.empty:
            out = lg.copy()
            out[on_r] = pd.Series([pd.NaT] * len(out), dtype=rg[on_r].dtype,
                                  index=out.index)
            for c in r_only:
                out[c] = pd.Series([None] * len(out), index=out.index)
        else:
            # ONE vectorized merge_asof across every key in the partition
            out = pd.merge_asof(
                lg.sort_values(on, kind="stable"),
                rg.sort_values(on_r, kind="stable"),
                left_on=on, right_on=on_r, by=by,
                direction="backward", tolerance=tolerance,
            )
        if len(null_l):
            null_l[on_r] = pd.NaT
            for c in r_only:
                null_l[c] = None
            out = pd.concat([out, null_l], ignore_index=True)
        return pa.Table.from_pandas(out[out_cols], preserve_index=False)

    return hash_partition_map(both, "_kh", asof_fold)


def range_join_count(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    lo,
    hi,
    left_cols: List[str],
    count_col: str = "n_in_range",
) -> "ray.data.Dataset":
    """Interval/range join, count form: for each left row, the number of
    right rows with the same ``by`` key and ``right.on`` in
    ``[left.on + lo, left.on + hi)`` (lower inclusive, upper exclusive —
    SQL ``r.on >= l.on + lo AND r.on < l.on + hi``). LEFT semantics:
    every left row survives, zero-match rows carry 0. NULL-key left rows
    count 0; NULL-key right rows are dropped (SQL NULL equality).

    The pair-explosion-free range join: both sides exchange on the ``by``
    hash, then each partition answers every left row with two vectorized
    ``np.searchsorted`` rank lookups against its key's sorted right
    timestamps (one pass per key GROUP, vectorized across the group's
    rows — never per row, never materializing match pairs).
    ``lo``/``hi`` are offsets in the ``on`` column's own algebra
    (``np.timedelta64`` / ``pd.Timedelta`` for timestamps, numbers for
    numeric columns).
    """
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    l_cols = list(dict.fromkeys([on, by] + list(left_cols)))
    lt = _tag_side(left, by, "l", l_cols, [])
    rt = _tag_side(right, by, "r", [on, by], [c for c in l_cols
                                              if c not in (on, by)],
                   drop_null_key=True)
    both = lt.union(rt)
    out_cols = list(left_cols) + [count_col]

    def count_fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lg = (t.filter(pc.equal(t.column("_side"), "l"))
              .select(l_cols).to_pandas())
        rg = (t.filter(pc.equal(t.column("_side"), "r"))
              .select([on, by]).to_pandas())
        if lg.empty:
            lg[count_col] = pd.Series([], dtype="int64")
            return pa.Table.from_pandas(lg[out_cols], preserve_index=False)
        rg = rg[rg[on].notna()].sort_values([by, on], kind="mergesort")
        r_groups = {k: g[on].to_numpy()
                    for k, g in rg.groupby(by, sort=False)}
        parts = []
        for k, g in lg.groupby(by, sort=False, dropna=False):
            rt_arr = None if pd.isna(k) else r_groups.get(k)
            c = np.zeros(len(g), dtype=np.int64)
            if rt_arr is not None and len(rt_arr):
                valid = ~pd.isna(g[on]).to_numpy()
                if valid.any():
                    tv = g[on].to_numpy()[valid]
                    c[valid] = (
                        np.searchsorted(rt_arr, tv + hi, side="left")
                        - np.searchsorted(rt_arr, tv + lo, side="left"))
            gg = g.copy()
            gg[count_col] = c
            parts.append(gg)
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out[out_cols], preserve_index=False)

    return hash_partition_map(both, "_kh", count_fold)


def interval_join_pairs(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    lo,
    hi,
    left_cols: List[str],
    right_cols: List[str],
) -> "ray.data.Dataset":
    """Interval/range join, PAIR form: one output row per (l, r) pair with
    ``l.by == r.by`` and ``r.on`` in ``[l.on + lo, l.on + hi)`` (SQL
    ``r.on >= l.on + lo AND r.on < l.on + hi``). INNER semantics: NULL
    ``by`` keys drop on both sides, NULL left ``on`` rows never match.

    Same by-key exchange as ``range_join_count``; each fold answers every
    left row of a key group with two vectorized ``np.searchsorted`` rank
    lookups against the group's sorted right timestamps, then emits the
    pairs with one vectorized gather (``np.repeat`` of left indices, the
    arange-minus-cumsum trick for right indices) — the only O(pairs) work
    is writing the output itself, never a nested loop.

    ``right_cols`` must be disjoint from ``left_cols`` + ``[on, by]``
    (pre-rename the right side — the fold unions both schemas). Output
    columns: ``left_cols`` then ``right_cols``. Partitioning assumption
    (same as asof_join): one ``by`` key's rows fit a worker's partition.
    """
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    l_cols = list(dict.fromkeys([on, by] + list(left_cols)))
    r_only = [c for c in right_cols if c != by]
    overlap = set(r_only) & set(l_cols)
    if overlap:
        raise ValueError(f"right_cols collide with left side: {overlap}")
    r_cols = list(dict.fromkeys([on, by] + r_only))

    lt = _tag_side(left, by, "l", l_cols, r_only, drop_null_key=True)
    rt = _tag_side(right, by, "r", r_cols,
                   [c for c in l_cols if c not in (on, by)],
                   drop_null_key=True)
    both = lt.union(rt)
    out_cols = list(left_cols) + list(right_cols)

    def pair_fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lg = (t.filter(pc.equal(t.column("_side"), "l"))
              .select(l_cols).to_pandas())
        rg = (t.filter(pc.equal(t.column("_side"), "r"))
              .select(r_cols).to_pandas())
        rg = rg[rg[on].notna()].sort_values([by, on], kind="mergesort")
        r_groups = {k: g for k, g in rg.groupby(by, sort=False)}
        parts = [pd.concat([lg.iloc[[]][left_cols].reset_index(drop=True),
                            rg.iloc[[]][right_cols].reset_index(drop=True)],
                           axis=1)]  # dtype-stable empty frame
        for k, g in lg.groupby(by, sort=False):
            rk = r_groups.get(k)
            if rk is None or not len(rk):
                continue
            rt_arr = rk[on].to_numpy()
            valid = ~pd.isna(g[on]).to_numpy()
            if not valid.any():
                continue
            g = g[valid]
            tv = g[on].to_numpy()
            starts = np.searchsorted(rt_arr, tv + lo, side="left")
            ends = np.searchsorted(rt_arr, tv + hi, side="left")
            counts = ends - starts
            tot = int(counts.sum())
            if tot == 0:
                continue
            li = np.repeat(np.arange(len(g)), counts)
            cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ri = (np.arange(tot) - np.repeat(cum, counts)
                  + np.repeat(starts, counts))
            parts.append(pd.concat(
                [g.iloc[li][left_cols].reset_index(drop=True),
                 rk.iloc[ri][right_cols].reset_index(drop=True)], axis=1))
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out[out_cols], preserve_index=False)

    return hash_partition_map(both, "_kh", pair_fold)


def _right_key_bloom(right, key, n_bits, k=4):
    """Per-batch partial Bloom filters over the right side's key hashes,
    OR-folded on the driver (bit-array-sized, never the keys)."""
    import ray

    from calendar_event_entity_extraction_ray.functions.bloom import (
        BloomFilter,
    )
    from calendar_event_entity_extraction_ray.stages.dedup import (
        hash64_columns,
    )

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column(key)))
        f = BloomFilter(n_bits=n_bits, k=k)
        if b.num_rows:
            f.add_hashes(hash64_columns(b, [key]))
        return pa.table({"bloom": pa.array([f.serialize()], pa.binary())})

    merged = BloomFilter(n_bits=n_bits, k=k)
    for b in right.map_batches(partial,
                               batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for blob in b.column("bloom").to_pylist():
            merged.merge(BloomFilter.deserialize(blob, k=k))
    return ray.put(merged)


def _exists_join(left, right, key, left_cols, want_match, num_buckets,
                 bloom_bits=0):
    """Shared kernel for semi (EXISTS) / anti (NOT EXISTS) joins: both
    sides exchange on the key hash, each partition does one vectorized
    ``isin`` against its co-located right-key set (exact key equality —
    the hash only routes). NULL-key right rows prove nothing and are
    dropped; NULL-key left rows can never be proven to match, so they are
    KEPT by anti and DROPPED by semi (SQL EXISTS/NOT EXISTS)."""
    import pyarrow.compute as pc

    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    l_cols = list(dict.fromkeys([key] + list(left_cols)))

    bypass = None
    if bloom_bits:
        # Bloom pre-filter: definite-miss left rows (and NULL keys — a
        # definite non-match) never enter the exchange; maybe-match rows
        # go through the exact exchange as usual. No false negatives, so
        # results are identical — only shuffle volume changes. The
        # definite-miss stream IS the answer for anti and a definite
        # drop for semi.
        import ray as _ray

        from calendar_event_entity_extraction_ray.functions.bloom import (
            BloomFilter,
        )
        from calendar_event_entity_extraction_ray.stages.dedup import (
            hash64_columns,
        )

        bloom_ref = _right_key_bloom(right, key, bloom_bits)

        def split(b: pa.Table, keep_maybe: bool) -> pa.Table:
            import pyarrow.compute as pc

            f = _ray.get(bloom_ref)
            b2 = b.select(l_cols)
            valid = pc.is_valid(b2.column(key)).to_numpy(
                zero_copy_only=False)
            maybe = valid & f.contains_hashes(hash64_columns(b2, [key]))
            want = maybe if keep_maybe else ~maybe
            return b2.filter(pa.array(want, pa.bool_()))

        if not want_match:
            bypass = left.map_batches(
                lambda b: split(b, False).select(left_cols),
                batch_format="pyarrow")
        left = left.map_batches(lambda b: split(b, True),
                                batch_format="pyarrow")

    lt = _tag_side(left, key, "l", l_cols, [])
    rt = _tag_side(right, key, "r", [key],
                   [c for c in l_cols if c != key], drop_null_key=True)
    both = lt.union(rt)

    def fold(t: pa.Table) -> pa.Table:
        lg = t.filter(pc.equal(t.column("_side"), "l")).select(l_cols)
        rg = t.filter(pc.equal(t.column("_side"), "r"))
        if rg.num_rows == 0 or lg.num_rows == 0:
            return (lg if not want_match
                    else lg.slice(0, 0)).select(left_cols)
        rkeys = pc.unique(rg.column(key))
        # NULL-key left rows: is_in yields null -> fill false (no match)
        matched = pc.fill_null(
            pc.is_in(lg.column(key), value_set=rkeys), False)
        keep = matched if want_match else pc.invert(matched)
        return lg.filter(keep).select(left_cols)

    out = hash_partition_map(both, "_kh", fold,
                             num_partitions=num_buckets)
    return out.union(bypass) if bypass is not None else out


def anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_cols: List[str],
    num_buckets: Optional[int] = None,
    bloom_bits: int = 0,
) -> "ray.data.Dataset":
    """Large-large anti join (SQL ``NOT EXISTS``) — see ``_exists_join``.
    ``bloom_bits`` > 0 enables the Bloom pre-filter (size ~16x expected
    distinct right keys): definite-miss left rows bypass the exchange."""
    return _exists_join(left, right, key, left_cols, False, num_buckets,
                        bloom_bits=bloom_bits)


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_cols: List[str],
    num_buckets: Optional[int] = None,
    bloom_bits: int = 0,
) -> "ray.data.Dataset":
    """Large-large semi join (SQL ``EXISTS``) — left rows with at least
    one right match; right columns never ship. See ``_exists_join``.
    ``bloom_bits`` > 0 prunes definite-miss left rows before the
    exchange."""
    return _exists_join(left, right, key, left_cols, True, num_buckets,
                        bloom_bits=bloom_bits)


def detect_hot_keys(
    ds: "ray.data.Dataset",
    key: str,
    total_rows: int,
    hot_share: float = 0.01,
    probe_k: int = 32,
) -> dict:
    """Approximate hot-key detection: each batch contributes its top
    ``probe_k`` key counts (one vectorized ``value_counts`` — counters
    move, never rows), the driver sums them, and keys whose summed count
    exceeds ``hot_share`` of ``total_rows`` are hot. Per-batch top-k can
    only UNDERCOUNT a key (it may miss batches where the key fell below
    rank k), so a detected-hot key is genuinely hot; a hot key just
    above threshold may be missed — harmless, hot/cold routing is a
    performance decision, never a correctness one. Returns
    {key_value: estimated_count}."""
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    def probe(b: pa.Table) -> pa.Table:
        vc = b.select([key]).to_pandas()[key].value_counts().head(probe_k)
        return pa.Table.from_pandas(
            pd.DataFrame({key: vc.index, "_c": vc.values.astype("int64")}),
            preserve_index=False)

    partials = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return {}
    sums = partials.groupby(key, dropna=True)["_c"].sum()
    cut = hot_share * max(1, total_rows)
    return {k: int(c) for k, c in sums.items() if c > cut}


def broadcast_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key,
    left_cols: List[str],
    right_cols: List[str],
    how: str = "inner",
    max_broadcast_rows: int = 2_000_000,
) -> "ray.data.Dataset":
    """Map-side join against a dimension-sized right table: the right side
    is collected once, ``ray.put`` once, and every left batch does ONE
    vectorized pandas merge against it — NO shuffle, the left side never
    leaves its blocks. The generalization of ``broadcast_lookup`` to
    multi-column right payloads and composite keys; output layout and NULL
    semantics match ``hash_join`` exactly (right NULL keys dropped; left
    NULL keys dropped for inner, kept-unmatched for left), so the two are
    interchangeable — ``auto_join`` picks between them by right-side size.

    ``max_broadcast_rows`` makes the dimension-sized assumption explicit
    (like skewed_hash_join's ``max_hot_right_rows``): exceeding it raises
    rather than silently materializing a fact table on the driver."""
    import ray as _ray

    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: broadcast_join supports inner/left")
    keys = [key] if isinstance(key, str) else list(key)
    l_only = [c for c in left_cols if c not in keys]
    r_only = [c for c in right_cols if c not in keys]
    out_cols = keys + l_only + r_only
    l_cols = list(dict.fromkeys(keys + list(left_cols)))
    r_cols = list(dict.fromkeys(keys + list(right_cols)))

    n_r = right.count()
    if n_r > max_broadcast_rows:
        raise ValueError(
            f"broadcast_join right side has {n_r} rows > "
            f"max_broadcast_rows={max_broadcast_rows}; use hash_join "
            "(exchange) for large-large joins")
    rdf = right.select_columns(r_cols).to_pandas()
    # SQL equality never matches NULL: right NULL-key rows prove nothing
    # and must not NaN==NaN-match a kept left NULL row in pandas merge
    rdf = rdf[~rdf[keys].isna().any(axis=1)].reset_index(drop=True)
    r_ref = _ray.put(rdf)

    def bjoin(b: pa.Table) -> pa.Table:
        rd = _ray.get(r_ref)
        lg = b.select(l_cols).to_pandas()
        if how == "inner":
            lg = lg[~lg[keys].isna().any(axis=1)]
        for k in keys:
            # a left batch whose key column carries a null arrives float64
            # while the right side is int64 — pandas merge refuses mixed
            # dtypes; float64 equality is exact for |v| < 2^53 (the same
            # canonicalization hash64_columns documents)
            if lg[k].dtype != rd[k].dtype:
                rd = rd.assign(**{k: rd[k].astype(lg[k].dtype)})
        out = lg.merge(rd, on=keys, how=how)[out_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    return left.map_batches(bjoin, batch_format="pyarrow")


def auto_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key,
    left_cols: List[str],
    right_cols: List[str],
    how: str = "inner",
    broadcast_max_rows: int = 2_000_000,
    hot_share: float = 0.0,
) -> "ray.data.Dataset":
    """Size-routed join front door — the one call a pipeline author makes;
    the routing decisions the brief's scale notes prescribe happen here:

    - right side fits ``broadcast_max_rows`` (counted first — a parquet
      count is O(footers), no scan) -> ``broadcast_join``: map-side, the
      big side never shuffles;
    - else, ``hot_share`` > 0 and inner -> ``skewed_hash_join``: probe for
      hot keys, fragment-replicate them, exchange the cold rest;
    - else -> plain exchange ``hash_join``.

    All routes emit identical rows (pinned by TestAutoJoin); the choice is
    performance-only, so a mis-sized threshold can never corrupt results."""
    n_r = right.count()
    if n_r <= broadcast_max_rows and how in ("inner", "left"):
        return broadcast_join(left, right, key, left_cols, right_cols,
                              how=how, max_broadcast_rows=broadcast_max_rows)
    if hot_share > 0 and how == "inner" and isinstance(key, str):
        return skewed_hash_join(left, right, key, left_cols, right_cols,
                                hot_share=hot_share)
    return hash_join(left, right, key, left_cols, right_cols, how=how)


def skewed_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_cols: List[str],
    right_cols: List[str],
    hot_share: float = 0.01,
    max_hot_right_rows: int = 2_000_000,
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Skew-aware INNER hash join — the fragment-replicate escape hatch
    for the one thing a hash exchange cannot fix: a single join key
    holding a large fraction of the rows (the exchange co-locates ALL of
    a key's rows in ONE partition, so one fold task inherits the hot
    key's entire volume while every other task finishes and idles).

    Plan: one probe pass over the (materialized) left side detects hot
    keys (``detect_hot_keys`` — per-batch top-k counters, driver fold);
    the RIGHT side's hot-key rows — dimension-sized by assumption, the
    ``max_hot_right_rows`` guard makes the assumption explicit — are
    collected once and broadcast via ``ray.put``; left hot rows then
    join map-side (one vectorized merge per batch, parallel across ALL
    blocks instead of serialized in one fold task); cold keys take the
    normal exchange ``hash_join``. Output = cold ∪ hot, identical rows
    to a plain inner ``hash_join`` (routing is performance-only; pinned
    by tests/test_joins.py against pandas.merge).

    When both sides are huge ON THE SAME hot key the join output is
    |L_k|·|R_k| pairs — no partitioning strategy fixes a quadratic
    result; that case needs the upstream pre-aggregation the aggregate
    operators here already do."""
    import ray as _ray

    import pyarrow.compute as pc

    left = left.materialize()  # probed once, routed once
    total = left.count()
    hot = detect_hot_keys(left, key, total, hot_share=hot_share)
    if not hot:
        return hash_join(left, right, key, left_cols, right_cols,
                         num_buckets=num_buckets)

    right = right.materialize()
    hot_vals = pa.array(sorted(hot))
    l_only = [c for c in left_cols if c != key]
    r_only = [c for c in right_cols if c != key]
    out_cols = [key] + l_only + r_only

    right_hot_tbl = pa.concat_tables(
        [b for b in right.map_batches(
            lambda b: b.select(right_cols).filter(
                pc.is_in(b.column(key), value_set=hot_vals)),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow", batch_size=None)],
        promote_options="default")
    if right_hot_tbl.num_rows > max_hot_right_rows:
        raise ValueError(
            f"skewed_hash_join: {right_hot_tbl.num_rows} right rows on "
            f"hot keys exceed max_hot_right_rows={max_hot_right_rows}; "
            "the hot fragment must stay broadcastable — pre-aggregate "
            "the right side or raise the cap deliberately")
    rh_ref = _ray.put(right_hot_tbl.to_pandas())

    def hot_join(b: pa.Table) -> pa.Table:
        rh = _ray.get(rh_ref)  # once per task; worker-cached
        lb = b.select(left_cols).filter(
            pc.is_in(b.column(key), value_set=hot_vals)).to_pandas()
        out = lb.merge(rh, on=key, how="inner")[out_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    hot_out = left.map_batches(hot_join, batch_format="pyarrow")

    def drop_hot(cols):
        def fn(b: pa.Table) -> pa.Table:
            return b.select(cols).filter(
                pc.invert(pc.is_in(b.column(key), value_set=hot_vals)))
        return fn

    cold_out = hash_join(
        left.map_batches(drop_hot(left_cols), batch_format="pyarrow"),
        right.map_batches(drop_hot(right_cols), batch_format="pyarrow"),
        key, left_cols, right_cols, num_buckets=num_buckets)
    return cold_out.union(hot_out)
