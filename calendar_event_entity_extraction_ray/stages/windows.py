"""Streaming-shaped window operators.

Tumbling and sliding windows are stateless per-row window assignments
composed in the queries (floor_temporal / window explode -> salted grouped
count). Session windows need per-key ordered state, so they exchange on the
key hash and fold each partition with ONE vectorized pass (round 1 ran a
Python fold per user via ``groupby.map_groups`` — the per-group-call
anti-pattern at billions of keys).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def sessionize(
    ds: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> "ray.data.Dataset":
    """(user, ts) events -> one row per user: (user, n_sessions, n_events),
    where a session breaks after ``gap_minutes`` of inactivity.

    One exchange on the key hash; per partition a single vectorized pass:
    sort by (user, ts), session starts = first-row-of-user OR gap-exceeded,
    grouped sums in C. NULL keys are dropped (SQL GROUP BY semantics pair
    with ``WHERE user IS NOT NULL``-free oracles because the events table
    has no NULL ts; NULL users form their own group in plain SQL — kept)."""
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    gap = pd.Timedelta(minutes=gap_minutes)

    def fold(t: pa.Table) -> pa.Table:
        df = t.select([user_col, ts_col]).to_pandas().sort_values(
            [user_col, ts_col], kind="stable")
        new_user = df[user_col].ne(df[user_col].shift())
        gap_break = (df[ts_col] - df[ts_col].shift()) > gap
        new_session = (new_user | gap_break).astype("int64")
        g = df.groupby(user_col, sort=False, dropna=False)
        out = pd.DataFrame({
            "n_sessions": new_session.groupby(
                df[user_col], sort=False, dropna=False).sum(),
            "n_events": g.size(),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    hashed = ds.map_batches(
        lambda b: add_hash_column(b.select([user_col, ts_col]), [user_col],
                                  out_col="_uh"),
        batch_format="pyarrow")
    return hash_partition_map(hashed, "_uh", fold)
