"""Event-time watermarks + late-data policy for incremental window
aggregation — the piece that makes the engine's streaming-shaped window
ops real for epoch-delivered input (incremental crawls, log shipping):

- each epoch of events advances the watermark to
  ``max(event_time seen so far) - allowed_lateness``;
- tumbling windows whose END is at or below the watermark FINALIZE —
  their counts are sealed into an epoch-stamped parquet and never change;
- rows arriving for an already-final window are LATE and follow a
  declared policy: ``"drop"`` (counted, discarded) or ``"side_output"``
  (sealed into ``late/epoch=<e>.parquet`` for reconciliation).

Scale shape: the per-epoch pass is ONE distributed partial aggregation
(grouped_sums — the shuffle moves (key, window) partials, never the
event stream); everything the driver holds is the OPEN-window table,
which the watermark bounds by construction (keys x windows inside the
lateness horizon) — the same bounded-state argument as Flink's windowed
operators. Epochs are idempotent: re-running a recorded epoch is a
no-op, so crash recovery is "re-run the job" (the fpstore/delta-ingest
discipline). Single-writer state: one job owns a state dir; the open
table is versioned per epoch and the state JSON is the commit point
(written last, atomically), so a crash ANYWHERE mid-epoch leaves the
previous open table untouched and the re-run recomputes final/late
files byte-identically — no double counting (see `_open_path`).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

WMSTATE = "_WMSTATE.json"


def _load_state(state_dir: str) -> dict:
    p = os.path.join(state_dir, WMSTATE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"epochs": [], "watermark_us": None, "open_file": None}


def _write_state(state_dir: str, state: dict) -> None:
    p = os.path.join(state_dir, WMSTATE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)


def _open_path(state_dir: str, state: dict) -> Optional[str]:
    """Current committed open-window table, or None before the first
    epoch. The file is VERSIONED per epoch (``open.epoch=<e>.parquet``)
    and the state JSON is the commit point: an epoch's merge becomes
    visible only when ``_write_state`` lands, so a crash anywhere before
    that re-runs the epoch against the UNCHANGED previous table —
    final/late files are recomputed byte-identically (they are a pure
    function of (previous state, epoch input)) and nothing double-counts.
    The superseded file is deleted only after the commit."""
    f = state.get("open_file")
    return os.path.join(state_dir, f) if f else None


def _empty_counts(key_col: str) -> pa.Table:
    return pa.table({key_col: pa.array([], pa.string()),
                     "window_start_us": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())})


def tumbling_window_epoch(
    ds: "ray.data.Dataset",
    state_dir: str,
    epoch: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_minutes: int = 60,
    allowed_lateness_minutes: int = 60,
    late_policy: str = "side_output",
    slide_minutes: Optional[int] = None,
) -> dict:
    """Ingest one epoch of events into the windowed-count state.

    Returns a summary dict: ``watermark_us`` (after this epoch),
    ``n_late`` (rows targeting already-final windows), ``n_finalized``
    (windows sealed this epoch), ``noop`` (epoch already recorded).

    Window assignment is ``floor(ts / window)``; a window
    ``[start, start+window)`` finalizes once
    ``start + window <= watermark``. Late = a row whose window had
    already finalized BEFORE this epoch (the watermark only moves
    forward, so "late" is well-defined per epoch).

    ``slide_minutes`` (must divide ``window_minutes``) turns the form
    into SLIDING windows: each event lands in ``window/slide``
    overlapping windows whose starts are multiples of the slide.
    Everything downstream is per (key, window-start) and unchanged —
    sealing, lateness (judged per target window, so one event's oldest
    assignments can be late while its newest proceed) and the state
    layout; ``n_late`` counts late ASSIGNMENTS. Window geometry is
    pinned in the state JSON — an epoch run with different parameters
    is rejected."""
    if late_policy not in ("drop", "side_output"):
        raise ValueError(f"unknown late_policy {late_policy!r}")
    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )

    slide = window_minutes if slide_minutes is None else slide_minutes
    if window_minutes % slide:
        raise ValueError(
            f"slide_minutes={slide} must divide window_minutes"
            f"={window_minutes}")
    kind = "tumbling" if slide == window_minutes else "sliding"
    os.makedirs(state_dir, exist_ok=True)
    state = _load_state(state_dir)
    if state.setdefault("kind", kind) != kind:
        raise ValueError(
            f"state dir {state_dir!r} holds {state['kind']!r} windows")
    params = {"window_minutes": window_minutes, "slide_minutes": slide,
              "allowed_lateness_minutes": allowed_lateness_minutes,
              "key_col": key_col, "ts_col": ts_col}
    if state.setdefault("params", params) != params:
        raise ValueError(
            f"state dir {state_dir!r} was built with "
            f"{state['params']!r}, got {params!r}")
    if epoch in state["epochs"]:
        return {"watermark_us": state["watermark_us"], "n_late": 0,
                "n_finalized": 0, "noop": True}

    win_us = window_minutes * 60_000_000
    slide_us = slide * 60_000_000
    n_asn = win_us // slide_us
    late_us = allowed_lateness_minutes * 60_000_000

    def prep(b: pa.Table) -> pa.Table:
        ts_us = b.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        base = ts_us // slide_us * slide_us
        if n_asn == 1:
            keys = b.column(key_col)
            starts, ts_rep = base, ts_us
        else:
            # each event -> window/slide overlapping windows; arrow
            # take keeps the key dtype through the expansion
            idx = np.repeat(np.arange(len(ts_us)), n_asn)
            keys = b.column(key_col).take(pa.array(idx))
            starts = (np.repeat(base, n_asn)
                      - np.tile(np.arange(n_asn) * slide_us,
                                len(ts_us)))
            ts_rep = np.repeat(ts_us, n_asn)
        return pa.table({
            key_col: keys,
            "window_start_us": pa.array(starts),
            "ts_us": pa.array(ts_rep),
        })

    # ONE distributed pass: (key, window) partial counts + max event
    # time per group; the max of maxes is the epoch's high-water mark
    agg = grouped_sums(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_cols=[key_col, "window_start_us"], sum_cols=[],
        count_alias="n", max_cols=["ts_us"]).to_pandas()

    old_wm = state["watermark_us"]
    if agg.empty:
        new_counts = pd.DataFrame(
            {key_col: [], "window_start_us": [], "n": []})
        late = new_counts
        epoch_max = None
    else:
        epoch_max = int(agg["max_ts_us"].max())
        counts = agg[[key_col, "window_start_us", "n"]]
        is_late = ((counts["window_start_us"] + win_us <= old_wm)
                   if old_wm is not None
                   else pd.Series(False, index=counts.index))
        late = counts[is_late]
        new_counts = counts[~is_late]

    n_late = int(late["n"].sum()) if len(late) else 0
    if n_late and late_policy == "side_output":
        ldir = os.path.join(state_dir, "late")
        os.makedirs(ldir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(
            late.reset_index(drop=True), preserve_index=False),
            os.path.join(ldir, f"epoch={epoch}.parquet"))

    # merge into the open-window table (bounded by the lateness horizon)
    opath = _open_path(state_dir, state)
    if opath is not None and os.path.exists(opath):
        prev = pq.read_table(opath).to_pandas()
    else:
        prev = pd.DataFrame({key_col: pd.Series([], dtype="object"),
                             "window_start_us": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})
    merged = (pd.concat([prev, new_counts], ignore_index=True)
              .groupby([key_col, "window_start_us"], dropna=False,
                       as_index=False)["n"].sum())
    merged["n"] = merged["n"].astype("int64")
    merged["window_start_us"] = merged["window_start_us"].astype("int64")

    new_wm = old_wm
    if epoch_max is not None:
        cand = epoch_max - late_us
        new_wm = cand if old_wm is None else max(old_wm, cand)

    n_finalized = 0
    if new_wm is not None and len(merged):
        seal = merged["window_start_us"] + win_us <= new_wm
        final = merged[seal].sort_values(
            [key_col, "window_start_us"], kind="stable")
        merged = merged[~seal]
        n_finalized = len(final)
        if n_finalized:
            fdir = os.path.join(state_dir, "final")
            os.makedirs(fdir, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(
                final.reset_index(drop=True), preserve_index=False),
                os.path.join(fdir, f"epoch={epoch}.parquet"))

    new_open = f"open.epoch={epoch}.parquet"
    npath = os.path.join(state_dir, new_open)
    tmp = npath + ".tmp"
    pq.write_table(pa.Table.from_pandas(
        merged.reset_index(drop=True), preserve_index=False), tmp)
    os.replace(tmp, npath)

    state["epochs"].append(epoch)
    state["watermark_us"] = new_wm
    state["open_file"] = new_open
    _write_state(state_dir, state)  # the commit point
    if opath is not None and opath != npath:
        try:
            os.remove(opath)
        except OSError:
            pass
    return {"watermark_us": new_wm, "n_late": n_late,
            "n_finalized": n_finalized, "noop": False}


def _merge_intervals(df: pd.DataFrame, key_col: str,
                     gap_us: int) -> pd.DataFrame:
    """(key, start_us, end_us, n) rows -> maximal gap-merged sessions
    per key, one vectorized pass (sort, per-key running-max end, break
    where the next start exceeds it by more than the gap). Merging
    locally-merged intervals re-merges exactly like merging the raw
    points (gap-closure of a union == union of gap-closures), so this
    one kernel serves the per-batch pre-merge AND the exchange fold."""
    if not len(df):
        return df.reset_index(drop=True)
    df = df.sort_values([key_col, "start_us", "end_us"],
                        kind="stable").reset_index(drop=True)
    k = df[key_col]
    prev = k.shift()
    newkey = ~(k.eq(prev) | (k.isna() & prev.isna()))
    newkey.iloc[0] = True
    runmax = df.groupby(k, sort=False, dropna=False)["end_us"].cummax()
    boundary = newkey | (df["start_us"] > runmax.shift() + gap_us)
    sid = boundary.cumsum()
    g = df.groupby(sid, sort=True)
    return pd.DataFrame({
        key_col: g[key_col].first(),
        "start_us": g["start_us"].min().astype("int64"),
        "end_us": g["end_us"].max().astype("int64"),
        "n": g["n"].sum().astype("int64"),
    }).reset_index(drop=True)


def session_window_epoch(
    ds: "ray.data.Dataset",
    state_dir: str,
    epoch: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    allowed_lateness_minutes: int = 60,
    late_policy: str = "side_output",
) -> dict:
    """Session windows (gap-based) under the same watermark protocol as
    ``tumbling_window_epoch`` — the genuinely-streaming case, because
    sessions MERGE across epochs: an epoch-2 event inside the gap of an
    epoch-1 open session extends it (or fuses two of them).

    Semantics per epoch:

    - LATE = event with ``ts <= watermark-before-this-epoch`` (the only
      rows that could touch a sealed session: merging needs
      ``ts <= end + gap`` and sealing needs ``end + gap <= wm``);
      policy ``drop`` (counted) or ``side_output``.
    - on-time events pre-merge per batch, union with the open-session
      table, and ONE hash exchange on the key re-merges per key — the
      shuffle moves (key, start, end, n) intervals, never the event
      stream.
    - watermark advances to ``max(open-session end) - lateness``: the
      max-end session is never sealed (``end + gap > wm`` by
      construction), so the open table always carries the true
      max-event-time — no separate stats pass.
    - sessions with ``end + gap <= watermark`` SEAL (no future on-time
      event can extend them: it would need ``ts <= end + gap <= wm``,
      i.e. be late) into ``final/epoch=<e>.parquet``.

    Crash-safe exactly like the tumbling form: versioned open table,
    state JSON as the commit point. Returns {watermark_us, n_late,
    n_finalized, noop}."""
    if late_policy not in ("drop", "side_output"):
        raise ValueError(f"unknown late_policy {late_policy!r}")
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    os.makedirs(state_dir, exist_ok=True)
    state = _load_state(state_dir)
    if state.setdefault("kind", "session") != "session":
        raise ValueError(
            f"state dir {state_dir!r} holds {state['kind']!r} windows")
    params = {"gap_minutes": gap_minutes,
              "allowed_lateness_minutes": allowed_lateness_minutes,
              "key_col": key_col, "ts_col": ts_col}
    if state.setdefault("params", params) != params:
        raise ValueError(
            f"state dir {state_dir!r} was built with "
            f"{state['params']!r}, got {params!r}")
    if epoch in state["epochs"]:
        return {"watermark_us": state["watermark_us"], "n_late": 0,
                "n_finalized": 0, "noop": True}

    gap_us = gap_minutes * 60_000_000
    late_us = allowed_lateness_minutes * 60_000_000
    old_wm = state["watermark_us"]

    def prep(b: pa.Table) -> pa.Table:
        ts_us = b.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({key_col: b.column(key_col).to_pandas(),
                           "start_us": ts_us.astype("int64"),
                           "end_us": ts_us.astype("int64"),
                           "n": np.ones(len(ts_us), dtype="int64")})
        is_late = (df["start_us"] <= old_wm if old_wm is not None
                   else pd.Series(False, index=df.index))
        late = df[is_late]
        if len(late):
            late = late.groupby([key_col, "start_us"], as_index=False,
                                dropna=False).agg(
                end_us=("end_us", "first"), n=("n", "sum"))
        on = _merge_intervals(df[~is_late], key_col, gap_us)
        late["late"] = True
        on["late"] = False
        out = pd.concat([on, late], ignore_index=True)
        # explicit schema: an all-late or empty batch must not let the
        # pandas round-trip erase the key dtype (CLAUDE.md round-3 fact)
        schema = pa.schema([
            pa.field(key_col, b.schema.field(key_col).type),
            pa.field("start_us", pa.int64()),
            pa.field("end_us", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("late", pa.bool_())])
        return add_hash_column(
            pa.Table.from_pandas(out[[key_col, "start_us", "end_us",
                                      "n", "late"]], schema=schema,
                                 preserve_index=False),
            [key_col], out_col="_kh")

    def fold(t: pa.Table) -> pa.Table:
        df = t.select([key_col, "start_us", "end_us", "n",
                       "late"]).to_pandas()
        late = df[df["late"]]
        if len(late):
            late = late.groupby([key_col, "start_us"], as_index=False,
                                dropna=False).agg(
                end_us=("end_us", "first"), n=("n", "sum"))
        merged = _merge_intervals(df[~df["late"]], key_col, gap_us)
        late["late"] = True
        merged["late"] = False
        out = pd.concat([merged, late], ignore_index=True)
        schema = pa.schema([
            t.schema.field(key_col),
            pa.field("start_us", pa.int64()),
            pa.field("end_us", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("late", pa.bool_())])
        return pa.Table.from_pandas(
            out[[key_col, "start_us", "end_us", "n", "late"]],
            schema=schema, preserve_index=False)

    parts = [ds.map_batches(prep, batch_format="pyarrow")]
    opath = _open_path(state_dir, state)
    if opath is not None and os.path.exists(opath):
        # stay in Arrow: an empty open table (everything sealed) must
        # keep its key dtype through the union
        pt = pq.read_table(opath)
        pt = pt.append_column(
            "late", pa.array(np.zeros(pt.num_rows, bool)))
        parts.append(ray.data.from_arrow(
            add_hash_column(pt, [key_col], out_col="_kh")))
    exch = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    out_ds = hash_partition_map(exch, "_kh", fold)
    batches = list(out_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    result_t = (pa.concat_tables(batches, promote_options="default")
                if batches else None)
    key_field = (result_t.schema.field(key_col) if result_t is not None
                 else pa.field(key_col, pa.string()))
    open_schema = pa.schema([key_field, pa.field("start_us", pa.int64()),
                             pa.field("end_us", pa.int64()),
                             pa.field("n", pa.int64())])
    result = (result_t.to_pandas() if result_t is not None
              else pd.DataFrame({key_col: [], "start_us": [],
                                 "end_us": [], "n": [], "late": []}))

    late = result[result["late"] == True] if len(result) else result  # noqa: E712
    on = result[result["late"] == False] if len(result) else result   # noqa: E712
    n_late = int(late["n"].sum()) if len(late) else 0
    if n_late and late_policy == "side_output":
        ldir = os.path.join(state_dir, "late")
        os.makedirs(ldir, exist_ok=True)
        side = late.rename(columns={"start_us": "ts_us"})[
            [key_col, "ts_us", "n"]].sort_values(
            [key_col, "ts_us"], kind="stable")
        pq.write_table(pa.Table.from_pandas(
            side.reset_index(drop=True), preserve_index=False),
            os.path.join(ldir, f"epoch={epoch}.parquet"))

    new_wm = old_wm
    if len(on):
        cand = int(on["end_us"].max()) - late_us
        new_wm = cand if old_wm is None else max(old_wm, cand)

    n_finalized = 0
    open_rows = (on[[key_col, "start_us", "end_us", "n"]]
                 if len(on) else on.reindex(
                     columns=[key_col, "start_us", "end_us", "n"]))
    if new_wm is not None and len(open_rows):
        seal = open_rows["end_us"] + gap_us <= new_wm
        final = open_rows[seal].sort_values(
            [key_col, "start_us"], kind="stable")
        open_rows = open_rows[~seal]
        n_finalized = len(final)
        if n_finalized:
            fdir = os.path.join(state_dir, "final")
            os.makedirs(fdir, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(
                final.reset_index(drop=True), schema=open_schema,
                preserve_index=False),
                os.path.join(fdir, f"epoch={epoch}.parquet"))

    new_open = f"open.epoch={epoch}.parquet"
    npath = os.path.join(state_dir, new_open)
    tmp = npath + ".tmp"
    pq.write_table(pa.Table.from_pandas(
        open_rows.reset_index(drop=True), schema=open_schema,
        preserve_index=False), tmp)
    os.replace(tmp, npath)

    state["epochs"].append(epoch)
    state["watermark_us"] = new_wm
    state["open_file"] = new_open
    _write_state(state_dir, state)  # the commit point
    if opath is not None and opath != npath:
        try:
            os.remove(opath)
        except OSError:
            pass
    return {"watermark_us": new_wm, "n_late": n_late,
            "n_finalized": n_finalized, "noop": False}


def read_session_state(state_dir: str, key_col: str = "event_type"
                       ) -> pa.Table:
    """Current session view: sealed sessions (status="final") + open
    ones (status="open"), sorted (key, start_us)."""
    def empty():
        return pa.table({key_col: pa.array([], pa.string()),
                         "start_us": pa.array([], pa.int64()),
                         "end_us": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    parts = []
    fdir = os.path.join(state_dir, "final")
    if os.path.isdir(fdir):
        for f in sorted(os.listdir(fdir)):
            parts.append(pq.read_table(os.path.join(fdir, f)))
    final = pa.concat_tables(parts) if parts else empty()
    opath = _open_path(state_dir, _load_state(state_dir))
    opened = (pq.read_table(opath)
              if opath is not None and os.path.exists(opath)
              else empty())
    df_f = final.to_pandas()
    df_f["status"] = "final"
    df_o = opened.to_pandas()
    df_o["status"] = "open"
    out = pd.concat([df_f, df_o], ignore_index=True).sort_values(
        [key_col, "start_us"], kind="stable")
    for c in ("start_us", "end_us", "n"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def read_window_state(state_dir: str, key_col: str = "event_type"
                      ) -> pa.Table:
    """Current view: finalized windows (status="final") + open windows
    (status="open"), sorted (key, window_start_us)."""
    parts = []
    fdir = os.path.join(state_dir, "final")
    if os.path.isdir(fdir):
        for f in sorted(os.listdir(fdir)):
            parts.append(pq.read_table(os.path.join(fdir, f)))
    final = (pa.concat_tables(parts) if parts
             else _empty_counts(key_col))
    opath = _open_path(state_dir, _load_state(state_dir))
    opened = (pq.read_table(opath)
              if opath is not None and os.path.exists(opath)
              else _empty_counts(key_col))
    df_f = final.to_pandas()
    df_f["status"] = "final"
    df_o = opened.to_pandas()
    df_o["status"] = "open"
    out = pd.concat([df_f, df_o], ignore_index=True).sort_values(
        [key_col, "window_start_us"], kind="stable")
    out["n"] = out["n"].astype("int64")
    out["window_start_us"] = out["window_start_us"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def read_late_rows(state_dir: str, key_col: str = "event_type"
                   ) -> pa.Table:
    """The side-output stream: per-epoch late rows —
    (key, window_start_us, n) for tumbling state dirs,
    (key, ts_us, n) for session ones (the empty shape follows the
    dir's kind marker)."""
    ldir = os.path.join(state_dir, "late")
    parts = []
    if os.path.isdir(ldir):
        for f in sorted(os.listdir(ldir)):
            t = pq.read_table(os.path.join(ldir, f))
            epoch = f[len("epoch="):-len(".parquet")]
            parts.append(t.append_column(
                "epoch", pa.array([epoch] * t.num_rows, pa.string())))
    if not parts:
        if _load_state(state_dir).get("kind") == "session":
            e = pa.table({key_col: pa.array([], pa.string()),
                          "ts_us": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        else:
            e = _empty_counts(key_col)
        return e.append_column("epoch", pa.array([], pa.string()))
    return pa.concat_tables(parts)
