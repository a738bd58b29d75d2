"""Deterministic splits + split-leakage anti-join.

Reference semantics:
  - 75/15/10 split after a seeded shuffle (augmentation/main.py:172-183).
    Positional-split-after-random-shuffle is random assignment, so the
    scalable equivalent (SURVEY.md §2.6) is a HASH split: bucket =
    md5(text)[:8] % 10000 -> train/eval/test by proportion thresholds.
    md5 is reproducible in DuckDB, making the split SQL-checkable.
  - ``drop_split_leakage``: anti-join on the normalized text signature with
    precedence train > eval > test; train is never filtered
    (augmentation/augmentors.py:64-78).

Scale note: the default path is the hash-PARTITIONED set-difference — one
two-phase exchange on sig_hash (stages/exchange.py) co-locates every row of
an equal signature, so the full train > eval > test precedence runs locally
per partition and no node ever holds a global signature set. The legacy
``mode="broadcast"`` path (collect train/eval sig sets to the driver,
``ray.put``) remains for small inputs where one exchange costs more than a
broadcast.
"""

from __future__ import annotations

from typing import Dict, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from calendar_event_entity_extraction_ray.functions.textsig import (
    event_text_signature,
    stable_bucket,
)


def assign_split_batch(
    batch: pa.Table,
    text_col: str = "event_text",
    props: Tuple[float, float] = (0.75, 0.15),
    n_buckets: int = 10000,
) -> pa.Table:
    """Add a ``split`` column: train/eval/test by md5-hash bucket of text."""
    t_hi = int(props[0] * n_buckets)
    e_hi = t_hi + int(props[1] * n_buckets)
    texts = batch.column(text_col).to_pylist()
    splits = []
    for t in texts:
        if t is None:
            # SQL CASE on md5(NULL) is NULL -> falls through to 'test';
            # mirror that so the oracle contract holds on NULL text
            splits.append("test")
            continue
        b = stable_bucket(t, n_buckets)
        splits.append("train" if b < t_hi else ("eval" if b < e_hi else "test"))
    return batch.append_column("split", pa.array(splits, pa.string()))


def add_signature_batch(batch: pa.Table, text_col: str = "event_text") -> pa.Table:
    sigs = [event_text_signature(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("sig", pa.array(sigs, pa.string()))


def _collect_sigs(ds: "ray.data.Dataset") -> set:
    """Stream just the sig column to the driver — never the full rows."""
    out = set()
    for b in ds.select_columns(["sig"]).iter_batches(batch_format="pyarrow", batch_size=None):
        out.update(b.column("sig").to_pylist())
    return out


def leakage_fold(t: pa.Table) -> pa.Table:
    """Per-partition precedence filter (exact when partitioned by sig):
    keep all train rows; eval rows whose sig is not in train; test rows
    whose sig is in neither train nor the KEPT eval set (the reference
    builds eval sigs from the filtered eval set, augmentors.py:71).
    Vectorized pandas ``isin``; row selection stays in Arrow so ragged
    list columns survive."""
    import pandas as pd

    if t.num_rows == 0:
        return t
    df = pd.DataFrame({
        "sig": t.column("sig").to_pandas(),
        "split": t.column("split").to_pandas(),
    })
    is_train = df["split"] == "train"
    train_sigs = set(df.loc[is_train, "sig"])
    eval_keep = (df["split"] == "eval") & ~df["sig"].isin(train_sigs)
    eval_sigs = set(df.loc[eval_keep, "sig"])
    test_keep = ((df["split"] == "test")
                 & ~df["sig"].isin(train_sigs)
                 & ~df["sig"].isin(eval_sigs))
    keep = (is_train | eval_keep | test_keep).to_numpy()
    return t.filter(pa.array(keep))


def drop_split_leakage(
    ds: "ray.data.Dataset",
    text_col: str = "event_text",
    mode: str = "partitioned",
    num_partitions: int | None = None,
) -> Dict[str, "ray.data.Dataset"]:
    """Input: dataset with a ``split`` column. Output: per-split datasets with
    eval := eval ∖ train, test := test ∖ (train ∪ eval) on normalized
    signature; train untouched (reference precedence)."""
    if mode == "partitioned":
        from calendar_event_entity_extraction_ray.stages.dedup import (
            add_hash_column,
        )
        from calendar_event_entity_extraction_ray.stages.exchange import (
            hash_partition_map,
        )

        sigged = ds.map_batches(
            lambda b: add_hash_column(
                add_signature_batch(b, text_col), ["sig"]),
            batch_format="pyarrow",
        )
        kept = hash_partition_map(
            sigged, "sig_hash", leakage_fold, num_partitions=num_partitions
        ).drop_columns(["sig", "sig_hash"])

        def part(split_name: str) -> "ray.data.Dataset":
            return kept.map_batches(
                lambda b, s=split_name: b.filter(pc.equal(b.column("split"), s)),
                batch_format="pyarrow",
            )

        return {"train": part("train"), "eval": part("eval"),
                "test": part("test")}
    # sigged is consumed by four branches (train-sig collection, eval
    # filter + collection, test filter, and the returned splits) — pin it so
    # the upstream pipeline + md5 pass run once, not per branch. (At 10^12
    # rows this barrier would be a parquet checkpoint.)
    sigged = ds.map_batches(
        lambda b: add_signature_batch(b, text_col), batch_format="pyarrow"
    ).materialize()

    def part(split_name: str) -> "ray.data.Dataset":
        return sigged.map_batches(
            lambda b, s=split_name: b.filter(pc.equal(b.column("split"), s)),
            batch_format="pyarrow",
        )

    train = part("train")
    eval_ds = part("eval")
    test = part("test")

    train_sigs = _collect_sigs(train)
    train_ref = ray.put(train_sigs)

    def anti(batch: pa.Table, refs) -> pa.Table:
        banned = set()
        for r in refs:
            banned |= ray.get(r) if isinstance(r, ray.ObjectRef) else r
        mask = [s not in banned for s in batch.column("sig").to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    eval_f = eval_ds.map_batches(
        lambda b: anti(b, [train_ref]), batch_format="pyarrow"
    )
    # eval sigs AFTER filtering (reference: augmentors.py:71 builds eval sigs
    # from the filtered eval set)
    eval_sigs = _collect_sigs(eval_f)
    eval_ref = ray.put(eval_sigs)
    test_f = test.map_batches(
        lambda b: anti(b, [train_ref, eval_ref]), batch_format="pyarrow"
    )

    drop = ["sig"]
    return {
        "train": train.drop_columns(drop),
        "eval": eval_f.drop_columns(drop),
        "test": test_f.drop_columns(drop),
    }
