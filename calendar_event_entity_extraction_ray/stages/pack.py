"""Greedy sequence packing for LLM pretraining batches.

Pack documents into fixed token-capacity "bins" (training sequences built
by concatenation) with the deterministic first-fit rule real packers use:
walk docs in doc_id order, keep a running token count, and start a new
bin when the next doc would overflow ``capacity`` (an oversized doc gets
a bin of its own).

A single global walk is inherently serial, so the operator buckets the
id space first — ``bucket = doc_id // bucket_size`` — and packs each
bucket independently: bins never cross bucket boundaries, so the result
is a pure function of (doc contents, capacity, bucket_size), independent
of partitioning or execution order, and buckets pack in parallel on the
exchange. This is the trade every distributed packer makes (per-shard
packing); the waste is at most one underfull bin per bucket.

Tokens = ``len(text.split(' '))`` (DuckDB string_split parity); NULL text
rows are dropped (match the oracle's WHERE text IS NOT NULL). The
per-bucket walk is a Python loop — running-sum-with-reset is sequential
by definition — bounded by bucket_size rows; parallelism comes from the
bucket fan-out, not the inner loop.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def pack_first_fit(
    ds: "ray.data.Dataset",
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 256,
    bucket_size: int = 32,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """(doc_id, bucket, bin, ntok): the bin assignment per document."""
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    def prep(b: pa.Table) -> pa.Table:
        ids, ntoks = [], []
        for did, txt in zip(b.column(doc_id_col).to_pylist(),
                            b.column(text_col).to_pylist()):
            if txt is None:
                continue
            ids.append(did)
            ntoks.append(len(txt.split(" ")))
        t = pa.table({
            doc_id_col: pa.array(ids, pa.int64()),
            "bucket": pa.array([i // bucket_size for i in ids], pa.int64()),
            "ntok": pa.array(ntoks, pa.int64()),
        })
        return add_hash_column(t, ["bucket"], out_col="_bh")

    def fold(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_bh"]).to_pandas().sort_values(
            ["bucket", doc_id_col], kind="mergesort").reset_index(drop=True)
        bins = []
        cur_bucket, acc, binno = None, 0, 0
        for bk, ntok in zip(df["bucket"], df["ntok"]):
            if bk != cur_bucket:
                cur_bucket, acc, binno = bk, 0, 0
            elif acc + ntok > capacity:
                binno += 1
                acc = 0
            acc += ntok
            bins.append(binno)
        df["bin"] = pd.Series(bins, dtype="int64")
        return pa.Table.from_pandas(
            df[[doc_id_col, "bucket", "bin", "ntok"]], preserve_index=False)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return hash_partition_map(prepped, "_bh", fold,
                              num_partitions=num_partitions)
