"""Corpus-cleanup pipeline: the canonical training-data preparation chain
composed from the engine's operators —

    documents (doc_id, text, lang?)
      quality filter      vectorized pandas str kernels (same formulas as
                          the quality_scores oracle SQL)
      language filter     n-gram heuristic langid (functions/textstats.py)
      exact dedup         content-hash exchange, first-wins by doc_id
      near-dup drop       MinHash-LSH banding + candidate-only verify
      write               hash-partitioned Parquet + manifest (resumable)

Every stage is the already-oracle-checked operator; this module only
composes them (and is itself checked end-to-end by the ``corpus_clean``
query against a sequential mirror golden).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

import ray.data


def quality_filter_batch(
    batch: pd.DataFrame,
    text_col: str = "text",
    min_chars: int = 50,
    min_alpha_ppm: int = 500_000,
    max_digit_ppm: int = 300_000,
) -> pd.DataFrame:
    """Keep rows passing the quality thresholds (ppm formulas identical to
    the ``quality_scores`` oracle SQL — integer arithmetic, no float
    drift)."""
    s = batch[text_col].fillna("")
    n = s.str.len().astype("int64")
    nz = n.where(n > 0, 1)
    alpha_ppm = (s.str.count(r"[A-Za-z]").astype("int64") * 1_000_000) // nz
    digit_ppm = (s.str.count(r"[0-9]").astype("int64") * 1_000_000) // nz
    keep = (n >= min_chars) & (alpha_ppm >= min_alpha_ppm) & (
        digit_ppm <= max_digit_ppm)
    return batch[keep]


def langid_filter_batch(
    batch: pd.DataFrame, text_col: str = "text", keep_lang: str = "en"
) -> pd.DataFrame:
    from calendar_event_entity_extraction_ray.functions.textstats import (
        detect_lang,
    )

    pred = batch[text_col].map(detect_lang)
    return batch[pred == keep_lang]


def corpus_clean(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_threshold: float = 0.8,
    min_chars: int = 50,
    keep_lang: str = "en",
) -> "ray.data.Dataset":
    """documents -> surviving (id, text) rows after the full cleanup chain.

    The near-dup drop id set is small (proportional to the dup rate), so it
    broadcasts as an anti-join filter — no second shuffle."""
    import ray

    from calendar_event_entity_extraction_ray.stages.dedup import (
        exact_dedup,
        minhash_lsh_dup_ids,
    )

    filtered = docs.map_batches(
        lambda b: langid_filter_batch(
            quality_filter_batch(b, text_col, min_chars=min_chars),
            text_col, keep_lang=keep_lang),
        batch_format="pandas",
    )
    unique = exact_dedup(filtered, [text_col], id_col)

    drop_ids = set()
    for b in minhash_lsh_dup_ids(
            unique, text_col, id_col,
            threshold=minhash_threshold).iter_batches(batch_format="pyarrow"):
        drop_ids.update(b.column(id_col).to_pylist())
    drop_ref = ray.put(drop_ids)

    def anti(b: pa.Table) -> pa.Table:
        banned = ray.get(drop_ref)
        return b.filter(pa.array(
            [i not in banned for i in b.column(id_col).to_pylist()],
            pa.bool_()))

    return unique.map_batches(anti, batch_format="pyarrow")


def write_corpus(
    cleaned: "ray.data.Dataset",
    out_dir: str,
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> None:
    """Resumable partitioned Parquet: one directory per id-hash partition
    (never one giant file)."""
    import numpy as np

    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )

    def part(b: pa.Table) -> pa.Table:
        b = add_hash_column(b, [id_col], out_col="_h")
        key = pa.array(
            (b.column("_h").to_numpy() % num_partitions).astype(np.int64))
        return b.drop_columns(["_h"]).append_column("part_key", key)

    cleaned.map_batches(part, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part_key"])
