"""Repeated-span removal — the remediation half of "Deduplicating
Training Data Makes Language Models Better" (Lee et al.): strip every
token window whose word n-gram occurs in >= 2 DISTINCT documents, so
boilerplate and cross-document copies never reach the trainer.

Semantics (pinned by the SQL oracle):
  - token rule = split(' ') (DuckDB string_split parity);
  - a start position p of doc d is HIT when the n-gram at p has
    per-doc-distinct document frequency >= 2 across the corpus;
  - token j of doc d is covered when j ∈ [p, p+n) for any hit p;
  - output = surviving tokens joined by ' ', one row per doc with >= 1
    surviving token (fully-covered docs drop — SQL GROUP BY emits no
    group for zero rows); docs shorter than n tokens have no grams and
    survive whole.

Two exchanges, nothing driver-side grows with the corpus:
  1. gram-hash exchange over (doc_id, pos, gram): each fold counts
     distinct docs per gram IN ITS PARTITION (equal grams co-locate, so
     the partition count IS the global count) and emits the hit
     positions of grams with df >= 2;
  2. doc_id-hash exchange unioning docs with their hit positions: each
     fold rebuilds the surviving text per doc vectorized over numpy
     coverage masks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data


def remove_repeated_spans(
    docs: "ray.data.Dataset",
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    num_partitions: Optional[int] = None,
    out_col: str = "clean_text",
) -> "ray.data.Dataset":
    """(doc_id, clean_text) rows after repeated-span removal."""
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    def explode_pos(b: pa.Table) -> pa.Table:
        ids, poss, grams = [], [], []
        for did, txt in zip(b.column(doc_id_col).to_pylist(),
                            b.column(text_col).to_pylist()):
            if txt is None:
                continue
            toks = txt.split(" ")
            for i in range(len(toks) - n + 1):
                ids.append(did)
                poss.append(i)
                grams.append(" ".join(toks[i:i + n]))
        t = pa.table({
            doc_id_col: pa.array(ids, b.schema.field(doc_id_col).type),
            "pos": pa.array(poss, pa.int64()),
            "gram": pa.array(grams, pa.string()),
        })
        return add_hash_column(t, ["gram"], out_col="_gh")

    def df_fold(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_gh"]).to_pandas()
        per_doc = df.drop_duplicates(["gram", doc_id_col])
        counts = per_doc.groupby("gram", sort=False)[doc_id_col].size()
        rep = counts[counts >= 2].index
        hits = df[df["gram"].isin(rep)][[doc_id_col, "pos"]]
        return pa.Table.from_pandas(hits, preserve_index=False)

    hits = hash_partition_map(
        docs.map_batches(explode_pos, batch_format="pyarrow"),
        "_gh", df_fold, num_partitions=num_partitions)

    def tag_docs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_valid(b.column(text_col)))
        t = pa.table({
            doc_id_col: b.column(doc_id_col),
            "pos": pa.nulls(b.num_rows, pa.int64()),
            text_col: b.column(text_col),
        })
        return add_hash_column(t, [doc_id_col], out_col="_dh")

    def tag_hits(b: pa.Table) -> pa.Table:
        t = pa.table({
            doc_id_col: b.column(doc_id_col),
            "pos": b.column("pos"),
            text_col: pa.nulls(b.num_rows, pa.string()),
        })
        return add_hash_column(t, [doc_id_col], out_col="_dh")

    both = (docs.map_batches(tag_docs, batch_format="pyarrow")
            .union(hits.map_batches(tag_hits, batch_format="pyarrow")))

    def apply_fold(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_dh"]).to_pandas()
        doc_rows = df[df[text_col].notna()]
        hit_pos: dict = {}
        for did, p in zip(df.loc[df[text_col].isna(), doc_id_col],
                          df.loc[df[text_col].isna(), "pos"]):
            hit_pos.setdefault(did, []).append(int(p))
        out_ids, out_texts = [], []
        for did, txt in zip(doc_rows[doc_id_col], doc_rows[text_col]):
            toks = txt.split(" ")
            ps = hit_pos.get(did)
            if ps:
                covered = np.zeros(len(toks), dtype=bool)
                for p in ps:
                    covered[p:p + n] = True
                toks = [w for w, c in zip(toks, covered) if not c]
            if toks:
                out_ids.append(did)
                out_texts.append(" ".join(toks))
        return pa.table({
            doc_id_col: pa.array(out_ids,
                                 t.schema.field(doc_id_col).type),
            out_col: pa.array(out_texts, pa.string()),
        })

    return hash_partition_map(both, "_dh", apply_fold,
                              num_partitions=num_partitions)
