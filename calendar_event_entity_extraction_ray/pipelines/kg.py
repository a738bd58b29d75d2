"""Flagship pipeline: Common-Crawl-style pages -> knowledge-graph triples.

    pages (url, warc_ts, html, text, lang)
      S1 html->text      stateless map_batches, zero-copy Arrow; drop html
      lang filter        vectorized predicate
      S2 event extract   actor pool (compiled grammar + memoized dateutil)
      S3 triple emit     stateless explosion -> (subj, pred, obj, kind, url)
      S4 entity link     actor pool, broadcast alias dict + LSH fuzzy
      S5 dedup           per-batch exact (subj,pred,obj) distinct (see
                         stages/dedup.py for why no shuffle is needed)
      S6 materialize     partition by hash(subj) % P -> per-partition
                         Parquet + manifest (resumable)

The pipeline is lazy end-to-end; nothing materializes except the final sink
or the small aggregates. ``num_cpus``/``concurrency`` are sized so the
extractor pool does not starve S1/S6 (extract dominates compute).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray
import ray.data

from calendar_event_entity_extraction_ray.functions.linking import default_alias_rows
from calendar_event_entity_extraction_ray.sources.pages import pages_table
from calendar_event_entity_extraction_ray.stages.dedup import dedup_triples_batch
from calendar_event_entity_extraction_ray.stages.emit_triples import emit_triples_batch
from calendar_event_entity_extraction_ray.stages.extract_events import ExtractEvents
from calendar_event_entity_extraction_ray.stages.html_to_text import (
    filter_lang,
    html_to_text_batch,
)
from calendar_event_entity_extraction_ray.stages.link_entities import LinkEntities


def synth_pages_dataset(
    n_pages: int, seed: int = 42, override_num_blocks: Optional[int] = None
) -> "ray.data.Dataset":
    """Distributed deterministic page generation over ray.data.range(n):
    each block renders its own page indices — the generator itself scales."""
    ds = ray.data.range(n_pages, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return pages_table(batch.column("id").to_pylist(), seed=seed)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=512)


def extract_stage(
    pages: "ray.data.Dataset",
    extract_concurrency: int | tuple = (1, 8),
    batch_size: int = 512,
) -> "ray.data.Dataset":
    """S1 + lang filter + S2: pages -> events dataset."""
    texted = pages.map_batches(html_to_text_batch, batch_format="pyarrow")
    en = texted.map_batches(filter_lang, batch_format="pyarrow")
    return en.map_batches(
        ExtractEvents,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=extract_concurrency,
        num_cpus=1,
    )


def kg_triples(
    pages: "ray.data.Dataset",
    alias_rows: Optional[list] = None,
    extract_concurrency: int | tuple = (1, 8),
    link_concurrency: int | tuple = (1, 4),
    batch_size: int = 512,
) -> "ray.data.Dataset":
    # Pool minimums are 1 so the actor pools can never reserve every CPU of a
    # small cluster and starve the stateless task stages (read / dedup /
    # sort / write); the autoscaler grows the pools when CPUs are free.
    """pages -> linked, deduped triples Dataset (lazy)."""
    events = extract_stage(pages, extract_concurrency, batch_size)
    triples = events.map_batches(emit_triples_batch, batch_format="pyarrow")
    alias_ref = ray.put(alias_rows if alias_rows is not None else default_alias_rows())
    linked = triples.map_batches(
        LinkEntities,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=link_concurrency,
        num_cpus=1,
    )
    return linked.map_batches(dedup_triples_batch, batch_format="pyarrow")


def materialize_graph(
    triples: "ray.data.Dataset",
    out_dir: str,
    fingerprint: str,
    num_partitions: int = 16,
) -> dict:
    """S6: partition by hash(subj) % P, write per-partition Parquet with a
    manifest; partitions already present for this fingerprint are skipped
    (resume). Returns the manifest dict."""
    import pyarrow.compute as pc

    from calendar_event_entity_extraction_ray.state import manifest as M
    from calendar_event_entity_extraction_ray.stages.dedup import add_hash_column

    done = M.completed_partitions(out_dir, fingerprint)

    def add_part_key(b: pa.Table) -> pa.Table:
        import numpy as np

        b = add_hash_column(b, ["subj"], out_col="_h")
        part = pa.array(
            (b.column("_h").to_numpy() % num_partitions).astype(np.int32)
        )
        return b.drop_columns(["_h"]).append_column("part_key", part)

    keyed = triples.map_batches(add_part_key, batch_format="pyarrow")
    if done:
        keyed = keyed.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("part_key"),
                                   value_set=pa.array(sorted(done), pa.int32())))
            ),
            batch_format="pyarrow",
        )

    import pandas as pd

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"part_id": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype="int64")})
        part_id = int(g["part_key"].iloc[0])
        t = pa.Table.from_pandas(g.drop(columns=["part_key"]), preserve_index=False)
        t = t.sort_by([("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")])
        M.write_partition(out_dir, part_id, t, fingerprint,
                          lineage={"rows_out": t.num_rows})
        return pd.DataFrame({"part_id": [part_id], "rows": [t.num_rows]})

    # groupby(part_key) is the single all-to-all of the materialize; the key
    # is a uniform hash so partitions are balanced regardless of hub skew.
    keyed.groupby("part_key").map_groups(write_group, batch_format="pandas").materialize()
    return M.load_manifest(out_dir)
