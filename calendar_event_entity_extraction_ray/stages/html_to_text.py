"""S1: html -> text, stateless zero-copy Arrow stage.

Byte-identical per url to the frozen extraction rule in
``functions/htmltext.py`` (the engine's per-row invariant, BASELINE.md).
The wide binary ``html`` column is dropped in the SAME stage so no
downstream exchange ever moves page bytes (SURVEY.md §7.3 hard part (d)).
"""

from __future__ import annotations

import pyarrow as pa

from calendar_event_entity_extraction_ray.functions.htmltext import html_to_text


def html_to_text_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, lang, ...) -> (url, warc_ts, text, lang).

    Recomputes ``text`` from ``html`` unconditionally (the input ``text``
    column, when present, is a golden fixture value — the pipeline must
    produce its own) and drops ``html`` immediately.
    """
    htmls = batch.column("html")
    texts = pa.array(
        [html_to_text(h) for h in htmls.to_pylist()],
        type=pa.string(),
    )
    keep = [n for n in batch.column_names if n not in ("html", "text")]
    out = batch.select(keep)
    return out.append_column("text", texts)


def filter_lang(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Language filter — vectorized predicate inside map_batches."""
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch.column("lang"), lang))
