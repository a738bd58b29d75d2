"""Text-analysis operators over a documents table: token counting, quality
scoring, language-ID, fingerprinting.

Vectorized pandas/pyarrow kernels inside ``map_batches``. The token/quality
kernels use explicit regex definitions (not Python ``str`` semantics) so the
same computation is expressible as the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` — names and formulas must stay in sync with
those SQL strings.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from calendar_event_entity_extraction_ray.functions.textstats import (
    detect_lang,
    rolling_fingerprint,
)

_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_count_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """whitespace tokens + BPE-ish tokens per doc (vectorized str ops)."""
    s = batch[text_col].fillna("")
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["n_tokens_ws"] = s.str.strip().str.split().str.len().fillna(0).astype("int64")
    out["n_tokens_bpe"] = s.str.count(_BPE_PATTERN).astype("int64")
    return out


def quality_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality features; formulas mirror the oracle SQL exactly."""
    s = batch[text_col].fillna("")
    n = s.str.len().astype("float64")
    alpha = s.str.count(r"[A-Za-z]").astype("float64")
    digit = s.str.count(r"[0-9]").astype("float64")
    punct = s.str.count(r"[^A-Za-z0-9\s]").astype("float64")
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["n_chars"] = n.astype("int64")
    out["alpha_ratio"] = (alpha / n).where(n > 0, 0.0)
    out["digit_ratio"] = (digit / n).where(n > 0, 0.0)
    out["punct_ratio"] = (punct / n).where(n > 0, 0.0)
    return out


def langid_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["pred_lang"] = batch[text_col].map(detect_lang)
    return out


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["fingerprint"] = batch[text_col].map(rolling_fingerprint)
    return out


def repetition_batch(batch: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher-style INTRA-document repetition signals per doc: the count of
    the most frequent word bigram, total bigrams, and distinct bigrams —
    exact integers (the fractions top/total and 1 - distinct/total are left
    to the reader, like grouped_regression's moments, so the oracle compare
    is bit-exact). Tokens are ``text.split(' ')`` with empties kept ==
    DuckDB ``string_split(text, ' ')``; docs with < 2 tokens emit no row
    (the SQL's ``len(ws) >= 2`` guard). Pure per-batch map — corpus-scale
    safe, nothing shuffles."""
    from collections import Counter

    ids, tops, tots, dists = [], [], [], []
    for i, txt in zip(batch[id_col], batch[text_col]):
        if not isinstance(txt, str):
            continue
        ws = txt.split(" ")
        if len(ws) < 2:
            continue
        c = Counter(zip(ws, ws[1:]))
        ids.append(i)
        tops.append(max(c.values()))
        tots.append(len(ws) - 1)
        dists.append(len(c))
    return pd.DataFrame({
        id_col: pd.Series(ids, dtype="int64"),
        "top_bigram_n": pd.Series(tops, dtype="int64"),
        "n_bigrams": pd.Series(tots, dtype="int64"),
        "n_distinct_bigrams": pd.Series(dists, dtype="int64"),
    })


def term_document_frequency(
    ds: "ray.data.Dataset", text_col: str = "text", top_n: int = 50
) -> "ray.data.Dataset":
    """Corpus vocabulary by document frequency (the df side of TF-IDF):
    per-doc DISTINCT space-split terms explode to rows, then the salted
    two-phase grouped count — the shuffle moves per-batch (term, partial)
    rows bounded by the batch vocabulary, not one row per occurrence.
    Returns the top ``top_n`` terms by (df DESC, term ASC). Tokenization
    is exactly ``str.split(' ')`` (empty tokens kept) so a DuckDB
    ``string_split`` oracle reproduces it byte-for-byte."""
    import pyarrow as pa

    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_count,
    )

    def explode_distinct(b: pa.Table) -> pa.Table:
        words: list = []
        for t in b.column(text_col).to_pylist():
            if t is None:
                continue
            words.extend(set(t.split(" ")))
        return pa.table({"term": pa.array(words, pa.string())})

    ex = ds.map_batches(explode_distinct, batch_format="pyarrow")
    counts = grouped_count(ex, "term", out_col="df")
    return counts.sort(["df", "term"], descending=[True, False]).limit(top_n)


def inverted_index(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 1000,
) -> "ray.data.Dataset":
    """Build an inverted index: one row per term with its exact document
    frequency and the first ``max_postings`` doc ids ascending
    (comma-joined). Tokenization is exactly ``str.split(" ")`` (empty
    tokens kept, NULL text skipped) — the DuckDB ``string_split`` +
    ``list(doc_id ORDER BY doc_id)`` oracle reproduces it byte-for-byte.

    Scale shape: the per-batch partial groups (term, partial-df, the
    batch's ``max_postings`` SMALLEST ids) — a valid partial top-k, so
    the exchange moves at most batch-vocabulary x cap rows, never one
    row per posting occurrence; the term-keyed fold merges partials per
    term. The cap is the standard posting-list valve (uncapped stopword
    lists ARE the corpus at web scale); df stays exact regardless."""
    import numpy as np

    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    def partial(b: pa.Table) -> pa.Table:
        ids: list = []
        terms: list = []
        for i, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            if t is None:
                continue
            for w in set(t.split(" ")):
                ids.append(i)
                terms.append(w)
        df = pd.DataFrame({"term": terms, "_id": ids})
        g = df.groupby("term", dropna=False)["_id"].agg(
            n="size", ids=lambda s: sorted(s)[:max_postings])
        out = pa.Table.from_pandas(g.reset_index(), preserve_index=False)
        return add_hash_column(out, ["term"], "part_key")

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("term", dropna=False).agg(
            df=("n", "sum"),
            ids=("ids", lambda s: sorted(
                np.concatenate(list(s)).tolist())[:max_postings]))
        g = g.reset_index()
        postings = [",".join(str(i) for i in lst) for lst in g["ids"]]
        return pa.table({
            "term": pa.array(g["term"], pa.string()),
            "df": pa.array(g["df"].astype("int64")),
            "postings": pa.array(postings, pa.string()),
        })

    ex = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_map(ex, "part_key", fold)
