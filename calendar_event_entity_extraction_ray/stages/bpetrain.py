"""Distributed BPE tokenizer training + trained-tokenizer encode stage.

The scale split (functions/bpe.py has the shared pure kernels):

  - WORD HISTOGRAM (corpus-sized work): per-batch ``Counter`` partials
    collapse each batch to its distinct word types before the exchange
    (Zipf: a hot word ships one row per batch), then ONE exact
    ``grouped_sums`` reduce — the lmfilter gram-count plan, but the
    merge loop needs the word STRINGS, so the exchange carries the
    (word, n) rows themselves (web-vocabulary cardinality, the same
    contract as the entity-pool / term-DF ops).
  - TOP-K CAP (bounded): after the grouped reduce every word type lives
    in exactly one partition, so per-partition (count DESC, word ASC)
    top-K partials are a superset of the global top-K; the driver folds
    K x partitions rows and re-applies the SAME ``cap_word_counts``
    rule, making the cap partition-independent. Each partial also emits
    its token-mass subtotal so the coverage fraction costs no second
    pass over the histogram.
  - MERGE LOOP (vocabulary-sized): pure driver-side kernel
    (``learn_bpe``) over the capped histogram — the HF-trainer
    decomposition; at open-web scale the cap IS the knob (30k types
    cover >99% of token mass on natural text; the skipped tail is
    reported, never silently dropped).
  - ENCODE (corpus-sized): one ``ray.put`` of the merge-rank dict
    (n_merges entries — genuinely small, unlike the hashed-numpy rule
    for corpus-derived tables), a per-batch word-type cache, and
    int64 outputs (token count + siphash fingerprint of the token
    stream) so the golden oracle compares exactly.
"""

from __future__ import annotations

from collections import namedtuple
from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from calendar_event_entity_extraction_ray.functions.bpe import (
    cap_word_counts,
    encode_text,
    learn_bpe,
    build_vocab,
    word_counts,
)
from calendar_event_entity_extraction_ray.stages.lmfilter import hash_strs

BpeModel = namedtuple(
    "BpeModel", ["merges", "vocab", "total_tokens", "kept_tokens"])


def word_histogram_capped(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    top_k: int = 20_000,
) -> Tuple[Dict[str, int], int]:
    """Exact distributed word-type counts, capped to ``top_k`` by the
    shared (count DESC, word ASC) rule. Returns (capped counts, total
    token mass before the cap)."""
    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )

    def partial(b: pa.Table) -> pa.Table:
        cnt = word_counts(b.column(text_col).to_pylist())
        return pa.table({
            "word": pa.array(list(cnt.keys()), pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    hist = grouped_sums(partials, ["word"], ["n"], count_alias="_nb")

    def topk_partial(t: pa.Table) -> pa.Table:
        # one pass per histogram partition: its top-K candidates plus a
        # mass subtotal row (is_total=True) — no second pass, no
        # re-execution of the lazy exchange fold
        df = t.select(["word", "n"]).to_pandas()
        subtotal = int(df["n"].sum())
        top = df.sort_values(["n", "word"],
                             ascending=[False, True]).head(top_k)
        return pa.table({
            "word": pa.array(list(top["word"]) + [""], pa.string()),
            "n": pa.array(list(top["n"]) + [subtotal], pa.int64()),
            "is_total": pa.array([False] * len(top) + [True], pa.bool_()),
        })

    total = 0
    cand: Dict[str, int] = {}
    for b in hist.map_batches(topk_partial, batch_format="pyarrow",
                              batch_size=None).iter_batches(
            batch_format="pyarrow"):
        mask = b.column("is_total").to_numpy(zero_copy_only=False)
        ws = b.column("word").to_pylist()
        ns = b.column("n").to_pylist()
        for w, n, is_t in zip(ws, ns, mask):
            if is_t:
                total += n
            else:
                cand[w] = cand.get(w, 0) + n
    return cap_word_counts(cand, top_k), total


def train_bpe(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_merges: int = 200,
    top_k: int = 20_000,
) -> BpeModel:
    """Distributed histogram -> shared cap -> driver merge loop. The
    result is bit-identical to the single-process mirror
    (scripts/make_goldens.py) because the exact count + shared cap rule
    produce the same capped dict on both sides."""
    capped, total = word_histogram_capped(ds, text_col, top_k)
    merges = learn_bpe(capped, n_merges)
    vocab = build_vocab(capped, merges)
    kept = sum(capped.values())
    return BpeModel(tuple(merges), tuple(vocab), total, kept)


def bpe_tokenize(
    docs: "ray.data.Dataset",
    model: BpeModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Encode every doc with the trained merges: (id, n_tokens,
    tokens_fp) where tokens_fp is the process-stable int64 siphash of
    the space-joined token stream (tokens never contain whitespace —
    the pre-tokenizer can't emit it — so the join is unambiguous).
    NULL/empty texts emit n_tokens=0 with the empty-stream hash."""
    ranks_ref = ray.put({p: i for i, p in enumerate(model.merges)})

    def enc(b: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)  # worker-cached; n_merges entries
        cache: Dict[str, tuple] = {}
        ids = b.column(id_col).to_pylist()
        joined = []
        n_toks = np.zeros(len(ids), dtype=np.int64)
        for i, txt in enumerate(b.column(text_col).to_pylist()):
            toks = encode_text(txt, ranks, cache)
            n_toks[i] = len(toks)
            joined.append(" ".join(toks))
        fp = hash_strs(joined).view(np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "tokens_fp": pa.array(fp, pa.int64()),
        })

    return docs.map_batches(enc, batch_format="pyarrow", batch_size=None)
