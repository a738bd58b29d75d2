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
    learn_bpe,
    build_vocab,
    word_counts,
)
from calendar_event_entity_extraction_ray.stages.lmfilter import hash_strs

BpeModel = namedtuple(
    "BpeModel",
    ["merges", "vocab", "total_tokens", "kept_tokens", "word_enc"])


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
            batch_format="pyarrow", batch_size=None):
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
    from calendar_event_entity_extraction_ray.functions.bpe import (
        encode_word,
    )

    capped, total = word_histogram_capped(ds, text_col, top_k)
    merges = learn_bpe(capped, n_merges)
    vocab = build_vocab(capped, merges)
    kept = sum(capped.values())
    # pre-encode the capped vocabulary ONCE (top_k encode_word calls on
    # the driver) — bpe_tokenize broadcasts this table so workers only
    # encode the rare OOV tail, never re-encode the head per batch
    # (the per-batch distinct-word cache alone still re-ran encode_word
    # per word type per BLOCK: 96 blocks x ~25k types dominated the
    # 200k-doc scale check at 16.8 s; the table cut encode to 4.5 s)
    ranks = {p: i for i, p in enumerate(merges)}
    word_enc = {}
    for w in capped:
        toks = encode_word(w, ranks)
        word_enc[w] = (len(toks), " ".join(toks))
    return BpeModel(tuple(merges), tuple(vocab), total, kept, word_enc)


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
    enc_ref = ray.put(model.word_enc)

    def enc(b: pa.Table) -> pa.Table:
        # batch-level distinct-word encode: encode_word runs once per
        # word TYPE in the batch (np.unique), per-doc token counts are a
        # reduceat over the inverse index, and the fingerprint joins the
        # per-word token STRINGS (each word's tokens joined by ' ', words
        # joined by ' ' == the flat token join — tokens are space-free).
        # Identical outputs to the per-doc encode_text mirror by
        # construction; measured 2.4x on the 200k-doc scale check.
        from calendar_event_entity_extraction_ray.functions.bpe import (
            encode_word,
            pretokenize,
        )

        ranks = ray.get(ranks_ref)  # worker-cached; n_merges entries
        head = ray.get(enc_ref)     # pre-encoded capped vocabulary
        words_all: list = []
        lens = np.zeros(b.num_rows, dtype=np.int64)
        for i, txt in enumerate(b.column(text_col).to_pylist()):
            ws = pretokenize(txt)
            lens[i] = len(ws)
            words_all.extend(ws)
        n_toks = np.zeros(b.num_rows, dtype=np.int64)
        if words_all:
            uw, inv = np.unique(np.asarray(words_all, dtype=object),
                                return_inverse=True)
            enc_n = np.zeros(len(uw), dtype=np.int64)
            enc_s = np.empty(len(uw), dtype=object)
            for j, w in enumerate(uw):
                hit = head.get(w)
                if hit is None:  # OOV tail only
                    toks = encode_word(w, ranks)
                    hit = (len(toks), " ".join(toks))
                enc_n[j] = hit[0]
                enc_s[j] = hit[1]
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            nz = lens > 0
            n_toks[nz] = np.add.reduceat(enc_n[inv], starts[nz])
            word_strs = enc_s[inv]
            bounds = np.concatenate([[0], np.cumsum(lens)])
            joined = [" ".join(word_strs[bounds[i]:bounds[i + 1]])
                      for i in range(b.num_rows)]
        else:
            joined = [""] * b.num_rows
        fp = hash_strs(joined).view(np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "tokens_fp": pa.array(fp, pa.int64()),
        })

    return docs.map_batches(enc, batch_format="pyarrow", batch_size=None)
