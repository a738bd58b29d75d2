"""Distributed unigram-LM (SentencePiece-style) tokenizer training +
trained-tokenizer encode stage — the Kudo-2018 sibling of the BPE
trainer (stages/bpetrain.py), sharing its scale split exactly:

  - WORD HISTOGRAM (corpus-sized): the SAME ``word_histogram_capped``
    exchange the BPE trainer uses — per-batch word-type partials,
    one exact grouped reduce, partition-independent top-K cap.
  - SEED + EM + PRUNE (vocabulary-sized): pure driver-side kernels
    (functions/unigram.py:em_train) over the bounded word-TYPE table,
    shared verbatim with the single-process golden mirror.
  - ENCODE (corpus-sized): one ``ray.put`` of the piece table + the
    pre-encoded capped vocabulary (head words Viterbi-decoded ONCE on
    the driver); workers segment only the rare OOV word tail. Outputs
    are exact ints (piece count + siphash fingerprint of the piece
    stream) so the golden oracle compares bit-identically.
"""

from __future__ import annotations

from collections import namedtuple
from typing import Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from calendar_event_entity_extraction_ray.functions.unigram import (
    em_train,
    viterbi_pieces,
)
from calendar_event_entity_extraction_ray.stages.bpetrain import (
    word_histogram_capped,
)
from calendar_event_entity_extraction_ray.stages.lmfilter import hash_strs

UnigramModel = namedtuple(
    "UnigramModel",
    ["logp", "unk_logp", "max_piece_len", "total_tokens", "kept_tokens",
     "word_enc"])


def train_unigram(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    vocab_size: int = 2_000,
    top_k: int = 20_000,
    max_piece_len: int = 6,
    max_seed: int = 8_000,
) -> UnigramModel:
    """Distributed histogram -> shared cap -> driver Viterbi-EM loop.
    Bit-identical to the single-process mirror because the exact count
    + shared cap rule hand both sides the same word-type table and
    everything after is the same pure kernel."""
    capped, total = word_histogram_capped(ds, text_col, top_k)
    logp, unk_logp = em_train(capped, vocab_size=vocab_size,
                              max_piece_len=max_piece_len,
                              max_seed=max_seed)
    word_enc = {}
    for w in capped:
        ps = viterbi_pieces(w, logp, max_piece_len, unk_logp)
        word_enc[w] = (len(ps), " ".join(ps))
    return UnigramModel(logp, unk_logp, max_piece_len, total,
                        sum(capped.values()), word_enc)


def unigram_tokenize(
    docs: "ray.data.Dataset",
    model: UnigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Segment every doc with the trained pieces: (id, n_pieces,
    pieces_fp) where pieces_fp is the process-stable int64 siphash of
    the space-joined piece stream. NULL/empty texts emit n_pieces=0
    with the empty-stream hash. Batch-level distinct-word decode (the
    bpe_tokenize pattern): Viterbi runs once per OOV word TYPE per
    batch; head words come pre-encoded from the driver table."""
    logp_ref = ray.put((model.logp, model.unk_logp, model.max_piece_len))
    enc_ref = ray.put(model.word_enc)

    def enc(b: pa.Table) -> pa.Table:
        from calendar_event_entity_extraction_ray.functions.unigram import (
            pretokenize,
        )

        logp, unk_logp, mpl = ray.get(logp_ref)
        head = ray.get(enc_ref)
        words_all: list = []
        lens = np.zeros(b.num_rows, dtype=np.int64)
        for i, txt in enumerate(b.column(text_col).to_pylist()):
            ws = pretokenize(txt)
            lens[i] = len(ws)
            words_all.extend(ws)
        n_pieces = np.zeros(b.num_rows, dtype=np.int64)
        if words_all:
            uw, inv = np.unique(np.asarray(words_all, dtype=object),
                                return_inverse=True)
            enc_n = np.zeros(len(uw), dtype=np.int64)
            enc_s = np.empty(len(uw), dtype=object)
            for j, w in enumerate(uw):
                hit = head.get(w)
                if hit is None:  # OOV tail only
                    ps = viterbi_pieces(w, logp, mpl, unk_logp)
                    hit = (len(ps), " ".join(ps))
                enc_n[j] = hit[0]
                enc_s[j] = hit[1]
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            nz = lens > 0
            n_pieces[nz] = np.add.reduceat(enc_n[inv], starts[nz])
            word_strs = enc_s[inv]
            bounds = np.concatenate([[0], np.cumsum(lens)])
            joined = [" ".join(word_strs[bounds[i]:bounds[i + 1]])
                      for i in range(b.num_rows)]
        else:
            joined = [""] * b.num_rows
        fp = hash_strs(joined).view(np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "n_pieces": pa.array(n_pieces, pa.int64()),
            "pieces_fp": pa.array(fp, pa.int64()),
        })

    return docs.map_batches(enc, batch_format="pyarrow", batch_size=None)


def vocab_table(model: UnigramModel) -> pa.Table:
    """The trained vocabulary as an oracle-comparable table:
    (piece, logp_e6) sorted by (piece). logp publishes floor-scaled —
    the float chain is single-process on both sides, so the scaled int
    is identical."""
    pieces = sorted(model.logp)
    lp = np.array([model.logp[p] for p in pieces], dtype=np.float64)
    return pa.table({
        "piece": pa.array(pieces, pa.string()),
        "logp_e6": pa.array(np.floor(lp * 1e6 + 0.5).astype(np.int64),
                            pa.int64()),
    })
