"""End-to-end training-data preparation: the composed LLM-pretraining
chain built from the engine's oracle-checked operators —

    documents (doc_id, text)
      split          train/eval by md5(str(doc_id)) bucket (7500/9000) —
                     id-based, so duplicate TEXTS can cross splits (the
                     realistic contamination channel)
      clean          pipelines/corpus.py:corpus_clean on the train side
                     (quality -> langid -> exact dedup -> near-dup drop)
      decontaminate  stages/decontam.py vs the RAW eval side (benchmarks
                     are never cleaned), dropping contaminated train docs
      pack           stages/pack.py first-fit into token-capacity bins
      emit           one row per (bucket, bin): docs concatenated in
                     doc_id order -> the packed training sequence

Every stage is individually oracle-checked; this module only composes
them, and the composition is itself golden-checked end-to-end by the
``training_sequences`` query against a sequential single-process mirror
(scripts/make_goldens.py).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def split_by_id_batch(b: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """train/eval/test split on md5(str(id)) — oracle-parity bucket rule
    (same 7500/9000 thresholds as the text-hash split)."""
    from calendar_event_entity_extraction_ray.functions.textsig import (
        stable_bucket,
    )

    splits = []
    for did in b.column(id_col).to_pylist():
        bk = stable_bucket(str(did), 10000)
        splits.append("train" if bk < 7500
                      else ("eval" if bk < 9000 else "test"))
    return b.append_column("split", pa.array(splits, pa.string()))


def training_sequences(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 4,
    capacity: int = 256,
    bucket_size: int = 32,
    decontam_mode: str = "auto",
    lm_quantile: float = 0.0,
) -> "ray.data.Dataset":
    """(bucket, bin, n_docs, n_tok, seq_text) — packed train sequences.

    ``lm_quantile`` > 0 inserts the CCNet-style bigram-LM tail cut after
    corpus_clean (stages/lmfilter.py:lm_filter_low_quality): drop that
    fraction of lowest-scoring docs before decontamination. Default off —
    the golden sequence counts are pinned without it."""
    from calendar_event_entity_extraction_ray.pipelines.corpus import (
        corpus_clean,
    )
    from calendar_event_entity_extraction_ray.stages.decontam import (
        contaminated_doc_ids,
    )
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )
    from calendar_event_entity_extraction_ray.stages.joins import (
        anti_join,
        hash_join,
    )
    from calendar_event_entity_extraction_ray.stages.pack import (
        pack_first_fit,
    )

    with_split = docs.map_batches(
        lambda b: split_by_id_batch(b, id_col), batch_format="pyarrow")
    train = with_split.filter(expr="split == 'train'").drop_columns(["split"])
    ev = with_split.filter(expr="split == 'eval'").drop_columns(["split"])

    clean = corpus_clean(train, text_col=text_col, id_col=id_col)
    if lm_quantile and lm_quantile > 0:
        from calendar_event_entity_extraction_ray.stages.lmfilter import (
            lm_filter_low_quality,
        )

        clean = lm_filter_low_quality(clean, lm_quantile,
                                      text_col=text_col, id_col=id_col)
    # eval sides are small by construction; contaminated ids join back via
    # the exchange anti_join, so nothing here grows with the corpus
    contaminated = contaminated_doc_ids(
        clean, ev, doc_id_col=id_col, text_col=text_col, n=n_gram,
        mode=decontam_mode)
    survivors = anti_join(clean, contaminated, key=id_col,
                          left_cols=[id_col, text_col]).materialize()

    packed = pack_first_fit(survivors, doc_id_col=id_col, text_col=text_col,
                            capacity=capacity, bucket_size=bucket_size)
    with_text = hash_join(packed, survivors, id_col,
                          [id_col, "bucket", "bin", "ntok"],
                          [id_col, text_col])

    def emit(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_bb"]).to_pandas().sort_values(
            ["bucket", "bin", id_col], kind="mergesort")
        g = df.groupby(["bucket", "bin"], sort=False)
        out = g.agg(
            n_docs=(id_col, "count"),
            n_tok=("ntok", "sum"),
            seq_text=(text_col, "\n".join),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    keyed = with_text.map_batches(
        lambda b: add_hash_column(b, ["bucket", "bin"], out_col="_bb"),
        batch_format="pyarrow")
    return hash_partition_map(keyed, "_bb", emit)


def token_batches(
    seqs: "ray.data.Dataset",
    seq_len: int = 256,
    vocab_size: int = 32768,
    bpe_model=None,
    unigram_model=None,
) -> "ray.data.Dataset":
    """Training-tensor hand-off: encode each packed sequence with the
    deterministic tokenizer (functions/tokenizer.py), pad (id 0) /
    truncate to ``seq_len`` — output carries BOTH the real tensor
    payload (``input_ids``: fixed-width list<int32>, the shape a trainer
    consumes zero-copy) and exact-integer audit columns (n_ids before
    padding, n_pad, ids_fp = siphash of the id stream) so the oracle
    compares without shipping tensors through DuckDB.

    ``bpe_model`` (a trained ``stages/bpetrain.py:BpeModel``) swaps the
    hash-vocab stand-in for the CORPUS-TRAINED tokenizer: ids are
    vocab-index + 4 (the ToyTokenizer special-id convention: 0 pad,
    1 bos, 2 eos, 3 unk — only chars absent from the capped training
    histogram can hit unk).

    ``unigram_model`` (a trained ``stages/unigramtrain.py:UnigramModel``,
    mutually exclusive with ``bpe_model``) does the same with the
    unigram-LM tokenizer: piece ids are sorted-piece-index + the special
    offset; only encode-time pieces outside the trained table (unseen
    single chars) hit unk."""
    import numpy as np
    import pyarrow as pa

    from calendar_event_entity_extraction_ray.functions.tokenizer import (
        ToyTokenizer,
    )
    from calendar_event_entity_extraction_ray.stages.lmfilter import (
        hash_strs,
    )

    if bpe_model is not None and unigram_model is not None:
        raise ValueError("pass at most one of bpe_model / unigram_model")
    bpe_ref = None
    uni_ref = None
    if bpe_model is not None:
        import ray as _ray

        bpe_ref = _ray.put((
            {p: i for i, p in enumerate(bpe_model.merges)},
            {t: i + ToyTokenizer.N_SPECIAL
             for i, t in enumerate(bpe_model.vocab)},
        ))
    elif unigram_model is not None:
        import ray as _ray

        uni_ref = _ray.put((
            unigram_model.logp, unigram_model.unk_logp,
            unigram_model.max_piece_len,
            {p: i + ToyTokenizer.N_SPECIAL
             for i, p in enumerate(sorted(unigram_model.logp))},
        ))

    def _encoder():
        if bpe_ref is None and uni_ref is None:
            tok = ToyTokenizer(vocab_size)
            return lambda text: tok.encode(text or "")
        import ray as _ray

        if uni_ref is not None:
            from calendar_event_entity_extraction_ray.functions.unigram import (
                pretokenize,
                viterbi_pieces,
            )

            logp, unk, mpl, id_of = _ray.get(uni_ref)
            wcache: dict = {}

            def enc_uni(text):
                out = []
                for w in pretokenize(text or ""):
                    hit = wcache.get(w)
                    if hit is None:
                        hit = viterbi_pieces(w, logp, mpl, unk)
                        wcache[w] = hit
                    out.extend(id_of.get(p, 3) for p in hit)
                return out

            return enc_uni

        from calendar_event_entity_extraction_ray.functions.bpe import (
            encode_text,
        )

        ranks, id_of = _ray.get(bpe_ref)
        cache: dict = {}
        return lambda text: [id_of.get(t, 3)
                             for t in encode_text(text or "", ranks,
                                                  cache)]

    def enc(b: pa.Table) -> pa.Table:
        encode = _encoder()
        mats, n_ids, fps = [], [], []
        for text in b.column("seq_text").to_pylist():
            ids = encode(text or "")[:seq_len]
            n_ids.append(len(ids))
            fps.append(" ".join(map(str, ids)))
            mats.append(np.pad(np.asarray(ids, dtype=np.int32),
                               (0, seq_len - len(ids))))
        flat = (np.concatenate(mats) if mats
                else np.zeros(0, dtype=np.int32))
        n = np.asarray(n_ids, dtype=np.int64)
        return pa.table({
            "bucket": b.column("bucket"),
            "bin": b.column("bin"),
            "input_ids": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.int32()), seq_len),
            "n_ids": pa.array(n, pa.int64()),
            "n_pad": pa.array(seq_len - n, pa.int64()),
            "ids_fp": pa.array(hash_strs(fps).view(np.int64)
                               if fps else [], pa.int64()),
        })

    return seqs.map_batches(enc, batch_format="pyarrow")


def iter_token_batches(
    seqs: "ray.data.Dataset",
    seq_len: int = 256,
    batch_size: int = 32,
    vocab_size: int = 32768,
    bpe_model=None,
):
    """Yield ``(input_ids [batch, seq_len] int32, n_ids [batch] int64)``
    numpy pairs — the last mile into a training loop. Streaming: blocks
    arrive with backpressure, the fixed-size-list column reshapes
    zero-copy; batch order follows block order (pin
    ``DataContext.execution_options.preserve_order`` for bit-stable
    epoch order, or compose with the shuffle op for a seeded one)."""
    import numpy as np

    for b in token_batches(seqs, seq_len, vocab_size,
                           bpe_model=bpe_model).iter_batches(
            batch_size=batch_size, batch_format="pyarrow"):
        ids = (b.column("input_ids").combine_chunks().flatten()
               .to_numpy(zero_copy_only=False)
               .reshape(-1, seq_len))
        yield ids, b.column("n_ids").to_numpy(zero_copy_only=False)
