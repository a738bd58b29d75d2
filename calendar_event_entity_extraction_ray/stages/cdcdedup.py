"""Content-defined chunking (CDC) dedup — storage-style chunk-level
redundancy detection across a document corpus.

Fixed-size chunking misses duplicates after any insertion shifts byte
offsets; CDC cuts chunks where a rolling window hash of the CONTENT
meets a condition, so chunk boundaries re-synchronize after an edit and
partially-copied documents still share most chunks (the rsync / LBFS /
FastCDC idea). This engine uses it to measure, per document, how many
of its bytes already exist elsewhere in the corpus — a finer-grained
redundancy signal than whole-doc or span dedup (stages/spandedup.py is
token-n-gram based; this is byte-level and alignment-free).

Kernel: the window hash is position-keyed table lookups
``H(c) = sum_{j<W} T[j][byte[c-W+j]]`` (uint64 wraparound), which
vectorizes as W numpy gathers over the batch's CONCATENATED byte
buffer — one pass for the whole batch, no per-char Python. A cut is
placed at in-doc position c when ``H(c) & (2^mask_bits - 1) == 0``
(expected chunk size 2^mask_bits), subject to min/max size enforced by
a tiny per-doc greedy walk over the CANDIDATE list (a few entries per
doc, not per byte).

Chunk identity is a 128-bit content hash: two independent 64-bit
siphashes (``pd.util.hash_pandas_object`` with two hash keys —
process-stable, vectorized; the repo's identity-hash rule, CLAUDE.md).
h1 doubles as the exchange shuffle key; dedup groups on (h1, h2).

Dedup semantics: a chunk INSTANCE is duplicate iff an identical chunk
exists at a strictly smaller (doc_id, offset) — global first-wins,
partitioning-independent. One exchange co-locates all instances of a
chunk; the fold emits per-doc partials; one grouped_sums reduces to
(doc_id, n_chunks, total_bytes, n_dup_chunks, dup_bytes).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

_W = 16                    # rolling window bytes
_HK1 = "cee-cdc-hash-k1-"  # 16-char siphash keys (identity = both)
_HK2 = "cee-cdc-hash-k2-"

_rng = np.random.RandomState(0xCDC)
# position-keyed gather tables: W x 256 uint64
_T = _rng.randint(0, 2**63, size=(_W, 256), dtype=np.int64).astype(np.uint64)
del _rng


def _cut_positions(length: int, cands: np.ndarray, min_size: int,
                   max_size: int) -> List[int]:
    """Greedy walk over ascending candidate cut positions: accept a
    candidate >= min_size after the previous cut; force a cut every
    max_size bytes when no candidate lands; doc end always cuts."""
    cuts: List[int] = []
    prev = 0
    for c in cands.tolist():
        while c - prev > max_size:
            prev += max_size
            cuts.append(prev)
        if c - prev >= min_size:
            cuts.append(c)
            prev = c
    while length - prev > max_size:
        prev += max_size
        cuts.append(prev)
    if length > prev:
        cuts.append(length)
    return cuts


def chunk_doc(buf: bytes, *, min_size: int = 32, mask_bits: int = 6,
              max_size: int = 256) -> List[bytes]:
    """Single-doc reference chunker (used by tests/goldens; the batch
    kernel below must produce identical chunks)."""
    arr = np.frombuffer(buf, np.uint8)
    if len(arr) >= _W:
        h = np.zeros(len(arr) - _W + 1, dtype=np.uint64)
        for j in range(_W):
            h += _T[j][arr[j:len(arr) - _W + 1 + j]]
        # candidate cut at window-END position c = idx + W
        mask = np.uint64((1 << mask_bits) - 1)
        cand = np.flatnonzero((h & mask) == 0) + _W
        cand = cand[cand >= min_size]
    else:
        cand = np.empty(0, np.int64)
    cuts = _cut_positions(len(arr), cand, min_size, max_size)
    out, prev = [], 0
    for c in cuts:
        out.append(buf[prev:c])
        prev = c
    return out


def cdc_chunk_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", min_size: int = 32,
                    mask_bits: int = 6, max_size: int = 256) -> pa.Table:
    """Explode docs into CDC chunks: (id, offset, nbytes, h1, h2).
    The window hash runs ONCE over the batch's concatenated buffer."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_pylist()
    bufs = [t.encode("utf-8") if t else b"" for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    big = np.frombuffer(b"".join(bufs), np.uint8)
    starts = np.zeros(len(bufs), dtype=np.int64)
    if len(bufs) > 1:
        starts[1:] = np.cumsum(lens)[:-1]

    if len(big) >= _W:
        hg = np.zeros(len(big) - _W + 1, dtype=np.uint64)
        for j in range(_W):
            hg += _T[j][big[j:len(big) - _W + 1 + j]]
        mask = np.uint64((1 << mask_bits) - 1)
        cand_global = np.flatnonzero((hg & mask) == 0) + _W  # window END
    else:
        cand_global = np.empty(0, np.int64)

    out_id, out_off, out_chunk = [], [], []
    for i, buf in enumerate(bufs):
        length = int(lens[i])
        if length == 0:
            continue
        s = starts[i]
        # in-doc candidates: window must lie inside this doc
        lo = np.searchsorted(cand_global, s + _W)
        hi = np.searchsorted(cand_global, s + length, side="right")
        cand = cand_global[lo:hi] - s
        cand = cand[cand >= min_size]
        prev = 0
        for c in _cut_positions(length, cand, min_size, max_size):
            out_id.append(ids[i])
            out_off.append(prev)
            out_chunk.append(buf[prev:c])
            prev = c

    nbytes = np.array([len(c) for c in out_chunk], dtype=np.int64)
    ser = pd.Series(out_chunk, dtype=object)
    h1 = pd.util.hash_pandas_object(ser, index=False, hash_key=_HK1)
    h2 = pd.util.hash_pandas_object(ser, index=False, hash_key=_HK2)
    return pa.table({
        id_col: pa.array(out_id, batch.schema.field(id_col).type),
        "offset": pa.array(out_off, pa.int64()),
        "nbytes": pa.array(nbytes),
        "h1": pa.array(h1.to_numpy().view(np.int64)),
        "h2": pa.array(h2.to_numpy().view(np.int64)),
    })


def cdc_dedup_docs(ds: "ray.data.Dataset", *, text_col: str = "text",
                   id_col: str = "doc_id", min_size: int = 32,
                   mask_bits: int = 6, max_size: int = 256,
                   num_partitions=None) -> "ray.data.Dataset":
    """Per-doc chunk-level redundancy: (id, n_chunks, total_bytes,
    n_dup_chunks, dup_bytes). First-wins by global (doc_id, offset).
    One chunk exchange + one grouped_sums reduce; nothing driver-side."""
    from .aggregate import grouped_sums
    from .exchange import hash_partition_map

    chunks = ds.map_batches(
        cdc_chunk_batch, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"text_col": text_col, "id_col": id_col,
                   "min_size": min_size, "mask_bits": mask_bits,
                   "max_size": max_size})

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["h1", "h2", id_col, "offset"],
                            kind="mergesort")
        grp_first = ~(df[["h1", "h2"]].eq(df[["h1", "h2"]].shift())
                      .all(axis=1)).to_numpy()
        dup = ~grp_first
        per = df.groupby(id_col, dropna=False, sort=False).agg(
            n_chunks=("nbytes", "size"),
            total_bytes=("nbytes", "sum"))
        dd = df[dup].groupby(id_col, dropna=False, sort=False).agg(
            n_dup_chunks=("nbytes", "size"),
            dup_bytes=("nbytes", "sum"))
        out = per.join(dd, how="left").fillna(0).reset_index()
        for c in ("n_chunks", "total_bytes", "n_dup_chunks", "dup_bytes"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = hash_partition_map(chunks, "h1", fold,
                                  num_partitions=num_partitions)
    out = grouped_sums(partials, key_cols=[id_col],
                       sum_cols=["n_chunks", "total_bytes",
                                 "n_dup_chunks", "dup_bytes"])
    # grouped_sums' partial-row count is meaningless here — drop it
    return out.select_columns([id_col, "n_chunks", "total_bytes",
                               "n_dup_chunks", "dup_bytes"])
