"""CCNet-style bigram-LM quality filter: train word-bigram counts on a
trusted subset (e.g. lang == 'en'), broadcast the count tables once, score
every document's log-probability in one map pass.

Reference anchor: the reference scores extraction quality per record
(src/evaluate_baseline.py); this is the corpus-scale analogue every
web-text pipeline runs before training (CCNet's KenLM filter) expressed
Ray-Data-first:

  - TRAINING is two exact grouped counts (unigrams, bigrams) fused into a
    single exchange pass over (kind, gram) — per-batch Counter partials,
    so a hot gram ships one row per batch and the shuffle moves
    |gram vocabulary| x |batches| rows regardless of corpus size.
  - The trained model is a HASHED NUMPY TABLE, not a Python dict: grams
    key on their process-stable 64-bit siphash
    (pd.util.hash_pandas_object — the repo's standard shuffle hash),
    sorted hash + count arrays. Numpy arrays are plasma ZERO-COPY, so a
    100M-entry table broadcast via ``ray.put`` costs each task a pointer,
    not a deserialize (a dict-of-tuples version measured unusable at 7.5M
    bigrams: every batch re-unpickled hundreds of MB). Hash collisions
    FOLD counts together — deterministic on both mirrors because both
    build the table through the same kernel; at 10^8 grams the chance any
    collision exists is ~3e-4, noise for a quality score.
  - SCORING is fully vectorized: one flattened bigram array per batch,
    one hash pass, one searchsorted per table, one np.log, one
    np.add.reduceat segment sum per doc — no per-token Python. Published
    as the exact-integer pair (lm_logp_e6, n_bigrams); the average is the
    reader's division, like grouped_regression's moments.

Add-one smoothing: ln((B[a,b] + 1) / (U[a] + V)), V = distinct unigrams.
Tokens are ``text.split(' ')`` with empties kept (== DuckDB string_split;
the repo-wide convention). Docs with < 2 tokens emit no row. The golden
oracle (scripts/make_goldens.py:golden_lm_scored_docs) recomputes
everything single-process through the SAME kernels below, so the
distributed run is pinned bit-identical (same hashes, same collision
folds, same np.log, same reduceat order).
"""

from __future__ import annotations

from collections import namedtuple
from typing import Dict, Iterable, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

LmTable = namedtuple("LmTable", ["uh", "un", "bh", "bn", "vocab"])

# -- pure kernels (shared with the single-process golden mirror) -----------


def gram_counts(texts: Iterable[str]) -> Tuple[Dict[str, int],
                                               Dict[str, int]]:
    """Exact unigram + bigram counts (bigram key = 'a b'; tokens are
    space-free after split(' '), so the join is unambiguous)."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for txt in texts:
        if not isinstance(txt, str):
            continue
        ws = txt.split(" ")
        uni.update(ws)
        bi.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    return dict(uni), dict(bi)


def hash_strs(vals) -> np.ndarray:
    """Process-stable 64-bit gram hash (fixed-key siphash — NEVER Python's
    salted hash(); same rule as stages/dedup.py)."""
    return pd.util.hash_pandas_object(
        pd.Series(vals, dtype=object), index=False).to_numpy()


def _hash_count_arrays(grams, counts) -> Tuple[np.ndarray, np.ndarray]:
    """(sorted unique hashes, summed counts) — duplicate hashes (true
    collisions) fold by SUM on every mirror, keeping them deterministic."""
    h = hash_strs(grams)
    n = np.asarray(counts, dtype=np.int64)
    uh, inv = np.unique(h, return_inverse=True)
    un = np.zeros(len(uh), dtype=np.int64)
    np.add.at(un, inv, n)
    return uh, un


def build_lm_table(uni: Dict[str, int], bi: Dict[str, int]) -> LmTable:
    """Dict counts -> the hashed numpy table (golden/small path). V is the
    DISTINCT-HASH unigram count (== distinct strings up to collisions) so
    both mirrors agree with the hash-keyed distributed training."""
    uh, un = _hash_count_arrays(list(uni.keys()), list(uni.values()))
    bh, bn = _hash_count_arrays(list(bi.keys()), list(bi.values()))
    return LmTable(uh, un, bh, bn, len(uh))


def _lookup(h: np.ndarray, th: np.ndarray, tn: np.ndarray) -> np.ndarray:
    """Vectorized count lookup: sorted-array searchsorted, 0 on miss."""
    idx = np.searchsorted(th, h)
    idx_c = np.minimum(idx, max(len(th) - 1, 0))
    found = (len(th) > 0) & (th[idx_c] == h)
    return np.where(found, tn[idx_c], 0)


def score_texts(ids, texts, table: LmTable):
    """(kept_ids, lm_logp_e6, n_bigrams) int64 arrays for one batch of
    docs — flatten, hash once, two lookups, one np.log, one reduceat.
    Docs with < 2 tokens are dropped. Both mirrors run THIS function, so
    float summation order is identical by construction."""
    first, second, lens, kept = [], [], [], []
    for i, txt in zip(ids, texts):
        if not isinstance(txt, str):
            continue
        ws = txt.split(" ")
        if len(ws) < 2:
            continue
        first.extend(ws[:-1])
        second.extend(ws[1:])
        lens.append(len(ws) - 1)
        kept.append(i)
    if not kept:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    sa = pd.Series(first, dtype=object)
    sb = pd.Series(second, dtype=object)
    bcnt = _lookup(hash_strs(sa.str.cat(sb, sep=" ")), table.bh, table.bn)
    ucnt = _lookup(hash_strs(sa), table.uh, table.un)
    logp = np.log((bcnt + 1.0) / (ucnt + float(table.vocab)))
    lens_a = np.asarray(lens, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens_a)[:-1]])
    sums = np.add.reduceat(logp, starts)
    e6 = np.floor(sums * 1_000_000 + 0.5).astype(np.int64)
    return np.asarray(kept, dtype=np.int64), e6, lens_a


# -- distributed operator ---------------------------------------------------


def train_bigram_lm(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> LmTable:
    """Distributed exact gram counts -> hashed table: one fused exchange
    over (kind, gram), then a vectorized hash/sort on the driver (the
    table is gram-vocabulary-sized — the entity-pool broadcast pattern;
    at open-web vocabularies cap it with the Misra-Gries heavy-hitter
    sketch, functions/sketch.py — the scoring kernel is unchanged).
    Integer partial sums commute, so the counts are bit-identical to a
    single-process ``gram_counts`` fold by construction."""
    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )

    def partial(b: pa.Table) -> pa.Table:
        # hash grams HERE: the exchange ships (kind, int64 hash, count)
        # rows, never gram strings — hash-collision count folds happen in
        # the groupby itself, identically to build_lm_table's unique-sum
        uni, bi = gram_counts(b.column(text_col).to_pylist())
        kinds = ["u"] * len(uni) + ["b"] * len(bi)
        gh = np.concatenate([
            hash_strs(list(uni.keys())) if uni else np.zeros(0, np.uint64),
            hash_strs(list(bi.keys())) if bi else np.zeros(0, np.uint64),
        ]).view(np.int64)
        ns = list(uni.values()) + list(bi.values())
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "gh": pa.array(gh, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = grouped_sums(partials, ["kind", "gh"], ["n"],
                          count_alias="_nb").to_pandas()
    um = (counts["kind"] == "u").to_numpy()
    gh = counts["gh"].to_numpy().view(np.uint64)
    n = counts["n"].to_numpy().astype(np.int64)

    def _sorted(mask):
        h, c = gh[mask], n[mask]
        o = np.argsort(h, kind="stable")
        return h[o], c[o]

    uh, un = _sorted(um)
    bh, bn = _sorted(~um)
    return LmTable(uh, un, bh, bn, len(uh))


def lm_filter_low_quality(
    docs: "ray.data.Dataset",
    q: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """CCNet-style tail cut: self-train the bigram LM on ``docs``, score
    every doc, drop the lowest ``q`` fraction by per-bigram average
    log-prob (lm_logp_e6 / n_bigrams — boilerplate and natural text score
    high; gibberish, wrong-language and mojibake score low). The cut is
    the EXACT distributed quantile (stages/quantiles.py histogram-refine
    — no global sort), survivors rejoin the text via the exchange semi
    join, so nothing driver-side grows with the corpus. Docs with < 2
    tokens have no score and are dropped (unscorable)."""
    from calendar_event_entity_extraction_ray.stages.joins import semi_join
    from calendar_event_entity_extraction_ray.stages.quantiles import (
        exact_quantiles,
    )

    def ratio(b: pa.Table) -> pa.Table:
        e6 = b.column("lm_logp_e6").to_numpy()
        nb = b.column("n_bigrams").to_numpy()
        return b.append_column(
            "lp_per_bg", pa.array(e6 / nb, pa.float64()))

    scored = lm_score(docs, docs, text_col, id_col).map_batches(
        ratio, batch_format="pyarrow").materialize()  # quantile + filter
    thr = exact_quantiles(scored, "lp_per_bg", [q])[0][1]

    def keep_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(
            b.column("lp_per_bg"), pa.scalar(thr))).select([id_col])

    keep = scored.map_batches(keep_batch, batch_format="pyarrow")
    return semi_join(docs, keep, key=id_col,
                     left_cols=[c for c in docs.schema().names])


def lm_score(
    train: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Train on ``train``, score ``docs``: returns (id, lm_logp_e6,
    n_bigrams). The four table arrays broadcast individually (plasma
    zero-copy per array — tasks share one resident copy per node);
    nothing about ``docs`` shuffles."""
    import ray as _ray

    t = train_bigram_lm(train, text_col)
    refs = (_ray.put(t.uh), _ray.put(t.un), _ray.put(t.bh), _ray.put(t.bn))
    vocab = t.vocab

    def score(b: pa.Table) -> pa.Table:
        table = LmTable(*[_ray.get(r) for r in refs], vocab)
        ids, e6, nbs = score_texts(b.column(id_col).to_pylist(),
                                   b.column(text_col).to_pylist(), table)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "lm_logp_e6": pa.array(e6, pa.int64()),
                         "n_bigrams": pa.array(nbs, pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")
