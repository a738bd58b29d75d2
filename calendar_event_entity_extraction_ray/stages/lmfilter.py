"""CCNet-style bigram-LM quality filter: train word-bigram counts on a
trusted subset (e.g. lang == 'en'), broadcast the count tables once, score
every document's average-ish log-probability in one map pass.

Reference anchor: the reference scores extraction quality per record
(src/evaluate_baseline.py); this is the corpus-scale analogue every
web-text pipeline runs before training (CCNet's KenLM filter) expressed
Ray-Data-first:

  - TRAINING is two exact grouped counts (unigrams, bigrams) fused into a
    single exchange pass over (kind, gram) — per-batch Counter partials,
    so a hot gram ships one row per batch and the shuffle moves
    |vocab| x |batches| rows regardless of corpus size.
  - The count tables are vocabulary-sized (the entity-pool broadcast
    pattern), collected once and ``ray.put`` once. At open-web vocabulary
    (10^8+ bigrams) swap the exact tables for the Misra-Gries heavy-hitter
    sketch (functions/sketch.py) + backoff — the scoring kernel is
    unchanged; this module keeps the exact tables so the golden oracle is
    bit-reproducible.
  - SCORING is a pure per-batch map: add-one-smoothed
    sum ln((B[a,b]+1) / (U[a]+V)) over the document's bigrams in DOCUMENT
    ORDER (a fixed order makes the float64 sum deterministic — the same
    discipline as model_stage.py's float64 accumulation), published as the
    exact-integer pair (lm_logp_e6, n_bigrams); the fraction is the
    reader's division, like grouped_regression's moments.

Tokens are ``text.split(' ')`` with empties kept (== DuckDB string_split;
the repo-wide convention). Docs with < 2 tokens emit no row. The golden
oracle (scripts/make_goldens.py:golden_lm_scored_docs) recomputes
everything single-process through the SAME pure kernels below.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, Tuple

import pyarrow as pa

import ray.data

# -- pure kernels (shared with the single-process golden mirror) -----------


def gram_counts(texts: Iterable[str]) -> Tuple[Dict[str, int],
                                               Dict[Tuple[str, str], int]]:
    """Exact unigram + bigram counts over tokenized texts."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for txt in texts:
        if not isinstance(txt, str):
            continue
        ws = txt.split(" ")
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    return dict(uni), dict(bi)


def doc_logprob_e6(text: str, uni: Dict[str, int],
                   bi: Dict[Tuple[str, str], int], vocab: int):
    """(lm_logp_e6, n_bigrams) for one doc, or None for < 2 tokens.
    Add-one smoothing; float64 sum in document order; integer-scaled
    floor(s * 1e6 + 0.5)."""
    if not isinstance(text, str):
        return None
    ws = text.split(" ")
    if len(ws) < 2:
        return None
    s = 0.0
    for a, b in zip(ws, ws[1:]):
        s += math.log((bi.get((a, b), 0) + 1) / (uni.get(a, 0) + vocab))
    return math.floor(s * 1_000_000 + 0.5), len(ws) - 1


# -- distributed operator ---------------------------------------------------


def train_bigram_lm(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> Tuple[Dict[str, int], Dict[Tuple[str, str], int], int]:
    """Distributed exact gram counts: one fused exchange over (kind, gram)
    — kind 'u'/'b', bigram grams joined with a space (tokens are
    space-free after split(' '), so the join is unambiguous). Returns
    (unigram dict, bigram dict, vocab size); the result is bit-identical
    to a single-process ``gram_counts`` fold by construction (integer
    partial sums commute)."""
    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )

    def partial(b: pa.Table) -> pa.Table:
        uni, bi = gram_counts(b.column(text_col).to_pylist())
        kinds = ["u"] * len(uni) + ["b"] * len(bi)
        grams = list(uni.keys()) + [f"{a} {c}" for a, c in bi.keys()]
        ns = list(uni.values()) + list(bi.values())
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "gram": pa.array(grams, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    counts = grouped_sums(partials, ["kind", "gram"], ["n"],
                          count_alias="_nb").to_pandas()
    uni: Dict[str, int] = {}
    bi: Dict[Tuple[str, str], int] = {}
    for kind, gram, n in zip(counts["kind"], counts["gram"], counts["n"]):
        if kind == "u":
            uni[gram] = int(n)
        else:
            a, _, c = gram.partition(" ")
            bi[(a, c)] = int(n)
    return uni, bi, len(uni)


def lm_score(
    train: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Train on ``train``, score ``docs``: returns (id, lm_logp_e6,
    n_bigrams) — one broadcast, one map pass, nothing about ``docs``
    shuffles."""
    import ray as _ray

    uni, bi, vocab = train_bigram_lm(train, text_col)
    lm_ref = _ray.put((uni, bi, vocab))

    def score(b: pa.Table) -> pa.Table:
        u, bg, v = _ray.get(lm_ref)
        ids, lps, nbs = [], [], []
        for i, txt in zip(b.column(id_col).to_pylist(),
                          b.column(text_col).to_pylist()):
            r = doc_logprob_e6(txt, u, bg, v)
            if r is None:
                continue
            ids.append(i)
            lps.append(r[0])
            nbs.append(r[1])
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "lm_logp_e6": pa.array(lps, pa.int64()),
                         "n_bigrams": pa.array(nbs, pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")
