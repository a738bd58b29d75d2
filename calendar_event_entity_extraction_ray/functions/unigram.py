"""Unigram-LM tokenizer TRAINING kernels (Kudo 2018, the SentencePiece
unigram model, in its Viterbi-EM / hard-EM form): learn a piece
vocabulary with log-probabilities from a word-frequency histogram,
segment text with Viterbi decoding.

Same scalable decomposition as the BPE trainer (functions/bpe.py /
stages/bpetrain.py): the CORPUS-sized work is only the distributed
word-type histogram; seeding, EM and pruning run over the bounded
word-TYPE table as pure driver-side kernels shared verbatim with the
single-process golden mirror (scripts/make_goldens.py), so the
distributed run is pinned bit-identical.

Determinism rules (both mirrors share them):
  - pre-tokenizer = the repo-wide BPE-ish regex (via
    functions/bpe.py:pretokenize) — parity with ``token_counts`` and the
    BPE trainer.
  - seed vocabulary = every substring of the capped word types up to
    ``max_piece_len`` chars, the multi-char ones capped to ``max_seed``
    by (substring count DESC, piece ASC); ALL single characters are
    always kept (coverage guarantee: any training word segments).
  - E-step = VITERBI (hard) counts: each word type contributes its
    count to the pieces of its single best segmentation. Ties resolve
    deterministically: the DP keeps the first-scanned candidate on
    exactly-equal scores, and candidates scan in increasing start
    position (longest piece ending at each boundary scans first).
    Published soft-EM (forward-backward expected counts) differs only
    in the expectation; the hard form keeps the float chain short and
    the mirror trivially bit-identical.
  - pruning = drop the lowest-(count, piece)-ranked multi-char pieces
    (never single chars) to ``max(vocab_size, ceil(len * prune_frac))``
    between EM rounds — the standard prune-until-target loop with the
    loss ranking simplified to the Viterbi count (a piece's count IS
    its usage; zero-count pieces carry zero likelihood).
  - unknown characters at ENCODE time (never seen in training) each
    segment as a single 1-char piece at ``unk_logp`` (floor of the
    trained distribution minus one nat).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, Iterable, List, Tuple

from calendar_event_entity_extraction_ray.functions.bpe import (
    pretokenize,  # noqa: F401  (re-exported: the shared pre-tokenizer)
)


def seed_candidates(
    counts: Dict[str, int],
    max_piece_len: int = 6,
    max_seed: int = 8_000,
) -> Dict[str, int]:
    """Substring-count seed vocabulary over the capped word histogram.
    Multi-char pieces cap at ``max_seed`` by (count DESC, piece ASC);
    every single character survives unconditionally."""
    sub: Counter = Counter()
    for w, n in counts.items():
        L = len(w)
        for i in range(L):
            top = min(i + max_piece_len, L)
            for j in range(i + 1, top + 1):
                sub[w[i:j]] += n
    multi = sorted((s for s in sub if len(s) > 1),
                   key=lambda s: (-sub[s], s))[:max_seed]
    seed = {s: sub[s] for s in multi}
    for s, c in sub.items():
        if len(s) == 1:
            seed[s] = c
    return seed


def _logp_table(counts: Dict[str, int],
                chars: Iterable[str]) -> Dict[str, float]:
    """Normalize counts to log-probs; characters that lost every count
    stay at a half-count epsilon so coverage never breaks."""
    total = sum(counts.values())
    eps_mass = 0.5
    logp = {s: math.log(c / total) for s, c in counts.items() if c > 0}
    floor = math.log(eps_mass / total)
    for ch in chars:
        if ch not in logp:
            logp[ch] = floor
    return logp


def viterbi_pieces(
    word: str,
    logp: Dict[str, float],
    max_piece_len: int,
    unk_logp: float,
) -> Tuple[str, ...]:
    """Single best segmentation of ``word`` under the unigram model.
    A character absent from ``logp`` costs ``unk_logp`` as its own
    piece. Strict-greater DP comparison + fixed scan order = one
    deterministic answer."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for end in range(1, n + 1):
        lo = max(0, end - max_piece_len)
        b, bj = NEG, lo
        for start in range(lo, end):
            if best[start] == NEG:
                continue
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start > 1:
                    continue
                lp = unk_logp
            s = best[start] + lp
            if s > b:
                b, bj = s, start
        best[end] = b
        back[end] = bj
    out: List[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return tuple(out)


def em_train(
    counts: Dict[str, int],
    vocab_size: int = 2_000,
    max_piece_len: int = 6,
    max_seed: int = 8_000,
    em_iters: int = 2,
    prune_frac: float = 0.75,
    max_rounds: int = 20,
) -> Tuple[Dict[str, float], float]:
    """Seed -> (EM x em_iters -> prune) rounds until the vocabulary fits
    ``vocab_size`` -> one final EM pass. Returns (piece -> logp,
    unk_logp). Pure, single-process, deterministic — the corpus enters
    ONLY through the exact word histogram."""
    chars = {ch for w in counts for ch in w}
    seed = seed_candidates(counts, max_piece_len, max_seed)
    logp = _logp_table(seed, chars)

    def one_em(cur: Dict[str, float]) -> Dict[str, int]:
        unk = min(cur.values()) - 1.0
        c: Counter = Counter()
        for w, n in counts.items():
            for piece in viterbi_pieces(w, cur, max_piece_len, unk):
                c[piece] += n
        return dict(c)

    for _ in range(max_rounds):
        for _ in range(em_iters):
            logp = _logp_table(one_em(logp), chars)
        vocab_now = len(logp)
        if vocab_now <= vocab_size:
            break
        target = max(vocab_size,
                     int(math.ceil(vocab_now * prune_frac)))
        # rank by Viterbi usage count (count DESC, piece ASC); single
        # chars are unprunable
        cnt = one_em(logp)
        multi = sorted((p for p in logp if len(p) > 1),
                       key=lambda p: (-cnt.get(p, 0), p))
        keep_multi = max(0, target - len(chars))
        kept = {p: cnt.get(p, 0) for p in multi[:keep_multi]}
        for ch in chars:
            kept[ch] = cnt.get(ch, 0)
        logp = _logp_table(kept, chars)
    logp = _logp_table(one_em(logp), chars)
    unk_logp = min(logp.values()) - 1.0
    return logp, unk_logp


def encode_text_unigram(
    text: "str | None",
    logp: Dict[str, float],
    max_piece_len: int,
    unk_logp: float,
) -> Tuple[int, str]:
    """(n_pieces, space-joined piece stream) for one document — the
    single-process mirror of the distributed encode. Pieces never
    contain whitespace (the pre-tokenizer can't emit it), so the join
    is unambiguous."""
    parts: List[str] = []
    n = 0
    for w in pretokenize(text):
        ps = viterbi_pieces(w, logp, max_piece_len, unk_logp)
        n += len(ps)
        parts.append(" ".join(ps))
    return n, " ".join(parts)
