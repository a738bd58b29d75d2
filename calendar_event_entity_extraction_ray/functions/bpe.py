"""BPE tokenizer TRAINING kernels (Sennrich et al. 2016 / the HF-trainer
plan shape): learn merge rules from a word-frequency histogram, encode
text with the learned ranks.

The engine's toy tokenizer (functions/tokenizer.py) stands in for a
*trained* BPE; this module closes that loop. The scalable decomposition
is the one every real trainer uses: the CORPUS-sized work is only the
word-type histogram (distributed, stages/bpetrain.py); the merge loop
itself runs over the bounded word-TYPE table (Zipf: vocabulary-sized,
not corpus-sized) and is a pure driver-side kernel here, shared
verbatim with the single-process golden mirror
(scripts/make_goldens.py) so the distributed run is pinned
bit-identical.

Determinism rules (both mirrors share them):
  - pre-tokenizer = the repo-wide BPE-ish regex
    (functions/textstats.py:_BPE_RE) — parity with ``token_counts``.
  - histogram cap = top-K word types by (count DESC, word ASC)
    (``cap_word_counts``) — partition-independent because the
    distributed count is exact before the cap.
  - merge selection = (pair count DESC, pair ASC); training stops when
    the best pair occurs < 2 times (merging hapax pairs is pure
    tie-break noise).
  - no end-of-word marker: merges never cross word boundaries, so the
    concatenation of a word's tokens always round-trips to the word.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Tuple

from calendar_event_entity_extraction_ray.functions.textstats import (
    _BPE_RE,
)

Pair = Tuple[str, str]


def pretokenize(text: str | None) -> List[str]:
    """Words/numbers/symbols — the same split ``bpe_ish_token_count``
    counts, so trained-token stats line up with the existing op."""
    return _BPE_RE.findall(text or "")


def word_counts(texts: Iterable[str | None]) -> Dict[str, int]:
    cnt: Counter = Counter()
    for t in texts:
        if isinstance(t, str):
            cnt.update(_BPE_RE.findall(t))
    return dict(cnt)


def cap_word_counts(counts: Dict[str, int], top_k: int) -> Dict[str, int]:
    """Keep the ``top_k`` word types by (count DESC, word ASC). The ONE
    cap rule both the distributed histogram and the golden mirror apply,
    so the boundary ties resolve identically everywhere."""
    if len(counts) <= top_k:
        return dict(counts)
    kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return dict(kept)


def _merge_syms(syms: Tuple[str, ...], a: str, b: str,
                ab: str) -> Tuple[str, ...]:
    """Left-to-right greedy replacement of adjacent (a, b) with ab —
    the classic scan (overlaps like 'aaa' under (a,a) merge pairwise)."""
    out: List[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pair_counter(syms: Tuple[str, ...]) -> Counter:
    return Counter(zip(syms, syms[1:]))


def learn_bpe(word_cnt: Dict[str, int], n_merges: int) -> List[Pair]:
    """Merge loop over the word-TYPE histogram with incremental pair
    stats: each round touches only the word types containing the merged
    pair (the signed per-word pair-count diff keeps totals exact even on
    overlapping runs). O(n_merges x affected-types), never re-scans the
    histogram."""
    words: Dict[str, Tuple[str, ...]] = {
        w: tuple(w) for w in word_cnt if w
    }
    pair_n: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, syms in words.items():
        c = word_cnt[w]
        for p, k in _pair_counter(syms).items():
            pair_n[p] += k * c
            pair_words[p].add(w)

    merges: List[Pair] = []
    for _ in range(n_merges):
        if not pair_n:
            break
        (a, b), best_n = min(pair_n.items(),
                             key=lambda kv: (-kv[1], kv[0]))
        if best_n < 2:
            break
        ab = a + b
        merges.append((a, b))
        for w in sorted(pair_words[(a, b)]):
            old = _pair_counter(words[w])
            new_syms = _merge_syms(words[w], a, b, ab)
            new = _pair_counter(new_syms)
            words[w] = new_syms
            c = word_cnt[w]
            for p in set(old) | set(new):
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    pair_n[p] += d * c
                    if pair_n[p] <= 0:
                        del pair_n[p]
                if new.get(p, 0):
                    pair_words[p].add(w)
                else:
                    pair_words[p].discard(w)
        pair_n.pop((a, b), None)
        pair_words.pop((a, b), None)
    return merges


def build_vocab(word_cnt: Dict[str, int],
                merges: List[Pair]) -> List[str]:
    """Deterministic id order: sorted single characters first, then merge
    outputs in rank order (a merged string that collides with an earlier
    entry — e.g. ('a','bc') and ('ab','c') both yielding 'abc' — keeps
    its first id)."""
    chars = sorted({c for w in word_cnt for c in w})
    vocab: List[str] = []
    seen = set()
    for tok in chars + [a + b for a, b in merges]:
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
    return vocab


def encode_word(word: str, ranks: Dict[Pair, int]) -> Tuple[str, ...]:
    """GPT-2-style greedy encode: repeatedly merge the lowest-rank
    adjacent pair. Characters never seen in training just stay
    single-char tokens (char-level fallback), so encoding is total."""
    syms: Tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        best: Pair | None = None
        best_r = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_r, best = r, p
        if best is None:
            break
        syms = _merge_syms(syms, best[0], best[1], best[0] + best[1])
    return syms


def encode_text(text: str | None, ranks: Dict[Pair, int],
                cache: Dict[str, Tuple[str, ...]]) -> List[str]:
    """Encode one document via a word-type cache (Zipf: the cache hits
    almost always after warmup — encode_word runs once per DISTINCT word
    per worker, not once per token)."""
    toks: List[str] = []
    for w in pretokenize(text):
        e = cache.get(w)
        if e is None:
            e = encode_word(w, ranks)
            cache[w] = e
        toks.extend(e)
    return toks
