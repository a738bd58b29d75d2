"""BPE tokenizer training (functions/bpe.py, stages/bpetrain.py):
incremental-vs-naive merge parity, encode round-trips, cap determinism,
distributed-vs-mirror bit parity."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest


def _naive_learn(word_cnt, n_merges):
    """Reference trainer: recompute every pair count from scratch each
    round — O(n_merges x corpus-types), the thing the incremental
    version must equal."""
    words = {w: tuple(w) for w in word_cnt if w}
    merges = []
    for _ in range(n_merges):
        pair_n = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pair_n[p] += word_cnt[w]
        if not pair_n:
            break
        (a, b), n = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        from calendar_event_entity_extraction_ray.functions.bpe import (
            _merge_syms,
        )

        words = {w: _merge_syms(s, a, b, a + b) for w, s in words.items()}
    return merges


class TestLearnBpe:
    def test_first_merge_and_overlap_runs(self):
        from calendar_event_entity_extraction_ray.functions.bpe import (
            learn_bpe,
        )

        # 'aaab' x2: ('a','a') occurs twice per word (greedy scan pairs
        # positions 0-1 and 1-2 both count in the stats) -> count 4 beats
        # ('a','b') at 2
        merges = learn_bpe({"aaab": 2}, 1)
        assert merges == [("a", "a")]

    def test_incremental_equals_naive_random(self):
        from calendar_event_entity_extraction_ray.functions.bpe import (
            learn_bpe,
        )

        rng = np.random.RandomState(11)
        for trial in range(5):
            words = {}
            for _ in range(60):
                w = "".join(rng.choice(list("abcde"),
                                       size=rng.randint(1, 9)))
                words[w] = words.get(w, 0) + int(rng.randint(1, 20))
            assert learn_bpe(dict(words), 40) == _naive_learn(words, 40)

    def test_stops_below_count_two(self):
        from calendar_event_entity_extraction_ray.functions.bpe import (
            learn_bpe,
        )

        # every pair is a hapax: no merges at all
        assert learn_bpe({"abc": 1, "def": 1}, 10) == []

    def test_cap_tie_break_deterministic(self):
        from calendar_event_entity_extraction_ray.functions.bpe import (
            cap_word_counts,
        )

        counts = {"b": 5, "a": 5, "c": 5, "d": 9}
        # top-2: d (9), then count-5 ties resolve word-ASC -> 'a'
        assert cap_word_counts(counts, 2) == {"d": 9, "a": 5}


class TestEncode:
    def test_round_trip_every_word(self):
        from calendar_event_entity_extraction_ray.functions.bpe import (
            encode_word,
            learn_bpe,
            word_counts,
        )

        texts = ["the cat sat on the mat 123 !",
                 "the catalog, the category"] * 10
        wc = word_counts(texts)
        ranks = {p: i for i, p in enumerate(learn_bpe(wc, 50))}
        for w in list(wc) + ["zzz", "unseené"]:
            toks = encode_word(w, ranks)
            assert "".join(toks) == w
            assert all(toks)

    def test_unseen_chars_fall_back_to_single_chars(self):
        from calendar_event_entity_extraction_ray.functions.bpe import (
            encode_word,
        )

        assert encode_word("xyz", {}) == ("x", "y", "z")
        assert encode_word("", {}) == ()


class TestDistributedBpe:
    def _docs(self, n=600):
        rng = np.random.RandomState(5)
        vocab = np.array([f"tok{i}" for i in range(150)]
                         + ["the", "of", "and", "data", "event"])
        texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 25)))
                 for _ in range(n)]
        texts[7] = ""
        return pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "text": pd.array(texts, dtype=object),
        })

    def test_train_matches_mirror_across_partitionings(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.functions.bpe import (
            cap_word_counts,
            learn_bpe,
            build_vocab,
            word_counts,
        )
        from calendar_event_entity_extraction_ray.stages.bpetrain import (
            train_bpe,
        )

        df = self._docs()
        df.loc[3, "text"] = None
        wc = cap_word_counts(word_counts(df["text"].tolist()), 100)
        want_merges = tuple(learn_bpe(wc, 60))
        want_vocab = tuple(build_vocab(wc, want_merges))
        for nblocks in (3, 11):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            model = train_bpe(ds, n_merges=60, top_k=100)
            assert model.merges == want_merges
            assert model.vocab == want_vocab
            assert model.kept_tokens == sum(wc.values())
            assert model.total_tokens >= model.kept_tokens

    def test_tokenize_matches_mirror(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.functions.bpe import (
            encode_text,
        )
        from calendar_event_entity_extraction_ray.stages.bpetrain import (
            bpe_tokenize,
            train_bpe,
        )
        from calendar_event_entity_extraction_ray.stages.lmfilter import (
            hash_strs,
        )

        df = self._docs(300)
        ds = ray.data.from_pandas(df).repartition(5)
        model = train_bpe(ds, n_merges=40, top_k=500)
        got = (bpe_tokenize(ds, model).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))

        ranks = {p: i for i, p in enumerate(model.merges)}
        cache: dict = {}
        toks = [encode_text(t, ranks, cache) for t in df["text"]]
        want_fp = hash_strs([" ".join(t) for t in toks]).view(np.int64)
        assert np.array_equal(got["doc_id"].to_numpy(),
                              df["doc_id"].to_numpy())
        assert np.array_equal(got["n_tokens"].to_numpy(),
                              np.array([len(t) for t in toks]))
        assert np.array_equal(got["tokens_fp"].to_numpy(), want_fp)
        # the empty doc is kept with 0 tokens
        assert int(got.loc[got["doc_id"] == 7, "n_tokens"].iloc[0]) == 0

    def test_cap_boundary_is_partition_independent(self, ray_session):
        """Force the cap to bite (top_k < distinct types) and check the
        capped histogram — hence the merges — never depend on block
        layout."""
        import ray

        from calendar_event_entity_extraction_ray.stages.bpetrain import (
            train_bpe,
        )

        df = self._docs(400)
        models = []
        for nblocks in (2, 13):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            models.append(train_bpe(ds, n_merges=30, top_k=40))
        assert models[0] == models[1]
