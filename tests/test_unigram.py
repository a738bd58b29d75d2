"""Unigram-LM tokenizer trainer (functions/unigram.py +
stages/unigramtrain.py): Viterbi kernel semantics, EM training
determinism, and distributed == single-process-mirror pinning."""

import math

import pytest


class TestViterbi:
    def test_picks_higher_probability_segmentation(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            viterbi_pieces,
        )

        logp = {"ab": math.log(0.4), "c": math.log(0.3),
                "a": math.log(0.1), "bc": math.log(0.1),
                "b": math.log(0.1)}
        # ab+c = log(.4*.3) > a+bc = log(.1*.1)
        assert viterbi_pieces("abc", logp, 6, -100.0) == ("ab", "c")

    def test_single_long_piece_wins_when_probable(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            viterbi_pieces,
        )

        logp = {"abc": math.log(0.5), "a": math.log(0.2),
                "b": math.log(0.2), "c": math.log(0.1)}
        assert viterbi_pieces("abc", logp, 6, -100.0) == ("abc",)

    def test_unseen_char_costs_unk_as_single_piece(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            viterbi_pieces,
        )

        logp = {"a": math.log(0.5), "b": math.log(0.5)}
        out = viterbi_pieces("axb", logp, 6, -50.0)
        assert out == ("a", "x", "b")

    def test_empty_word(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            viterbi_pieces,
        )

        assert viterbi_pieces("", {"a": -1.0}, 6, -50.0) == ()


class TestEmTrain:
    CORPUS = {"scanning": 50, "scan": 80, "planning": 40, "plan": 60,
              "running": 30, "run": 70, "banana": 20}

    def test_frequent_words_become_single_pieces(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            em_train,
            viterbi_pieces,
        )

        logp, unk = em_train(self.CORPUS, vocab_size=40, max_piece_len=6)
        # the highest-frequency short words should survive as whole pieces
        assert viterbi_pieces("scan", logp, 6, unk) == ("scan",)
        assert viterbi_pieces("run", logp, 6, unk) == ("run",)

    def test_every_training_char_is_in_vocab(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            em_train,
        )

        logp, _ = em_train(self.CORPUS, vocab_size=20)
        chars = {ch for w in self.CORPUS for ch in w}
        assert chars <= set(logp)

    def test_vocab_size_respected_above_char_floor(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            em_train,
        )

        chars = {ch for w in self.CORPUS for ch in w}
        target = len(chars) + 5
        logp, _ = em_train(self.CORPUS, vocab_size=target)
        assert len(logp) <= target + 1  # chars + kept multis

    def test_deterministic(self):
        from calendar_event_entity_extraction_ray.functions.unigram import (
            em_train,
        )

        a = em_train(dict(self.CORPUS), vocab_size=40)
        b = em_train(dict(reversed(list(self.CORPUS.items()))),
                     vocab_size=40)
        assert a == b


class TestDistributedUnigram:
    def _docs(self):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(11)
        words = ["scanning", "scan", "planning", "plan", "running",
                 "run", "banana", "table", "tables", "joined"]
        texts = [" ".join(rng.choice(words, rng.randint(3, 12)))
                 for _ in range(300)]
        return pd.DataFrame({
            "doc_id": np.arange(300, dtype=np.int64),
            "text": texts,
        })

    def test_train_matches_mirror_across_partitionings(self, ray_session):
        import ray

        from calendar_event_entity_extraction_ray.functions.bpe import (
            word_counts,
        )
        from calendar_event_entity_extraction_ray.functions.unigram import (
            em_train,
        )
        from calendar_event_entity_extraction_ray.stages.unigramtrain import (
            train_unigram,
        )

        df = self._docs()
        want_logp, want_unk = em_train(
            word_counts(df["text"].tolist()), vocab_size=60)
        for nblocks in (1, 6):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            model = train_unigram(ds, vocab_size=60, top_k=20_000)
            assert model.logp == want_logp
            assert model.unk_logp == want_unk

    def test_tokenize_matches_mirror_including_oov(self, ray_session):
        import numpy as np
        import ray

        from calendar_event_entity_extraction_ray.functions.unigram import (
            encode_text_unigram,
        )
        from calendar_event_entity_extraction_ray.stages.lmfilter import (
            hash_strs,
        )
        from calendar_event_entity_extraction_ray.stages.unigramtrain import (
            train_unigram,
            unigram_tokenize,
        )

        df = self._docs()
        # plant an OOV word (absent from training head; "zq" chars are
        # absent entirely -> unk path) in a couple of docs
        df.loc[3, "text"] = df.loc[3, "text"] + " zqzq"
        df.loc[7, "text"] = "unseenword " + df.loc[7, "text"]
        ds = ray.data.from_pandas(df).repartition(4)
        # train WITHOUT the planted rows so they are genuinely OOV
        train = ray.data.from_pandas(self._docs())
        model = train_unigram(train, vocab_size=60, top_k=20_000)
        got = (unigram_tokenize(ds, model).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        enc = [encode_text_unigram(x, model.logp, model.max_piece_len,
                                   model.unk_logp)
               for x in df["text"]]
        fp = hash_strs([s for _, s in enc]).view(np.int64)
        assert got["n_pieces"].tolist() == [n for n, _ in enc]
        assert got["pieces_fp"].tolist() == fp.tolist()

    def test_null_and_empty_texts(self, ray_session):
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.stages.unigramtrain import (
            train_unigram,
            unigram_tokenize,
        )

        df = pd.DataFrame({
            "doc_id": pd.array([0, 1, 2], dtype="int64"),
            "text": ["scan scan table", None, ""],
        })
        ds = ray.data.from_pandas(df)
        model = train_unigram(ds, vocab_size=30)
        out = (unigram_tokenize(ds, model).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["n_pieces"].tolist()[1:] == [0, 0]
        assert out["n_pieces"].iloc[0] > 0
        # null and empty share the empty-stream fingerprint
        assert out["pieces_fp"].iloc[1] == out["pieces_fp"].iloc[2]


class TestTokenBatchesUnigram:
    def test_mutually_exclusive_models(self, ray_session):
        import pandas as pd
        import pytest
        import ray

        from calendar_event_entity_extraction_ray.pipelines.traindata import (
            token_batches,
        )

        seqs = ray.data.from_pandas(pd.DataFrame({
            "bucket": pd.array([0], dtype="int64"),
            "bin": pd.array([0], dtype="int64"),
            "seq_text": ["scan table"],
        }))
        with pytest.raises(ValueError):
            token_batches(seqs, bpe_model=object(),
                          unigram_model=object())

    def test_unigram_ids_offset_and_pad(self, ray_session):
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.pipelines.traindata import (
            token_batches,
        )
        from calendar_event_entity_extraction_ray.stages.unigramtrain import (
            train_unigram,
        )

        docs = ray.data.from_pandas(pd.DataFrame({
            "doc_id": pd.array([0, 1], dtype="int64"),
            "text": ["scan scan table table", "scan table"],
        }))
        model = train_unigram(docs, vocab_size=30)
        seqs = ray.data.from_pandas(pd.DataFrame({
            "bucket": pd.array([0], dtype="int64"),
            "bin": pd.array([0], dtype="int64"),
            "seq_text": ["scan table"],
        }))
        out = token_batches(seqs, seq_len=8,
                            unigram_model=model).to_pandas()
        assert out["n_ids"].iloc[0] + out["n_pad"].iloc[0] == 8
        ids = out["input_ids"].iloc[0]
        n = out["n_ids"].iloc[0]
        # trained piece ids sit above the special range; padding is 0
        assert all(i >= 4 for i in ids[:n])
        assert all(i == 0 for i in ids[n:])
