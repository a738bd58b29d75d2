"""n-gram train/eval decontamination (stages/decontam.py).

Pins: broadcast and exchange regimes return the identical exact result;
single-process brute-force agreement; NULL / short-text edges; per-doc
gram dedupe in the explode.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from calendar_event_entity_extraction_ray.stages.decontam import (
    contaminated_doc_ids,
    gram_explode_batch,
)


def _grams(text: str, n: int) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _brute(train: pd.DataFrame, ev: pd.DataFrame, n: int) -> list:
    ev_grams = set()
    for t in ev["text"]:
        if t is not None:
            ev_grams |= _grams(t, n)
    hits = [did for did, t in zip(train["doc_id"], train["text"])
            if t is not None and _grams(t, n) & ev_grams]
    return sorted(hits)


@pytest.fixture(scope="module")
def corpus():
    # planted overlaps: doc 3 copies doc 101's phrase; doc 7 is an exact
    # dup of doc 102; doc 5 shares only a 2-gram (below n=3); doc 9 NULL
    train = pd.DataFrame({
        "doc_id": [1, 3, 5, 7, 9, 11],
        "text": [
            "alpha beta gamma delta epsilon",
            "the quick brown fox jumps over the lazy dog",
            "shared pair only here nothing else",
            "identical benchmark document text here",
            None,
            "xx",  # shorter than n tokens
        ],
    })
    ev = pd.DataFrame({
        "doc_id": [101, 102, 103],
        "text": [
            "prefix words quick brown fox suffix",
            "identical benchmark document text here",
            "shared pair zz yy ww",
        ],
    })
    return train, ev


class TestGramExplode:
    def test_per_doc_dedupe_and_edges(self):
        b = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a b a b a b", None, "a"],
        })
        t = gram_explode_batch(b, "doc_id", "text", 2)
        # doc 1 has 5 bigram positions but only 2 distinct bigrams
        assert t.num_rows == 2
        assert set(t.column("gram").to_pylist()) == {"a b", "b a"}
        assert set(t.column("doc_id").to_pylist()) == {1}


class TestRegimesAgree:
    def test_broadcast_equals_exchange_equals_brute(self, ray_session,
                                                    corpus):
        import ray

        train, ev = corpus
        want = _brute(train, ev, 3)
        assert want  # fixture must actually plant contamination
        got = {}
        for mode in ("broadcast", "exchange", "bloom"):
            ds_t = ray.data.from_pandas(train).repartition(3)
            ds_e = ray.data.from_pandas(ev).repartition(2)
            out = contaminated_doc_ids(ds_t, ds_e, n=3, mode=mode)
            got[mode] = sorted(out.to_pandas()["doc_id"].tolist())
        assert got["broadcast"] == want
        assert got["exchange"] == want
        assert got["bloom"] == want

    def test_no_overlap_returns_empty(self, ray_session):
        import ray

        train = pd.DataFrame({"doc_id": [1], "text": ["a b c d e"]})
        ev = pd.DataFrame({"doc_id": [2], "text": ["v w x y z"]})
        for mode in ("broadcast", "exchange"):
            out = contaminated_doc_ids(
                ray.data.from_pandas(train), ray.data.from_pandas(ev),
                n=3, mode=mode)
            assert out.count() == 0

    def test_empty_eval_side_flags_nothing(self, ray_session):
        import ray

        train = pd.DataFrame({"doc_id": [1, 2],
                              "text": ["a b c d", "e f g h"]})
        empty = pd.DataFrame({
            "doc_id": pd.array([], dtype="int64"),
            "text": pd.array([], dtype="string")})
        for mode in ("broadcast", "exchange"):
            out = contaminated_doc_ids(
                ray.data.from_pandas(train), ray.data.from_pandas(empty),
                n=3, mode=mode)
            assert out.count() == 0

    def test_bloom_bitset_is_fixed_size(self, ray_session, corpus):
        """The Bloom partial is constant-size regardless of eval volume —
        the property that makes the regime viable when BOTH sides are
        corpus-scale."""
        import ray

        from calendar_event_entity_extraction_ray.stages.decontam import (
            BLOOM_DEFAULT_BITS,
            eval_gram_bloom,
        )

        _, ev = corpus
        bits = eval_gram_bloom(ray.data.from_pandas(ev).repartition(2), n=3)
        assert len(bits) * 64 == BLOOM_DEFAULT_BITS
        assert bits.dtype.name == "uint64"
        assert int((bits != 0).sum()) > 0  # grams actually landed

    def test_auto_picks_broadcast_small(self, ray_session, corpus):
        import ray

        train, ev = corpus
        out = contaminated_doc_ids(
            ray.data.from_pandas(train), ray.data.from_pandas(ev),
            n=3, mode="auto")
        assert sorted(out.to_pandas()["doc_id"].tolist()) == _brute(
            train, ev, 3)
