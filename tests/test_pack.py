"""Greedy first-fit sequence packing (stages/pack.py).

Pins: bin assignments match a single-process replay of the same walk;
capacity is respected (except single oversized docs, which get their own
bin); result is independent of input partitioning; NULL text dropped.
"""

from __future__ import annotations

import pandas as pd
import pytest

from calendar_event_entity_extraction_ray.stages.pack import pack_first_fit


def _replay(df: pd.DataFrame, capacity: int, bucket_size: int) -> pd.DataFrame:
    rows = []
    df = df[df["text"].notna()].copy()
    df["ntok"] = df["text"].str.split(" ").str.len()
    df["bucket"] = df["doc_id"] // bucket_size
    for bk, g in df.sort_values("doc_id").groupby("bucket"):
        acc, binno = 0, 0
        first = True
        for _, r in g.iterrows():
            if not first and acc + r["ntok"] > capacity:
                binno += 1
                acc = 0
            first = False
            acc += r["ntok"]
            rows.append((r["doc_id"], bk, binno, r["ntok"]))
    return pd.DataFrame(rows, columns=["doc_id", "bucket", "bin", "ntok"])


@pytest.fixture(scope="module")
def docs():
    # token counts chosen to exercise: exact-fit, overflow, oversized doc
    texts = {
        0: "a " * 9, 1: "b " * 9, 2: "c " * 3,     # 10+10+4 = fit in 20
        3: "d " * 19,                               # 20 -> own bin
        4: "e " * 30,                               # 31 > capacity: own bin
        5: "f " * 4,
        40: "g " * 7, 41: None, 42: "h " * 15,      # NULL dropped
    }
    return pd.DataFrame({
        "doc_id": list(texts), "text": [texts[k] for k in texts]})


class TestPackFirstFit:
    def test_matches_replay_and_partition_invariance(self, ray_session,
                                                     docs):
        import ray

        want = _replay(docs, capacity=20, bucket_size=32)
        for nparts in (1, 4):
            ds = ray.data.from_pandas(docs).repartition(nparts)
            got = (pack_first_fit(ds, capacity=20, bucket_size=32)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True).astype("int64"))
            assert got.equals(
                want.sort_values("doc_id").reset_index(drop=True)
                .astype("int64"))

    def test_empty_input_yields_empty_output(self, ray_session):
        import ray

        empty = pd.DataFrame({
            "doc_id": pd.array([], dtype="int64"),
            "text": pd.array([], dtype="string")})
        assert pack_first_fit(ray.data.from_pandas(empty)).count() == 0

    def test_capacity_respected_except_oversized(self, ray_session, docs):
        import ray

        got = pack_first_fit(ray.data.from_pandas(docs), capacity=20,
                             bucket_size=32).to_pandas()
        sums = got.groupby(["bucket", "bin"]).agg(
            tok=("ntok", "sum"), n=("doc_id", "count"))
        over = sums[sums["tok"] > 20]
        # only single-doc (oversized) bins may exceed capacity
        assert (over["n"] == 1).all()
        # bins never cross buckets by construction; NULL text dropped
        assert 41 not in set(got["doc_id"])


class TestTokenBatches:
    def test_iter_token_batches_shapes_and_content(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from calendar_event_entity_extraction_ray.functions.tokenizer import (
            ToyTokenizer,
        )
        from calendar_event_entity_extraction_ray.pipelines.traindata import (
            iter_token_batches,
        )

        seqs = pd.DataFrame({
            "bucket": pd.array([0, 0, 1], dtype="int64"),
            "bin": pd.array([0, 1, 0], dtype="int64"),
            "n_docs": pd.array([1, 1, 1], dtype="int64"),
            "n_tok": pd.array([3, 2, 300], dtype="int64"),
            "seq_text": ["a b c", "d e", "tok " * 300],
        })
        ds = ray.data.from_pandas(seqs)
        got = list(iter_token_batches(ds, seq_len=8, batch_size=2))
        mats = np.concatenate([m for m, _ in got])
        lens = np.concatenate([n for _, n in got])
        assert mats.shape == (3, 8) and mats.dtype == np.int32
        tok = ToyTokenizer(32768)
        order = np.argsort(lens)  # 2, 3, 8 after truncation
        assert sorted(lens.tolist()) == [2, 3, 8]
        # padded tail is id 0; ids match the deterministic tokenizer
        row3 = mats[lens == 3][0]
        assert row3[:3].tolist() == tok.encode("a b c")
        assert row3[3:].tolist() == [0] * 5
        row8 = mats[lens == 8][0]
        assert row8.tolist() == tok.encode("tok " * 300)[:8]
