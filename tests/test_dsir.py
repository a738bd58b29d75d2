"""DSIR importance resampling (stages/dsir.py): distributed-vs-mirror
bit parity, planted target preference, degenerate inputs."""

import numpy as np
import pandas as pd
import pytest


def _mirror_scores(ids, texts, target_texts, num_buckets=4096):
    from calendar_event_entity_extraction_ray.stages.dsir import (
        bucket_count_partial,
        dsir_doc_scores,
        lam_e6_table,
    )

    p = bucket_count_partial(target_texts, num_buckets)
    q = bucket_count_partial(texts, num_buckets)
    return dsir_doc_scores(ids, texts, lam_e6_table(p, q))


class TestDsir:
    def test_distributed_matches_single_process(self, ray_session):
        """Partitioning must not change a single bit: integer bucket
        partials commute, lam/gumbel are shared kernels."""
        import ray

        from calendar_event_entity_extraction_ray.stages.dsir import (
            dsir_score,
        )

        vocab = np.array([f"w{i}" for i in range(300)])
        rng = np.random.RandomState(7)
        texts = [" ".join(vocab[rng.randint(0, 300, 15)])
                 for _ in range(4_000)]
        df = pd.DataFrame({"doc_id": np.arange(4_000, dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df).repartition(8)
        target = ray.data.from_pandas(df.iloc[:800]).repartition(4)

        got = (dsir_score(target, ds).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        ids, sc, ng = _mirror_scores(df["doc_id"].tolist(),
                                     df["text"].tolist(),
                                     df["text"].iloc[:800].tolist())
        assert np.array_equal(got["doc_id"].to_numpy(), ids)
        assert np.array_equal(got["dsir_logratio_e6"].to_numpy(), sc)
        assert np.array_equal(got["n_grams"].to_numpy(), ng)

    def test_select_prefers_target_like_docs(self, ray_session):
        """Planted two-topic corpus: the Gumbel-top-k resample must be
        dominated by docs sharing the target's vocabulary."""
        import ray

        from calendar_event_entity_extraction_ray.stages.dsir import (
            dsir_select,
        )

        rng = np.random.RandomState(3)
        wiki = np.array([f"wiki{i}" for i in range(100)])
        spam = np.array([f"spam{i}" for i in range(100)])
        wiki_docs = [" ".join(wiki[rng.randint(0, 100, 20)])
                     for _ in range(300)]
        spam_docs = [" ".join(spam[rng.randint(0, 100, 20)])
                     for _ in range(300)]
        df = pd.DataFrame({
            "doc_id": np.arange(600, dtype=np.int64),
            "text": wiki_docs + spam_docs})
        ds = ray.data.from_pandas(df).repartition(4)
        # target: a DISJOINT fresh sample of wiki-topic docs
        tgt = pd.DataFrame({"text": [
            " ".join(wiki[rng.randint(0, 100, 20)]) for _ in range(200)]})
        target = ray.data.from_pandas(tgt)

        out = dsir_select(target, ds, k=100).to_pandas()
        assert len(out) == 100
        wiki_frac = (out["doc_id"] < 300).mean()
        assert wiki_frac > 0.95

    def test_select_is_the_global_gumbel_topk(self, ray_session):
        """The per-block partial top-k + fold must equal the exact global
        top-k by (key desc, id asc) of the mirror."""
        import ray

        from calendar_event_entity_extraction_ray.stages.dsir import (
            dsir_select,
            gumbel_keys,
        )

        vocab = np.array([f"t{i}" for i in range(50)])
        rng = np.random.RandomState(9)
        texts = [" ".join(vocab[rng.randint(0, 50, 10)])
                 for _ in range(1_000)]
        df = pd.DataFrame({"doc_id": np.arange(1_000, dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df).repartition(6)
        target = ray.data.from_pandas(df.iloc[:100])

        out = dsir_select(target, ds, k=37).to_pandas()
        ids, sc, _ = _mirror_scores(df["doc_id"].tolist(),
                                    df["text"].tolist(),
                                    df["text"].iloc[:100].tolist())
        key = gumbel_keys(ids, sc)
        mdf = (pd.DataFrame({"doc_id": ids, "k": key})
               .sort_values(["k", "doc_id"], ascending=[False, True])
               .head(37))
        assert out["doc_id"].tolist() == mdf["doc_id"].tolist()

    def test_degenerate_docs(self, ray_session):
        """Empty strings score (one unigram); non-str rows drop; every
        scored doc reports its gram-occurrence count."""
        import ray

        from calendar_event_entity_extraction_ray.stages.dsir import (
            dsir_score,
        )

        df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                           "text": ["", "a b", None, "a a a"]})
        ds = ray.data.from_pandas(df)
        out = (dsir_score(ds, ds).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [1, 2, 4]
        # "" -> 1 unigram; "a b" -> 2 uni + 1 bi; "a a a" -> 3 uni + 2 bi
        assert out["n_grams"].tolist() == [1, 3, 5]
