"""SemDeDup (stages/semdedup.py): distributed-vs-mirror parity, planted
near-duplicate recovery, keep-smallest-id rule, bounded giant-cluster
chunking."""

import numpy as np
import pandas as pd
import pytest

from calendar_event_entity_extraction_ray.stages.semdedup import (
    cluster_drop_ids,
    semdedup_single_process,
)


def _make_ds(ids, vecs):
    import pyarrow as pa
    import ray

    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs],
                                        pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(6)


class TestSemDedup:
    def test_distributed_matches_single_process(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.semdedup import (
            semdedup_drop,
        )

        rng = np.random.RandomState(4)
        base = rng.randn(400, 16)
        # plant 100 near-copies of the first 100 rows
        dups = base[:100] + rng.randn(100, 16) * 0.01
        vecs = np.vstack([base, dups]).astype(np.float32)
        ids = np.arange(500, dtype=np.int64)
        ds = _make_ds(ids, vecs)

        got = (semdedup_drop(ds, k=6, tau=0.95).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
        dd, ll = semdedup_single_process(ids, vecs.astype(np.float64),
                                         k=6, tau=0.95)
        assert got["vec_id"].tolist() == dd.tolist()
        assert got["cluster"].tolist() == ll.tolist()
        # every planted copy must drop (its original has a smaller id and
        # cosine ~1 keeps the pair in one k-means cell)
        assert set(range(400, 500)) <= set(got["vec_id"])
        # originals with no planted twin survive
        assert not (set(range(100, 400)) & set(got["vec_id"]))

    def test_keep_smallest_id(self):
        ids = np.array([7, 3, 5], dtype=np.int64)
        m = np.array([[1.0, 0.0], [1.0, 0.001], [0.0, 1.0]])
        # 7 and 3 are near-identical: 3 (smallest id) survives, 7 drops
        assert cluster_drop_ids(ids, m, 0.99).tolist() == [7]

    def test_giant_cluster_chunked_path_is_deterministic(self):
        """Above max_cluster_size the windowed comparison must still drop
        adjacent-id duplicates and stay a pure function."""
        rng = np.random.RandomState(1)
        m = rng.randn(600, 8)
        m[1::2] = m[0::2] + rng.randn(300, 8) * 1e-4  # twin per even row
        ids = np.arange(600, dtype=np.int64)
        a = cluster_drop_ids(ids, m, 0.999, max_cluster_size=100)
        b = cluster_drop_ids(ids, m, 0.999, max_cluster_size=100)
        assert a.tolist() == b.tolist()
        assert set(ids[1::2]) <= set(a.tolist())
        full = cluster_drop_ids(ids, m, 0.999)
        # windowing may only LOSE far-apart pairs, never invent drops
        assert set(a.tolist()) <= set(full.tolist())

    def test_no_dups_drops_nothing(self, ray_session):
        from calendar_event_entity_extraction_ray.stages.semdedup import (
            semdedup_drop,
        )

        vecs = np.eye(12, dtype=np.float32)  # orthonormal: all cos = 0
        ds = _make_ds(np.arange(12, dtype=np.int64), vecs)
        out = semdedup_drop(ds, k=3, tau=0.5)
        assert out.count() == 0
        assert set(out.schema().names) == {"vec_id", "cluster"}
