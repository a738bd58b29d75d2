"""stages/vecstore.py — persisted IVF vector store: build, prune, query."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray

    from calendar_event_entity_extraction_ray.stages.vecstore import (
        build_ivf_store,
    )

    rng = np.random.default_rng(4)
    centers = rng.normal(size=(8, 16)) * 5
    vecs = np.concatenate(
        [c + rng.normal(size=(400, 16)) * 0.1 for c in centers])
    ids = np.arange(len(vecs))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float64)),
                              pa.list_(pa.float64())),
    })).repartition(6)
    out = str(tmp_path_factory.mktemp("vstore") / "ivf")
    manifest = build_ivf_store(ds, out, n_cells=8, sample_size=1600)
    return out, manifest, vecs, ds


class TestIvfStore:
    def test_build_layout(self, store):
        import os

        out, manifest, vecs, _ = store
        assert manifest["n_cells"] == 8
        assert sum(e["rows"] for e in manifest["cells"].values()) \
            == len(vecs)
        for e in manifest["cells"].values():
            assert os.path.exists(os.path.join(out, e["file"]))

    def test_query_prunes_and_recalls(self, store):
        from calendar_event_entity_extraction_ray.stages.knn import (
            knn_bruteforce,
        )
        from calendar_event_entity_extraction_ray.stages.vecstore import (
            query_ivf_store,
        )

        out, _, vecs, ds = store
        qidx = [3, 555, 1777, 3100]
        res = query_ivf_store(out, vecs[qidx], k=5, n_probe=2).to_pandas()
        assert query_ivf_store.last_files_read \
            < query_ivf_store.total_cells
        for qi, vid in enumerate(qidx):
            got = res[res.query_id == qi]
            # rank-1 hit is the query vector itself
            assert int(got[got["rank"] == 1]["vec_id"].iloc[0]) == vid
            brute = knn_bruteforce(ds, vecs[vid], k=5).to_pandas()
            overlap = set(got["vec_id"]) & set(brute["vec_id"])
            assert len(overlap) >= 4   # separated clusters: near-exact

    def test_rebuild_deterministic(self, store, tmp_path):
        import json
        import os

        from calendar_event_entity_extraction_ray.stages.vecstore import (
            build_ivf_store,
            query_ivf_store,
        )

        out, manifest, vecs, ds = store
        out2 = str(tmp_path / "ivf2")
        m2 = build_ivf_store(ds, out2, n_cells=8, sample_size=1600)
        assert m2["centroids"] == manifest["centroids"]
        r1 = query_ivf_store(out, vecs[:2], k=5, n_probe=2).to_pandas()
        r2 = query_ivf_store(out2, vecs[:2], k=5, n_probe=2).to_pandas()
        assert r1.equals(r2)
