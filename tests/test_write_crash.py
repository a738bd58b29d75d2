"""Worker-loss crash injection for the durable WRITE paths (round-4
verdict item 3): the exchange's attempt-commit protocol is already
pinned (tests/test_exchange.py::TestCrashInjection); these tests kill a
REAL worker (os._exit via stages/exchange.py:claim_crash_sentinel)
inside the write tasks of the graph materialize, the corpus writer and
the vector-store delta append — AFTER the durable file lands, BEFORE
the attempt returns — and require manifest-level exactness: output and
manifest byte/row-identical to an uninjected control run."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _read_parts(out_dir: str) -> pd.DataFrame:
    frames = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "data.parquet")
        if d.startswith("part_key=") and os.path.exists(p):
            frames.append(pq.read_table(p).to_pandas())
    return (pd.concat(frames, ignore_index=True) if frames
            else pd.DataFrame())


class TestMaterializeCrash:
    def test_merge_worker_loss_manifest_exact(self, ray_session, tmp_path):
        import ray

        from calendar_event_entity_extraction_ray.pipelines.kg import (
            materialize_graph,
        )

        n = 3000
        rng = np.random.RandomState(7)
        tbl = pa.table({
            "subj": pa.array([f"ent{i}" for i in rng.randint(0, 400, n)]),
            "pred": pa.array([f"p{i}" for i in rng.randint(0, 5, n)]),
            "obj": pa.array([f"o{i}" for i in np.arange(n)]),
            "kind": pa.array(["event"] * n),
            "url": pa.array([f"u{i}" for i in np.arange(n)]),
            "warc_ts": pa.array(["2025-01-01"] * n),
        })

        def run(out, sentinel=None):
            m = materialize_graph(
                ray.data.from_arrow(tbl).repartition(6), out, "fp1",
                num_partitions=4, _crash_sentinel=sentinel)
            return m, _read_parts(out)

        m_ok, df_ok = run(str(tmp_path / "ctl"))
        sentinel = str(tmp_path / "boom_mat")
        m_cr, df_cr = run(str(tmp_path / "cr"), sentinel)
        assert os.path.exists(sentinel), "injection never fired"
        assert {k: v["rows"] for k, v in m_ok["partitions"].items()} \
            == {k: v["rows"] for k, v in m_cr["partitions"].items()}
        pd.testing.assert_frame_equal(df_ok, df_cr)
        assert len(df_cr) == n


class TestWriteCorpusCrash:
    def test_fold_worker_loss_manifest_exact(self, ray_session, tmp_path):
        import ray

        from calendar_event_entity_extraction_ray.pipelines.corpus import (
            write_corpus,
        )

        n = 5000
        tbl = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"document body {i}" for i in range(n)]),
        })

        def run(out, sentinel=None):
            m = write_corpus(
                ray.data.from_arrow(tbl).repartition(6), out, "fp1",
                num_partitions=4, _crash_sentinel=sentinel)
            return m, _read_parts(out)

        m_ok, df_ok = run(str(tmp_path / "ctl"))
        sentinel = str(tmp_path / "boom_wc")
        m_cr, df_cr = run(str(tmp_path / "cr"), sentinel)
        assert os.path.exists(sentinel), "injection never fired"
        assert {k: v["rows"] for k, v in m_ok["partitions"].items()} \
            == {k: v["rows"] for k, v in m_cr["partitions"].items()}
        pd.testing.assert_frame_equal(df_ok, df_cr)
        assert len(df_cr) == n


class TestVecstoreAppendCrash:
    def test_delta_worker_loss_manifest_exact(self, ray_session, tmp_path):
        import ray

        from calendar_event_entity_extraction_ray.stages.vecstore import (
            append_ivf_store,
            build_ivf_store,
        )

        rng = np.random.RandomState(3)

        def vecs(lo, hi):
            return pa.table({
                "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": pa.array(
                    list(rng.randn(hi - lo, 8).astype(np.float64))),
            })

        base = vecs(0, 400)
        delta = vecs(400, 600)

        def run(out, sentinel=None):
            build_ivf_store(ray.data.from_arrow(base), out, n_cells=8)
            m = append_ivf_store(
                ray.data.from_arrow(delta).repartition(4), out, "day2",
                _crash_sentinel=sentinel)
            files = {}
            for d in sorted(os.listdir(out)):
                dp = os.path.join(out, d)
                if d.startswith("cell=") and os.path.isdir(dp):
                    for f in sorted(os.listdir(dp)):
                        if f.startswith("delta-"):
                            files[os.path.join(d, f)] = (
                                pq.read_table(os.path.join(dp, f))
                                .to_pandas())
            return m, files

        m_ok, files_ok = run(str(tmp_path / "ctl"))
        sentinel = str(tmp_path / "boom_vs")
        m_cr, files_cr = run(str(tmp_path / "cr"), sentinel)
        assert os.path.exists(sentinel), "injection never fired"
        assert m_ok["epochs"] == m_cr["epochs"] == ["day2"]

        def delta_entries(m):
            return {c: e.get("deltas") for c, e in m["cells"].items()
                    if e.get("deltas")}

        assert delta_entries(m_ok) == delta_entries(m_cr)
        assert sorted(files_ok) == sorted(files_cr)
        for k in files_ok:
            pd.testing.assert_frame_equal(files_ok[k], files_cr[k])
        assert sum(len(df) for df in files_cr.values()) == 200
