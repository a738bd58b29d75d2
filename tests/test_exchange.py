"""stages/exchange.py — the generic two-phase hash exchange."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from calendar_event_entity_extraction_ray.stages import exchange as X


def _ident(t: pa.Table) -> pa.Table:
    return t


class TestHashPartitionMap:
    def test_partition_integrity_and_colocation(self, ray_session):
        """Every row lands in exactly one partition; equal hashes co-locate."""
        import ray

        n = X.SMALL_ROWS + 5000  # force the real (disk) exchange
        h = np.arange(n, dtype=np.int64) % 1000  # 1000 distinct keys
        ds = ray.data.from_arrow(pa.table({
            "h": pa.array(h), "v": pa.array(np.arange(n, dtype=np.int64)),
        })).repartition(20)

        seen_parts = {}

        def fold(t: pa.Table) -> pa.Table:
            # one fold call per partition: record which keys it saw
            ks = sorted(set(t.column("h").to_pylist()))
            return pa.table({
                "k": pa.array(ks, pa.int64()),
                "n": pa.array(
                    [t.filter(pa.compute.equal(t.column("h"), k)).num_rows
                     for k in ks], pa.int64()),
            })

        out = X.hash_partition_map(ds, "h", fold, num_partitions=16).to_pandas()
        # each key appears in exactly ONE partition's fold output
        assert len(out) == 1000
        assert int(out["n"].sum()) == n
        per_key = out.groupby("k")["n"].sum()
        assert (per_key == n // 1000).all()

    def test_small_path_single_fold(self, ray_session):
        """Below SMALL_ROWS the fold sees the WHOLE dataset once."""
        import ray

        ds = ray.data.from_items(
            [{"h": i % 7, "v": i} for i in range(500)]).repartition(8)
        calls = []

        def fold(t: pa.Table) -> pa.Table:
            calls.append(t.num_rows)
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        out = X.hash_partition_map(ds, "h", fold).to_pandas()
        assert out["rows"].tolist() == [500]

    def test_stale_attempt_files_are_ignored(self, ray_session, tmp_path,
                                             monkeypatch):
        """The attempt-commit protocol: phase 2 reads ONLY files listed by
        the surviving attempt — a stale duplicate file from a retried task
        (simulated by pre-planting one; the exchange's pre-clean rmtree is
        suppressed for the first call so the plant survives) must not
        duplicate rows."""
        import shutil

        import ray

        orig_rmtree = shutil.rmtree
        calls = {"n": 0}

        def fake_rmtree(path, ignore_errors=False):
            calls["n"] += 1
            if calls["n"] == 1:  # skip the pre-clean only
                return
            orig_rmtree(path, ignore_errors=ignore_errors)

        monkeypatch.setattr(X.shutil, "rmtree", fake_rmtree)

        spill_root = str(tmp_path / "spill")
        n = X.SMALL_ROWS + 1000
        ds = ray.data.from_arrow(pa.table({
            "h": pa.array(np.arange(n, dtype=np.int64) % 4),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        })).repartition(4)

        os.makedirs(os.path.join(spill_root, "part=0"), exist_ok=True)
        # stale attempt: valid parquet, right shape, NOT in any summary
        pq.write_table(pa.table({"h": pa.array([0], pa.int64()),
                                 "v": pa.array([10_000], pa.int64())}),
                       os.path.join(spill_root, "part=0", "stale.parquet"))

        def fold(t: pa.Table) -> pa.Table:
            s = int(pa.compute.sum(t.column("v")).as_py())
            return pa.table({"sum_v": pa.array([s], pa.int64())})

        out = X.hash_partition_map(ds, "h", fold, num_partitions=4,
                                   spill_root=spill_root).to_pandas()
        assert int(out["sum_v"].sum()) == n  # stale file contributed nothing

    def test_empty_input_preserves_fold_schema(self, ray_session):
        import ray

        ds = ray.data.from_arrow(pa.table({
            "h": pa.array([], pa.int64()), "v": pa.array([], pa.string())}))

        def fold(t: pa.Table) -> pa.Table:
            return t.select(["v"])

        out = X.hash_partition_map(ds, "h", fold)
        # the fold ran on the schema-bearing empty table (no crash); Ray's
        # to_pandas() of an empty dataset drops column names (Ray quirk —
        # ray.data.from_arrow(empty).to_pandas() is column-less upstream
        # too), so only the row count is assertable here
        assert out.count() == 0
        refs = out.to_arrow_refs()
        import ray as _ray

        tables = _ray.get(refs)
        assert any(t.schema.names == ["v"] for t in tables)


class TestCrashInjection:
    def test_spill_task_worker_loss_is_exactly_once(self, ray_session,
                                                    tmp_path):
        """REAL retry, not a simulation: one spill task hard-kills its
        worker (os._exit) AFTER writing spill files, BEFORE returning its
        attempt commit. Ray retries the task; the retry's files are the
        only ones listed, so the dead attempt's orphans must contribute
        nothing — result identical to an uninjected control run."""
        import ray

        n = 40_000
        tbl = pa.table({
            "h": pa.array(np.arange(n, dtype=np.int64) % 97),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        })

        def fold(t: pa.Table) -> pa.Table:
            ks = pa.TableGroupBy(t, "h").aggregate([("v", "sum")])
            return ks.rename_columns(["h", "sum_v"])

        control = X.hash_partition_map(
            ray.data.from_arrow(tbl).repartition(8), "h", fold,
            num_partitions=8).to_pandas().sort_values("h")

        sentinel = str(tmp_path / "crash_once")
        out = X.hash_partition_map(
            ray.data.from_arrow(tbl).repartition(8), "h", fold,
            num_partitions=8,
            _crash_sentinel=sentinel).to_pandas().sort_values("h")

        assert os.path.exists(sentinel), "injection never fired"
        pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                      control.reset_index(drop=True))
        assert int(out["sum_v"].sum()) == n
