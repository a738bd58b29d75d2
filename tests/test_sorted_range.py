"""read_sorted_range: manifest zone-map pruning over write_sorted
exports (stages/sort.py)."""

from __future__ import annotations


class TestReadSortedRange:
    def _export(self, tmp_path, n=5000, parts=8):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from calendar_event_entity_extraction_ray.stages.sort import (
            write_sorted,
        )

        rng = np.random.default_rng(5)
        vals = rng.uniform(0, 1000, n)
        t = pa.table({"rid": pa.array(np.arange(n, dtype=np.int64)),
                      "v": pa.array(vals)})
        d = str(tmp_path / "sorted")
        write_sorted(ray.data.from_arrow(t), "v", d,
                     fingerprint="t", num_partitions=parts)
        return d, vals

    def test_prunes_and_loses_nothing(self, ray_session, tmp_path):
        import numpy as np

        from calendar_event_entity_extraction_ray.stages.sort import (
            pruned_partition_files,
            read_sorted_range,
        )

        d, vals = self._export(tmp_path)
        lo, hi = 100.0, 250.0
        pruned = pruned_partition_files(d, lo, hi)
        total = len(pruned_partition_files(d))
        assert 0 < len(pruned) < total  # the zone map really prunes
        got = read_sorted_range(d, lo, hi).to_pandas()
        want = np.sum((vals >= lo) & (vals <= hi))
        assert len(got) == want
        assert got["v"].between(lo, hi).all()

    def test_open_ended_ranges(self, ray_session, tmp_path):
        import numpy as np

        from calendar_event_entity_extraction_ray.stages.sort import (
            read_sorted_range,
        )

        d, vals = self._export(tmp_path)
        assert (read_sorted_range(d, lo=900.0).count()
                == int(np.sum(vals >= 900.0)))
        assert (read_sorted_range(d, hi=50.0).count()
                == int(np.sum(vals <= 50.0)))
        assert read_sorted_range(d).count() == len(vals)

    def test_empty_range_keeps_schema(self, ray_session, tmp_path):
        from calendar_event_entity_extraction_ray.stages.sort import (
            read_sorted_range,
        )

        d, _ = self._export(tmp_path)
        out = read_sorted_range(d, lo=5000.0, hi=6000.0)
        assert out.count() == 0
        assert out.schema().names == ["rid", "v"]

    def test_projection_pushdown(self, ray_session, tmp_path):
        from calendar_event_entity_extraction_ray.stages.sort import (
            read_sorted_range,
        )

        d, _ = self._export(tmp_path)
        out = read_sorted_range(d, 100.0, 200.0, columns=["rid"])
        assert out.schema().names == ["rid"]
