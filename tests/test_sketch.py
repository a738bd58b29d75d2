"""HyperLogLog sketch: accuracy, mergeability, serialization."""

from __future__ import annotations

from calendar_event_entity_extraction_ray.functions.sketch import HyperLogLog


class TestHLL:
    def test_accuracy_within_2pct(self):
        h = HyperLogLog(p=12)
        n = 50_000
        h.add_many(f"user-{i}" for i in range(n))
        est = h.estimate()
        assert abs(est - n) / n < 0.02

    def test_merge_equals_union(self):
        a = HyperLogLog(p=12).add_many(f"x{i}" for i in range(10_000))
        b = HyperLogLog(p=12).add_many(f"x{i}" for i in range(5_000, 15_000))
        u = HyperLogLog(p=12).add_many(f"x{i}" for i in range(15_000))
        a.merge(b)
        assert abs(a.estimate() - u.estimate()) < 1e-9  # identical registers

    def test_serialize_roundtrip(self):
        h = HyperLogLog(p=10).add_many(str(i) for i in range(1000))
        h2 = HyperLogLog.deserialize(h.serialize())
        assert h2.estimate() == h.estimate()

    def test_small_cardinality_linear_counting(self):
        h = HyperLogLog(p=12).add_many(["a", "b", "c", "a"])
        assert round(h.estimate()) == 3

    def test_none_skipped(self):
        h = HyperLogLog(p=12).add_many(["a", None, "b"])
        assert round(h.estimate()) == 2


class TestMisraGries:
    def test_guarantees_and_merge(self):
        import numpy as np

        from calendar_event_entity_extraction_ray.functions.sketch import (
            MisraGries,
        )

        rng = np.random.RandomState(0)
        items = list(rng.zipf(1.5, 100_000) % 1000)
        k = 50
        a = MisraGries(k=k).add_many(items[:50_000])
        b = MisraGries(k=k).add_many(items[50_000:])
        a.merge(MisraGries.deserialize(b.serialize(), k=k))
        from collections import Counter

        true = Counter(items)
        n = len(items)
        for x, cnt in true.most_common(5):
            est = a.counters.get(x, 0)
            # frequent-items guarantee: undercount bounded by n/(k+1),
            # never overcount
            assert cnt - n / (k + 1) <= est <= cnt
        assert len(a.counters) <= k


class TestQuantileSketch:
    def test_rank_error_and_merge(self):
        import numpy as np

        from calendar_event_entity_extraction_ray.functions.sketch import (
            QuantileSketch,
        )

        rng = np.random.RandomState(1)
        vals = rng.lognormal(0, 1, 100_000)
        merged = QuantileSketch(k=256)
        for p in np.array_split(vals, 20):
            merged.merge(QuantileSketch.deserialize(
                QuantileSketch(k=256).add_many(p.tolist()).serialize()))
        s = np.sort(vals)
        for q in (0.1, 0.5, 0.9, 0.99):
            est = merged.quantile(q)
            rank = np.searchsorted(s, est, side="right") / len(s)
            assert abs(rank - q) < 0.02, (q, rank)

    def test_deterministic_and_edge_cases(self):
        from calendar_event_entity_extraction_ray.functions.sketch import (
            QuantileSketch,
        )

        a = QuantileSketch(k=16).add_many([5.0, None, float("nan"), 1.0])
        b = QuantileSketch(k=16).add_many([5.0, None, float("nan"), 1.0])
        assert a.levels == b.levels
        assert a.quantile(0.0) == 1.0 and a.quantile(1.0) == 5.0
        import math

        assert math.isnan(QuantileSketch().quantile(0.5))


class TestGroupedHeavyHitters:
    def test_per_group_guarantee_on_zipf(self, ray_session):
        """Every item with true count > group_n/(k+1) survives in its
        group's counter set with an estimate inside the guaranteed
        undercount band — under distributed batching and merge."""
        import collections

        import numpy as np
        import pyarrow as pa
        import ray

        from calendar_event_entity_extraction_ray.stages.aggregate import (
            grouped_heavy_hitters,
        )

        rng = np.random.RandomState(11)
        K = 32
        rows = []
        truth = {}
        for g in ["a", "b"]:
            items = rng.zipf(1.5, 20000) % 500  # heavy skew
            truth[g] = collections.Counter(items.tolist())
            rows.append(pa.table({
                "g": pa.array([g] * len(items)),
                "v": pa.array(items.astype(np.int64))}))
        ds = ray.data.from_arrow(pa.concat_tables(rows)).repartition(16)
        out = grouped_heavy_hitters(ds, "g", "v", k=K).to_pandas()
        est = {(r["g"], r["v"]): r["mg_est"] for _, r in out.iterrows()}
        gn = {(r["g"],): r["group_n"] for _, r in out.iterrows()}
        for g in ["a", "b"]:
            n = sum(truth[g].values())
            assert gn[(g,)] == n
            bound = n / (K + 1)
            for item, true_c in truth[g].items():
                if true_c > bound:
                    assert (g, item) in est, (g, item, true_c, bound)
                    assert true_c - bound <= est[(g, item)] <= true_c


class TestCountMin:
    def test_never_undercounts_and_eps_bound(self):
        import collections

        import numpy as np

        from calendar_event_entity_extraction_ray.functions.sketch import (
            CountMin,
        )

        rng = np.random.default_rng(7)
        items = rng.zipf(1.5, 50_000)
        items = items[items < 10_000].tolist()
        true = collections.Counter(items)
        cm = CountMin(w=4096, d=5).add_many(items)
        n = len(items)
        eps = np.e / 4096
        keys = list(true)
        ests = cm.estimate_many(keys)
        for k, est in zip(keys, ests):
            assert est >= true[k]                 # CM never undercounts
            assert est <= true[k] + eps * n + 1   # CM overcount bound

    def test_merge_equals_single_pass(self):
        from calendar_event_entity_extraction_ray.functions.sketch import (
            CountMin,
        )

        a = CountMin(w=512, d=4).add_many([f"k{i % 50}" for i in range(3000)])
        b = CountMin(w=512, d=4).add_many([f"k{i % 70}" for i in range(2000)])
        both = CountMin(w=512, d=4).add_many(
            [f"k{i % 50}" for i in range(3000)]
            + [f"k{i % 70}" for i in range(2000)])
        a.merge(b)
        assert (a.table == both.table).all()

    def test_serialize_roundtrip_and_none(self):
        from calendar_event_entity_extraction_ray.functions.sketch import (
            CountMin,
        )

        cm = CountMin(w=256, d=3).add_many(["a", None, "b", "a"])
        cm2 = CountMin.deserialize(cm.serialize())
        assert cm2.estimate("a") == cm.estimate("a") == 2
        assert cm2.estimate("b") == 1
        assert cm2.estimate("zzz") <= 4  # collisions only
