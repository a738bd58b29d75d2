"""stages/graph.py — distributed connected components vs union-find."""

import numpy as np
import pyarrow as pa
import pytest


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


class TestConnectedComponents:
    @pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 60, 40)])
    def test_matches_union_find(self, ray_session, seed, n_nodes, n_edges):
        import ray

        from calendar_event_entity_extraction_ray.stages.graph import (
            connected_components,
        )

        rng = np.random.RandomState(seed)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, n_nodes, size=(n_edges, 2)) if a != b]
        nodes = sorted({x for e in edges for x in e})
        expect = _union_find(edges, nodes)

        ds = ray.data.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        })).repartition(4)
        got = connected_components(ds, "a", "b").to_pandas()
        assert len(got) == len(nodes)
        got_map = dict(zip(got["node"].astype(int), got["cluster"].astype(int)))
        assert got_map == expect

        # explicit num_partitions forces the ITERATIVE (100TB-shape) path —
        # the small-input union-find shortcut must agree with it exactly
        got_iter = connected_components(
            ds, "a", "b", num_partitions=2).to_pandas()
        iter_map = dict(zip(got_iter["node"].astype(int),
                            got_iter["cluster"].astype(int)))
        assert iter_map == expect

    def test_chain_needs_iterations(self, ray_session):
        """A path graph (worst-case diameter) must still converge to one
        component labeled by the minimum node."""
        import ray

        from calendar_event_entity_extraction_ray.stages.graph import (
            connected_components,
        )

        n = 17
        ds = ray.data.from_arrow(pa.table({
            "a": pa.array(list(range(n - 1)), pa.int64()),
            "b": pa.array(list(range(1, n)), pa.int64()),
        })).repartition(3)
        # num_partitions forces the iterative path (the adaptive shortcut
        # would solve a 17-node chain in one union-find task)
        got = connected_components(ds, "a", "b", num_partitions=2).to_pandas()
        assert set(got["cluster"].astype(int)) == {0}
        assert len(got) == n


class TestPageRank:
    def test_iterative_matches_single_task(self, ray_session):
        """The distributed join-per-round path must agree with the
        single-task kernel (±1 on the 1e-9-scaled ranks: float sums
        accumulate in different orders across partitions)."""
        import ray

        from calendar_event_entity_extraction_ray.stages.graph import pagerank

        rng = np.random.RandomState(2)
        edges = [(int(a), int(b)) for a, b in
                 rng.randint(0, 80, size=(200, 2)) if a != b]
        ds = ray.data.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        })).repartition(4)
        small = pagerank(ds, "a", "b").to_pandas()
        iterative = pagerank(ds, "a", "b", num_partitions=2).to_pandas()
        m_s = dict(zip(small["node"], small["rank_e9"]))
        m_i = dict(zip(iterative["node"], iterative["rank_e9"]))
        assert m_s.keys() == m_i.keys()
        assert all(abs(m_s[n] - m_i[n]) <= 1 for n in m_s)
        # probability mass ~1 (floor-scaled)
        assert abs(sum(m_s.values()) - 10**9) < len(m_s) + 10
