"""Graph-analytics scale datapoints with planted closed-form truth:
k-core peeling and BFS hop distances on multi-million-edge graphs.

Constructions (all edge counts / memberships exact by design):

  kcore: a ring of R nodes (degree 2 everywhere) + C disjoint 100-node
    cliques on a separate id range. At k=3 the whole ring peels in one
    round and exactly the 100*C clique nodes survive, each with deg 99.
    --cascade instead plants a complete binary tree of the given depth
    (leaves peel first, each removal drags the parent below k=2 next
    round — one peel round PER LEVEL, the multi-round worst case).

  bfs: a perfect 10-ary heap tree (node i's parent = (i-1)//10) —
    dist(node i) = its heap depth, closed form; the frontier widens 10x
    per round (the wide-frontier regime, unlike a ring where BFS only
    ever touches 2 nodes per round).

  pagerank: the same ring — 2-regular, so the stationary distribution is
    EXACTLY uniform and every node must publish floor(1e9/n + 0.5).

    python scripts/scale_graph_check.py --op kcore --ring 10000000 --cliques 100
    python scripts/scale_graph_check.py --op kcore --cascade --depth 18
    python scripts/scale_graph_check.py --op bfs --nodes 5000000
    python scripts/scale_graph_check.py --op pagerank --ring 10000000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa


def ring_edges(batch: pa.Table, n: int) -> pa.Table:
    i = batch.column("id").to_numpy()
    return pa.table({"a": pa.array(i.astype(np.int64)),
                     "b": pa.array(((i + 1) % n).astype(np.int64))})


def clique_edges(n_cliques: int, size: int, base: int) -> pa.Table:
    a, b = [], []
    iu = np.triu_indices(size, k=1)
    for c in range(n_cliques):
        off = base + c * size
        a.append(iu[0] + off)
        b.append(iu[1] + off)
    return pa.table({"a": pa.array(np.concatenate(a).astype(np.int64)),
                     "b": pa.array(np.concatenate(b).astype(np.int64))})


def tree_edges(batch: pa.Table, arity: int) -> pa.Table:
    i = batch.column("id").to_numpy().astype(np.int64)
    i = i[i > 0]
    return pa.table({"a": pa.array(i), "b": pa.array((i - 1) // arity)})


def heap_depth(n: int, arity: int) -> np.ndarray:
    """Exact heap level per node: level L spans
    [(a^L - 1)/(a - 1), (a^(L+1) - 1)/(a - 1))."""
    d = np.zeros(n, dtype=np.int64)
    lo, depth = 1, 1
    while lo < n:
        hi = min(n, lo * arity + 1)
        d[lo:hi] = depth
        lo, depth = hi, depth + 1
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="kcore",
                    choices=["kcore", "bfs", "pagerank", "walks", "cc"])
    ap.add_argument("--ring", type=int, default=10_000_000)
    ap.add_argument("--cliques", type=int, default=100)
    ap.add_argument("--cascade", action="store_true")
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--nodes", type=int, default=5_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from calendar_event_entity_extraction_ray.stages.graph import (
        bfs_distances,
        k_core,
    )

    blocks = max(int(ray.cluster_resources().get("CPU", 8)) * 4, 8)
    rec = {"num_cpus": int(ray.cluster_resources().get("CPU", 8))}

    if args.op == "kcore" and not args.cascade:
        n = args.ring
        ring = ray.data.range(n, override_num_blocks=blocks).map_batches(
            lambda b: ring_edges(b, n), batch_format="pyarrow")
        cl = ray.data.from_arrow(clique_edges(args.cliques, 100, n))
        edges = ring.union(cl)
        n_edges = n + args.cliques * 4950
        t0 = time.time()
        out = k_core(edges, "a", "b", 3, num_partitions=blocks)
        import pyarrow.compute as pc
        agg = out.map_batches(
            lambda b: pa.table({
                "n": pa.array([b.num_rows], pa.int64()),
                "deg_ok": pa.array([int(pc.all(
                    pc.equal(b.column("deg"), 99)).as_py() or b.num_rows == 0)
                ], pa.int64())}),
            batch_format="pyarrow").to_pandas()
        wall = time.time() - t0
        got, deg_ok = int(agg.n.sum()), bool(agg.deg_ok.min())
        expect = args.cliques * 100
        ok = got == expect and deg_ok
        rec.update({"metric": "kcore_scale", "ring": n,
                    "n_edges": n_edges, "core_nodes": got,
                    "expect": expect, "deg99_everywhere": deg_ok,
                    "ok": bool(ok), "wall_sec": round(wall, 1),
                    "edges_per_sec": round(n_edges / wall, 1)})
    elif args.op == "kcore":
        n = (1 << (args.depth + 1)) - 1  # complete binary tree node count
        tree = ray.data.range(n, override_num_blocks=blocks).map_batches(
            lambda b: tree_edges(b, 2), batch_format="pyarrow")
        t0 = time.time()
        out = k_core(tree, "a", "b", 2, num_partitions=blocks)
        got = out.count()
        wall = time.time() - t0
        ok = got == 0  # a tree has no 2-core; peels one LEVEL per round
        rec.update({"metric": "kcore_cascade_scale", "tree_depth": args.depth,
                    "n_edges": n - 1, "core_nodes": got, "expect": 0,
                    "ok": bool(ok), "wall_sec": round(wall, 1),
                    "peel_rounds": args.depth + 1})
    elif args.op == "pagerank":
        # a ring is 2-regular, so the stationary PageRank is EXACTLY
        # uniform: every node must publish rank_e9 == floor(1e9/n + 0.5)
        from calendar_event_entity_extraction_ray.stages.graph import (
            pagerank,
        )

        n = args.ring
        ring = ray.data.range(n, override_num_blocks=blocks).map_batches(
            lambda b: ring_edges(b, n), batch_format="pyarrow")
        expect = int(np.floor(1e9 / n + 0.5))
        t0 = time.time()
        out = pagerank(ring, "a", "b", iters=10,
                       num_partitions=max(8, 2 * n // 500_000))
        import pyarrow.compute as pc
        agg = out.map_batches(
            lambda b: pa.table({
                "n": pa.array([b.num_rows], pa.int64()),
                "bad": pa.array([int(pc.sum(pc.cast(pc.not_equal(
                    b.column("rank_e9"), expect), pa.int64())).as_py()
                    or 0)], pa.int64())}),
            batch_format="pyarrow").to_pandas()
        wall = time.time() - t0
        got, bad = int(agg.n.sum()), int(agg.bad.sum())
        ok = got == n and bad == 0
        rec.update({"metric": "pagerank_scale", "ring": n,
                    "n_edges": n, "iters": 10, "nodes_out": got,
                    "wrong_rank": bad, "expect_e9": expect,
                    "ok": bool(ok), "wall_sec": round(wall, 1),
                    "edge_rounds_per_sec": round(10 * 2 * n / wall, 1)})
    elif args.op == "cc":
        # a ring is ONE component with diameter n/2 — the adversarial
        # case for plain min-label propagation (needs pointer jumping to
        # finish in O(log n) rounds); every node must map to cluster 0
        from calendar_event_entity_extraction_ray.stages.graph import (
            connected_components,
        )

        n = args.ring
        if args.cascade:
            # realistic dedup shape: n/5 disjoint 5-node path components
            # (diameter 4 — converges in a few rounds); cluster(i) must
            # equal 5*(i//5) for every node
            def comp_edges(batch: pa.Table) -> pa.Table:
                i = batch.column("id").to_numpy().astype(np.int64)
                i = i[(i % 5) != 4]
                return pa.table({"a": pa.array(i),
                                 "b": pa.array(i + 1)})

            edges_ds = ray.data.range(
                n, override_num_blocks=blocks).map_batches(
                comp_edges, batch_format="pyarrow")
            n_e = n - n // 5

            def bad_of(b: pa.Table) -> int:
                nd = b.column("node").to_numpy()
                cl = b.column("cluster").to_numpy()
                return int((cl != 5 * (nd // 5)).sum())
        else:
            edges_ds = ray.data.range(
                n, override_num_blocks=blocks).map_batches(
                lambda b: ring_edges(b, n), batch_format="pyarrow")
            n_e = n

            def bad_of(b: pa.Table) -> int:
                return int((b.column("cluster").to_numpy() != 0).sum())

        t0 = time.time()
        out = connected_components(edges_ds, "a", "b",
                                   num_partitions=max(8, 2 * n // 500_000))
        agg = out.map_batches(
            lambda b: pa.table({
                "n": pa.array([b.num_rows], pa.int64()),
                "bad": pa.array([bad_of(b)], pa.int64())}),
            batch_format="pyarrow").to_pandas()
        wall = time.time() - t0
        got, bad = int(agg.n.sum()), int(agg.bad.sum())
        ok = got == n and bad == 0
        rec.update({"metric": ("cc_components_scale" if args.cascade
                               else "cc_ring_scale"),
                    "nodes": n, "n_edges": n_e,
                    "nodes_out": got, "wrong_cluster": bad,
                    "ok": bool(ok), "wall_sec": round(wall, 1),
                    "edges_per_sec": round(n_e / wall, 1)})
    elif args.op == "walks":
        # ring invariants: one walk per node; ring_dist(node, start) <= t
        # with matching parity (each hop moves exactly +-1 around the ring)
        from calendar_event_entity_extraction_ray.stages.graph import (
            random_walks,
        )

        n, L = args.ring, 8
        ring = ray.data.range(n, override_num_blocks=blocks).map_batches(
            lambda b: ring_edges(b, n), batch_format="pyarrow")
        t0 = time.time()
        out = random_walks(ring, "a", "b", walk_len=L, seed=5,
                           num_partitions=max(8, 2 * n // 500_000))

        def chk(b: pa.Table) -> pa.Table:
            w = b.column("walk_id").to_numpy()
            st = b.column("step").to_numpy()
            nd = b.column("node").to_numpy()
            d = np.abs(nd - w)
            ring_d = np.minimum(d, n - d)
            bad = (ring_d > st) | (((ring_d ^ st) & 1) != 0)
            return pa.table({"n": pa.array([len(w)], pa.int64()),
                             "bad": pa.array([int(bad.sum())], pa.int64())})

        agg = out.map_batches(chk, batch_format="pyarrow").to_pandas()
        wall = time.time() - t0
        rows, bad = int(agg.n.sum()), int(agg.bad.sum())
        ok = rows == n * (L + 1) and bad == 0
        rec.update({"metric": "walks_scale", "ring": n, "walk_len": L,
                    "rows_out": rows, "expect_rows": n * (L + 1),
                    "invariant_violations": bad, "ok": bool(ok),
                    "wall_sec": round(wall, 1),
                    "hops_per_sec": round(n * L / wall, 1)})
    else:
        n = args.nodes
        tree = ray.data.range(n, override_num_blocks=blocks).map_batches(
            lambda b: tree_edges(b, 10), batch_format="pyarrow")
        depth = heap_depth(n, 10)
        exp_hist = np.bincount(depth)
        t0 = time.time()
        out = bfs_distances(tree, "a", "b", [0], max_depth=64,
                            num_partitions=blocks)

        def hist(b: pa.Table) -> pa.Table:
            d = b.column("dist").to_numpy()
            h = np.bincount(d, minlength=len(exp_hist))
            return pa.table({"h": pa.array([h.astype(np.int64)])})

        tot = np.zeros(len(exp_hist), dtype=np.int64)
        for b in out.map_batches(hist, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None):
            for h in b.column("h").to_pylist():
                tot[:len(h)] += np.asarray(h, dtype=np.int64)
        wall = time.time() - t0
        ok = (tot == exp_hist).all() and int(tot.sum()) == n
        rec.update({"metric": "bfs_scale", "nodes": n, "n_edges": n - 1,
                    "reached": int(tot.sum()),
                    "per_level_exact": bool((tot == exp_hist).all()),
                    "levels": int(len(exp_hist)), "ok": bool(ok),
                    "wall_sec": round(wall, 1),
                    "edges_per_sec": round((n - 1) / wall, 1)})

    print(json.dumps(rec))
    ray.shutdown()
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
