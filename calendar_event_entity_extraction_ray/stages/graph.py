"""Graph analytics over edge lists: distributed connected components.

The canonicalization step a near-dup pipeline needs after pair generation:
pairs (a, b) form clusters, every member maps to the cluster's minimum id
(the canonical representative — the same keep-smallest convention as the
dedup family).

Algorithm: iterative min-label propagation. Labels start as ``label(v) =
v``; each round every node takes the min of its own label and its
neighbors' labels (one hash join to move labels across edges + one
per-partition grouped min, both on the two-phase exchange). The sum of all
labels is strictly decreasing until fixpoint, so convergence is detected
with one cheap global aggregate per round — no driver-side graph state.
Rounds needed = graph diameter (near-dup clusters are near-cliques:
typically 2-3 rounds).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

import ray.data

# single-task union-find beats the iterative exchange up to ~2M edges
# (measured: 2M string edges 14.6s / 2M int edges 2.9s in one fold vs a
# per-round exchange tax that already costs 24s at 150k edges)
CC_SMALL_EDGES = 2_000_000


def _min_label_fold(t: pa.Table) -> pa.Table:
    df = t.select(["node", "label"]).to_pandas()
    out = df.groupby("node", sort=False)["label"].min().reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def _union_find_fold(t: pa.Table) -> pa.Table:
    """Single-task exact components over one (node, dst) edge table:
    union-find with path compression, then min node id per root as the
    cluster label (identical output contract to the iterative path).
    Node ids may be any orderable type — ints (doc/vec ids) or strings
    (entity surface forms, stages/resolve.py); MIN on strings is
    lexicographic, matching both pandas and DuckDB binary collation."""
    import numpy as np

    node_type = t.schema.field("node").type
    a = t.column("node").to_pandas().to_numpy()
    b = t.column("dst").to_pandas().to_numpy()
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)  # min root wins -> min label
    nodes = np.unique(np.concatenate([a, b])).tolist()
    labels = [find(n) for n in nodes]
    return pa.table({"node": pa.array(nodes, type=node_type),
                     "cluster": pa.array(labels, type=node_type)})


def connected_components(
    edges: "ray.data.Dataset",
    a_col: str,
    b_col: str,
    max_iters: int = 50,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """(a, b) undirected edge list -> (node, cluster) with cluster = min
    node id of the component. Isolated nodes don't appear (no edges)."""
    from ray.data.aggregate import Sum

    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )
    from calendar_event_entity_extraction_ray.stages.joins import hash_join

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b.column(a_col)
        bb = b.column(b_col)
        return pa.table({
            "node": pa.chunked_array(list(a.chunks) + list(bb.chunks)),
            "dst": pa.chunked_array(list(bb.chunks) + list(a.chunks)),
        })

    # edges are re-joined every round — pin them once
    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    sch = sym.schema()
    n_edges = sym.count() if sch is not None else 0
    if sch is None or n_edges == 0:
        # empty edge list: no components (isolated nodes never appear).
        # Emit a TYPED empty table — a schema-less empty dataset breaks
        # downstream joins (all-singleton entity resolution hit this)
        if sch is not None:
            ntype = sch.types[0]
        else:
            esch = edges.schema()
            ntype = (esch.field(a_col).type if esch is not None
                     else pa.string())
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], ntype), "cluster": pa.array([], ntype)}))
    node_type = sch.types[0]

    # adaptive small path: the iterative algorithm costs ~4 plan
    # executions PER ROUND — on an edge list that fits one task, a single
    # union-find fold replaces 3+ rounds of exchanges (measured 6.4s ->
    # ~1s on the sf0.01 dup graph). The cutoff is far above the
    # exchange's SMALL_ROWS: union-find is O(E a(E)) and a single task
    # folds 2M string edges in ~15s / 2M int edges in ~3s (measured),
    # while the iterative path pays its per-round exchange tax on the
    # SAME data many times over at that size (150k edges measured 24s
    # iterative vs ~1s folded). The iterative path is the 10^9+-edge
    # multi-node shape.
    if num_partitions is None and n_edges <= CC_SMALL_EDGES:
        return (sym.repartition(1)
                .map_batches(_union_find_fold, batch_size=None,
                             batch_format="pyarrow"))

    def seed_labels(t: pa.Table) -> pa.Table:
        df = t.select(["node"]).to_pandas().drop_duplicates("node")
        df["label"] = df["node"]
        return pa.Table.from_pandas(df, preserve_index=False)

    labels = hash_partition_map(
        sym.map_batches(lambda b: add_hash_column(b, ["node"], out_col="_nh"),
                        batch_format="pyarrow"),
        "_nh", lambda t: seed_labels(t), num_partitions=num_partitions)

    prev_sum = None
    for _ in range(max_iters):
        # (1) neighbor propagation: move each node's label across its
        # edges: (node, dst) x (node, label) -> candidate (dst, label)
        cand = hash_join(sym, labels, key="node",
                         left_cols=["node", "dst"],
                         right_cols=["node", "label"],
                         num_buckets=num_partitions)
        cand = cand.map_batches(
            lambda b: pa.table({"node": b.column("dst"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        # (2) pointer jumping: label(v) <- label(label(v)). Every label IS
        # a node id, so joining labels onto themselves shortcuts chains —
        # rounds drop from O(diameter) to O(log diameter)
        jump = hash_join(
            labels.map_batches(
                lambda b: pa.table({"ptr": b.column("label"),
                                    "node": b.column("node")}),
                batch_format="pyarrow"),
            labels.map_batches(
                lambda b: pa.table({"ptr": b.column("node"),
                                    "plabel": b.column("label")}),
                batch_format="pyarrow"),
            key="ptr", left_cols=["ptr", "node"],
            right_cols=["ptr", "plabel"], num_buckets=num_partitions)
        jump = jump.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "label": b.column("plabel")}),
            batch_format="pyarrow")
        merged = labels.union(cand).union(jump).map_batches(
            lambda b: add_hash_column(b.select(["node", "label"]), ["node"],
                                      out_col="_nh"),
            batch_format="pyarrow")
        labels = hash_partition_map(merged, "_nh", _min_label_fold,
                                    num_partitions=num_partitions)
        # convergence: labels only ever decrease under min-propagation, so
        # any change moves the aggregate. Numeric labels sum directly;
        # string labels (entity surface forms) sum their process-stable
        # 64-bit hashes instead — a fixed-point detector, not an output
        # value (a same-sum collision while labels changed needs a 2^-64
        # event per round)
        if pa.types.is_string(node_type) or pa.types.is_large_string(
                node_type):
            def _chk(b: pa.Table) -> pa.Table:
                import numpy as np

                from calendar_event_entity_extraction_ray.stages.dedup \
                    import hash64_columns

                h = hash64_columns(b, ["label"]).astype(np.uint64)
                return pa.table({"s": pa.array(
                    [int(h.sum() % np.uint64(1 << 63))], pa.int64())})

            s = (labels.map_batches(_chk, batch_format="pyarrow")
                 .aggregate(Sum("s", alias_name="s"))["s"])
        else:
            s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "cluster": b.column("label")}),
        batch_format="pyarrow")


def _pagerank_single(t: pa.Table, d: float, iters: int) -> pa.Table:
    """Single-task exact PageRank over one symmetrized (node, dst) edge
    table — the small-graph shortcut AND the golden mirror (the
    distributed path must match it exactly: same float64 ops, same
    iteration order)."""
    import numpy as np

    a = t.column("node").to_pandas().to_numpy()
    b = t.column("dst").to_pandas().to_numpy()
    nodes, inv_a = np.unique(a, return_inverse=True)
    inv_b = np.searchsorted(nodes, b)
    n = len(nodes)
    deg = np.bincount(inv_a, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = rank / deg                      # every node has edges
        incoming = np.zeros(n)
        np.add.at(incoming, inv_b, contrib[inv_a])
        rank = (1.0 - d) / n + d * incoming
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_e9": pa.array(
                         np.floor(rank * 1e9 + 0.5).astype(np.int64),
                         pa.int64())})


def pagerank(
    edges: "ray.data.Dataset",
    a_col: str,
    b_col: str,
    damping: float = 0.85,
    iters: int = 10,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """PageRank over an UNDIRECTED edge list (edges symmetrized, so every
    node has degree >= 1 — no dangling-mass term). Fixed ``iters``
    rounds; output (node, rank_e9) with ranks floor-scaled to 1e-9 so
    results hash-compare against the single-process mirror.

    Small graphs (<= the exchange's small-input threshold) solve in ONE
    numpy task. The large path is the iterative broadcast shape: degrees
    once (salted grouped count), then per round one hash_join moves
    rank/degree across edges + one exchange folds incoming mass per
    node — the same join-per-round skeleton as connected_components, with
    rank state living in a Dataset, never on the driver."""
    import numpy as np

    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        SMALL_ROWS,
        hash_partition_map,
    )
    from calendar_event_entity_extraction_ray.stages.joins import hash_join

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b.column(a_col)
        bb = b.column(b_col)
        return pa.table({
            "node": pa.chunked_array(list(a.chunks) + list(bb.chunks)),
            "dst": pa.chunked_array(list(bb.chunks) + list(a.chunks)),
        })

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    if num_partitions is None and sym.count() <= SMALL_ROWS:
        return (sym.repartition(1)
                .map_batches(lambda t: _pagerank_single(t, damping, iters),
                             batch_size=None, batch_format="pyarrow"))

    # degrees + node count once
    def deg_fold(t: pa.Table) -> pa.Table:
        df = t.select(["node"]).to_pandas()
        out = df.groupby("node", sort=False).size().reset_index(name="deg")
        return pa.Table.from_pandas(out, preserve_index=False)

    degrees = hash_partition_map(
        sym.map_batches(lambda b: add_hash_column(b, ["node"],
                                                  out_col="_nh"),
                        batch_format="pyarrow"),
        "_nh", deg_fold, num_partitions=num_partitions).materialize()
    n_nodes = degrees.count()

    ranks = degrees.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "deg": b.column("deg"),
                            "rank": pa.array(
                                np.full(b.num_rows, 1.0 / n_nodes))}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        moved = hash_join(
            sym, ranks.map_batches(
                lambda b: pa.table({
                    "node": b.column("node"),
                    "contrib": pa.array(
                        b.column("rank").to_numpy()
                        / b.column("deg").to_numpy())}),
                batch_format="pyarrow"),
            key="node", left_cols=["node", "dst"],
            right_cols=["node", "contrib"], num_buckets=num_partitions)

        def mass_fold(t: pa.Table, _d=damping, _n=n_nodes) -> pa.Table:
            df = t.select(["dst", "contrib"]).to_pandas()
            out = (df.groupby("dst", sort=False)["contrib"].sum()
                   .reset_index().rename(columns={"dst": "node",
                                                  "contrib": "mass"}))
            return pa.Table.from_pandas(out, preserve_index=False)

        mass = hash_partition_map(
            moved.map_batches(
                lambda b: add_hash_column(b.select(["dst", "contrib"]),
                                          ["dst"], out_col="_mh"),
                batch_format="pyarrow"),
            "_mh", mass_fold, num_partitions=num_partitions)
        joined = hash_join(
            degrees, mass, key="node",
            left_cols=["node", "deg"], right_cols=["node", "mass"],
            num_buckets=num_partitions)
        ranks = joined.map_batches(
            lambda b, _d=damping, _n=n_nodes: pa.table({
                "node": b.column("node"),
                "deg": b.column("deg"),
                "rank": pa.array((1.0 - _d) / _n
                                 + _d * b.column("mass").to_numpy())}),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "rank_e9": pa.array(
                np.floor(b.column("rank").to_numpy() * 1e9 + 0.5)
                .astype(np.int64), pa.int64())}),
        batch_format="pyarrow")
