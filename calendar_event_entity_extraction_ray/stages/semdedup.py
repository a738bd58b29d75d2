"""SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): embedding-space near-duplicate
removal with the quadratic pair search bounded by k-means clusters.

Reference anchor: the reference dedups by exact text signature
(src/prepare_assignment_data.py dedupe_text_output); this is the semantic
generalization a pretraining pipeline runs over document embeddings,
expressed Ray-Data-first:

  - CLUSTERING is the repo's deterministic Lloyd's k-means
    (stages/ml.py:fit_centroids — smallest-id init, broadcast-assign +
    float64 partial-sum updates, reproducible against the single-process
    mirror). Cluster count bounds the pair search: O(sum c_i^2) instead
    of O(n^2) — at 10^9 embeddings with n/k ~ 10^4 per cluster that is
    five orders of magnitude off the brute-force pair count (the paper's
    core trick; cross-cluster near-dups are missed BY DESIGN).
  - The PAIR SEARCH runs inside one exchange keyed on the cluster id:
    equal clusters co-locate, each fold sorts its clusters by id,
    L2-normalizes, takes one gram matrix per cluster and drops every row
    that has an EARLIER (smaller-id) neighbor with cosine >= tau —
    keep-smallest-id, the same canonical-keeper rule as the exact dedup
    family (the paper keeps the row farthest from the centroid; the rule
    is a parameter of the fold, the plan is unchanged).
  - Giant clusters are the skew risk (a degenerate fit can send
    everything to one cluster, resurrecting O(n^2)): folds process
    clusters above ``max_cluster_size`` in id-sorted CHUNKS compared
    only against a capped window of earlier rows — bounded memory,
    logged, recall-lossy exactly like the minhash band cap
    (stages/dedup.py:max_band_size).

Both mirrors (distributed fold, single-process golden) run the same
``cluster_drop_ids`` kernel, so results are bit-identical by
construction.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

import ray.data

from calendar_event_entity_extraction_ray.stages.ml import (
    assign_clusters,
    fit_centroids,
    kmeans_single_process,
)

# -- pure kernels (shared with the single-process golden mirror) -----------


def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def cluster_drop_ids(ids: np.ndarray, mat: np.ndarray, tau: float,
                     max_cluster_size: int = 8192) -> np.ndarray:
    """Drop ids of one cluster: sort by id, unit-normalize, drop row j iff
    some earlier row i (ids[i] < ids[j]) has cos(i, j) >= tau. Above
    ``max_cluster_size`` rows, each id-sorted chunk compares against at
    most the previous ``max_cluster_size`` rows (bounded memory; earlier
    rows win either way, so the kept set stays deterministic)."""
    o = np.argsort(ids, kind="stable")
    ids, mat = ids[o], _unit_rows(mat[o])
    n = len(ids)
    if n <= max_cluster_size:
        s = mat @ mat.T
        drop = np.triu(s >= tau, k=1).any(axis=0)
        return ids[drop]
    out: List[np.ndarray] = []
    for lo in range(0, n, max_cluster_size):
        hi = min(lo + max_cluster_size, n)
        w0 = max(0, lo - max_cluster_size)
        s_prev = (mat[w0:lo] @ mat[lo:hi].T) >= tau if lo else None
        s_self = np.triu(mat[lo:hi] @ mat[lo:hi].T >= tau, k=1)
        drop = s_self.any(axis=0)
        if s_prev is not None:
            drop |= s_prev.any(axis=0)
        out.append(ids[lo:hi][drop])
    return np.concatenate(out) if out else ids[:0]


def semdedup_single_process(
    ids: np.ndarray, vecs: np.ndarray, k: int, tau: float,
    iters: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sequential mirror: kmeans_single_process labels + the same
    per-cluster kernel, clusters in index order. Returns (drop_ids,
    their cluster labels) sorted by id."""
    labels = kmeans_single_process(vecs, ids, k=k, iters=iters)
    drops, labs = [], []
    for c in range(int(labels.max()) + 1 if len(labels) else 0):
        sel = labels == c
        d = cluster_drop_ids(ids[sel], np.asarray(vecs, np.float64)[sel],
                             tau)
        drops.append(d)
        labs.append(np.full(len(d), c, dtype=np.int64))
    if not drops:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    dd = np.concatenate(drops)
    ll = np.concatenate(labs)
    o = np.argsort(dd, kind="stable")
    return dd[o], ll[o]


# -- distributed operator ---------------------------------------------------


def semdedup_drop(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    tau: float = 0.3,
    iters: int = 5,
) -> "ray.data.Dataset":
    """Distributed SemDeDup: returns (id, cluster) of every DROPPED row
    (callers semi-anti-join survivors, exactly like the minhash drop-id
    flow). One centroid fit + one assignment pass + one cluster-keyed
    exchange; nothing driver-side grows with the corpus (centroids are
    k x d floats)."""
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )
    from calendar_event_entity_extraction_ray.stages.knn import (
        _batch_matrix,
    )

    proj = ds.select_columns([id_col, vec_col]).materialize()
    cents_ref = ray.put(fit_centroids(proj, vec_col, id_col, k, iters))

    def tag(b: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        m = _batch_matrix(b, vec_col)
        a = assign_clusters(m, cents).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         vec_col: b.column(vec_col),
                         "cluster": pa.array(a)})

    tagged = proj.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)

    def fold(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        labels = t.column("cluster").to_numpy(zero_copy_only=False)
        m = _batch_matrix(t, vec_col)
        drops, labs = [], []
        for c in np.unique(labels):
            sel = labels == c
            d = cluster_drop_ids(ids[sel], m[sel], tau)
            drops.append(d)
            labs.append(np.full(len(d), c, dtype=np.int64))
        dd = np.concatenate(drops) if drops else np.zeros(0, np.int64)
        ll = np.concatenate(labs) if labs else np.zeros(0, np.int64)
        return pa.table({id_col: pa.array(dd.astype(np.int64)),
                         "cluster": pa.array(ll)})

    return hash_partition_map(tagged, "cluster", fold)
