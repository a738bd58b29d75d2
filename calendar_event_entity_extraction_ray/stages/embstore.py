"""Epoch-incremental SemDeDup — cross-epoch embedding near-duplicate
removal against a persisted per-cell embedding store.

The incremental member of the semantic-dedup family, completing the
"incremental everything" trio: exact text dedup across epochs =
stages/fpstore.py, near-dup text across epochs = fpstore band
fingerprints, near-dup EMBEDDINGS across epochs = this store. The batch
operator (stages/semdedup.py, Abbas et al. 2023) bounds the quadratic
pair search by k-means cells; this store FREEZES those cells at
creation (the index-geometry-never-changes rule the IVF vector store
uses for its codebook) so later epochs compare only against the stored
vectors of their own cell:

  - a new vector is a NEAR-DUP iff some vector with priority over it in
    the SAME cell has cosine >= tau: any PRIOR epoch's stored vector
    (earlier epochs always win — the fpstore first-epoch-wins rule), or
    a smaller-id vector of the current epoch (the batch operator's
    keep-smallest-id rule);
  - cross-cell near-dups are missed BY DESIGN — the published SemDeDup
    semantics (the cell bound is what makes 10^9 x 10^9 comparisons a
    sum of per-cell products);
  - per-epoch cost: one broadcast assignment pass over the epoch + one
    cell-keyed exchange whose folds read ONLY their cell's stored
    files — O(epoch + touched-cell IO), never O(store); the epoch's
    vectors shuffle, the store's never move (the fpstore
    storage-partitioned semi-join shape).

Store rules (the repo's versioned manifest discipline): fold tasks
write uniquely-named survivor files and RETURN them; the driver records
the manifest last, atomically — re-running a recorded epoch is a no-op,
a crash mid-epoch leaves the previous manifest authoritative and the
re-run converges (drops are a pure function of (store, epoch input)).

    store_dir/_EMBMANIFEST.json   {"k", "tau", "iters", "id_col",
                                   "vec_col", "centroids",
                                   "epochs": {e: {"cells": {c: {...}},
                                              "rows": N}}}
    store_dir/epoch=<e>/cell=<c>/em-<uuid>.parquet   (id, vec)
"""

from __future__ import annotations

import json
import os
import uuid
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from calendar_event_entity_extraction_ray.stages.ml import (
    assign_clusters,
    fit_centroids,
    fit_centroids_single_process,
)
from calendar_event_entity_extraction_ray.stages.semdedup import (
    _unit_rows,
)

_MANIFEST = "_EMBMANIFEST.json"


def _load_manifest(store_dir: str) -> dict:
    p = os.path.join(store_dir, _MANIFEST)
    if not os.path.exists(p):
        return {"epochs": {}, "centroids": None}
    with open(p) as f:
        return json.load(f)


def _save_manifest(store_dir: str, m: dict) -> None:
    os.makedirs(store_dir, exist_ok=True)
    p = os.path.join(store_dir, _MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, p)


def _cell_files(store_dir: str, m: dict, exclude_epoch: Optional[str]
                ) -> "dict[int, List[str]]":
    out: dict[int, List[str]] = {}
    for e, ent in sorted(m["epochs"].items()):
        if e == exclude_epoch:
            continue
        for c, cent in sorted(ent["cells"].items()):
            out.setdefault(int(c), []).extend(
                os.path.join(store_dir, f"epoch={e}", f"cell={c}", f)
                for f in cent["files"])
    return out


def cross_hit_mask(stored_unit: np.ndarray, mat_unit: np.ndarray,
                   tau: float, chunk: int = 8192) -> np.ndarray:
    """True where a ``mat_unit`` row has cosine >= tau against ANY
    ``stored_unit`` row (both unit-normalized). OR-ing this over stored
    slices equals one pass over their concatenation, which is what lets
    the distributed fold STREAM a cell's stored vectors row-group by
    row-group (bounded memory even after compaction folds a cell into
    one large file) while the golden mirror calls the same kernel over
    its in-memory kept arrays."""
    n = len(mat_unit)
    hit = np.zeros(n, dtype=bool)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        hit[lo:hi] = ((stored_unit @ mat_unit[lo:hi].T)
                      >= tau).any(axis=0)
    return hit


def incremental_drop_mask(ids: np.ndarray, mat: np.ndarray,
                          stored: Optional[np.ndarray],
                          tau: float,
                          chunk: int = 8192) -> np.ndarray:
    """True where an epoch row is a near-dup: cos >= tau against any
    STORED row (prior epochs always win) or any smaller-id row of the
    same epoch/cell. ``ids`` must be sorted ascending with ``mat``
    aligned; rows are unit-normalized here. Chunked so memory is
    O(chunk * max(|stored|, |epoch-cell|)) — the shared kernel of the
    distributed fold AND the single-process golden mirror."""
    n = len(ids)
    drop = np.zeros(n, dtype=bool)
    if n == 0:
        return drop
    mu = _unit_rows(np.asarray(mat, np.float64))
    if stored is not None and len(stored):
        drop |= cross_hit_mask(
            _unit_rows(np.asarray(stored, np.float64)), mu, tau, chunk)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        # earlier same-epoch rows: every chunk before this one, then the
        # strict upper triangle within the chunk
        if lo:
            drop[lo:hi] |= ((mu[:lo] @ mu[lo:hi].T) >= tau).any(axis=0)
        s_self = np.triu(mu[lo:hi] @ mu[lo:hi].T >= tau, k=1)
        drop[lo:hi] |= s_self.any(axis=0)
    return drop


def embstore_single_process(
    epochs: "List[Tuple[np.ndarray, np.ndarray]]",
    k: int, tau: float, iters: int = 5,
) -> "List[np.ndarray]":
    """Sequential mirror: centroids fit on the FIRST epoch (sorted by
    id), every epoch assigned with those frozen centroids, survivors
    accumulated per cell, each epoch's rows tested by the same
    incremental_drop_mask kernel. Returns surviving ids per epoch."""
    ids0, v0 = epochs[0]
    cents = fit_centroids_single_process(
        np.asarray(v0, np.float64), ids0, k=k, iters=iters)
    kept: dict[int, List[np.ndarray]] = {}
    out = []
    for ids, vecs in epochs:
        o = np.argsort(ids, kind="stable")
        ids, vecs = ids[o], np.asarray(vecs, np.float64)[o]
        cells = assign_clusters(vecs, cents).astype(np.int64)
        surv_ids = []
        for c in np.unique(cells):
            sel = cells == c
            stored = (np.concatenate(kept[int(c)])
                      if int(c) in kept else None)
            drop = incremental_drop_mask(ids[sel], vecs[sel], stored,
                                         tau)
            surv_ids.append(ids[sel][~drop])
            if (~drop).any():
                kept.setdefault(int(c), []).append(vecs[sel][~drop])
        out.append(np.sort(np.concatenate(surv_ids))
                   if surv_ids else np.zeros(0, np.int64))
    return out


def dedup_epoch(
    ds: "ray.data.Dataset",
    store_dir: str,
    epoch: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    tau: float = 0.3,
    iters: int = 5,
) -> "ray.data.Dataset":
    """Drop this epoch's embedding near-dups against all PRIOR epochs
    (+ within-epoch, smallest id wins), record the survivors, and
    return them as a Dataset of (id, vec). Centroids are fit on the
    FIRST epoch and frozen (geometry pinned; mismatched k/tau
    rejected). Re-running a recorded epoch returns its recorded
    survivors without recomputation."""
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )
    from calendar_event_entity_extraction_ray.stages.knn import (
        _batch_matrix,
    )

    m = _load_manifest(store_dir)
    params = {"k": int(k), "tau": float(tau), "iters": int(iters),
              "id_col": id_col, "vec_col": vec_col}
    if m.get("params") is not None and m["params"] != params:
        raise ValueError(
            f"store {store_dir!r} was built with {m['params']!r}, "
            f"got {params!r}")
    if epoch in m.get("compacted_epochs", []):
        # folded into a base epoch: still recorded, survivors no longer
        # a distinct file set — the re-run's filter would drop them all
        # against the base anyway (they are members)
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             vec_col: pa.array([], pa.list_(pa.float64()))}))
    if epoch in m["epochs"]:
        ent = m["epochs"][epoch]
        files = [os.path.join(store_dir, f"epoch={epoch}",
                              f"cell={c}", f)
                 for c, cent in sorted(ent["cells"].items())
                 for f in cent["files"]]
        return (ray.data.read_parquet(files,
                                      columns=[id_col, vec_col])
                if files
                else ray.data.from_arrow(pa.table(
                    {id_col: pa.array([], pa.int64()),
                     vec_col: pa.array([], pa.list_(pa.float64()))})))

    proj = ds.select_columns([id_col, vec_col]).materialize()
    if m.get("centroids") is None:
        cents = fit_centroids(proj, vec_col, id_col, k, iters)
    else:
        cents = np.asarray(m["centroids"], dtype=np.float64)
    cents_ref = ray.put(cents)
    cell_files = _cell_files(store_dir, m, exclude_epoch=epoch)
    ed = os.path.join(store_dir, f"epoch={epoch}")

    def tag(b: pa.Table) -> pa.Table:
        mat = _batch_matrix(b, vec_col)
        a = assign_clusters(mat, ray.get(cents_ref)).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         vec_col: b.column(vec_col),
                         "cell": pa.array(a)})

    tagged = proj.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "file": pa.array([], pa.string()),
                          "rows": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        cells_out, files_out, rows_out = [], [], []
        labels = t.column("cell").to_numpy(zero_copy_only=False)
        all_ids = t.column(id_col).to_numpy(zero_copy_only=False)
        mat = _batch_matrix(t, vec_col)
        for c in np.unique(labels):
            sel = labels == c
            ids_c, mat_c = all_ids[sel], mat[sel]
            o = np.argsort(ids_c, kind="stable")
            ids_c, mat_c = ids_c[o], mat_c[o]
            # within-epoch drops first (smaller id wins), then STREAM
            # the cell's stored vectors row-group by row-group — memory
            # stays bounded even after compaction folds the cell into
            # one corpus-scale file (OR over slices == one concat pass)
            drop = incremental_drop_mask(ids_c, mat_c, None, tau)
            mu = _unit_rows(np.asarray(mat_c, np.float64))
            for f in cell_files.get(int(c), []):
                pf = pq.ParquetFile(f)
                for rb in pf.iter_batches(batch_size=65536,
                                          columns=[vec_col]):
                    flat = (rb.column(0).flatten()
                            .to_numpy(zero_copy_only=False))
                    su = _unit_rows(
                        flat.reshape(rb.num_rows, -1).astype(np.float64))
                    drop |= cross_hit_mask(su, mu, tau)
            if drop.all():
                continue
            keep_ids = ids_c[~drop]
            keep_mat = mat_c[~drop]
            cdir = os.path.join(ed, f"cell={int(c)}")
            os.makedirs(cdir, exist_ok=True)
            name = f"em-{uuid.uuid4().hex}.parquet"
            vec_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(keep_mat).ravel(),
                         pa.float64()),
                keep_mat.shape[1]).cast(pa.list_(pa.float64()))
            pq.write_table(
                pa.table({id_col: pa.array(keep_ids, pa.int64()),
                          vec_col: vec_arr}),
                os.path.join(cdir, name))
            cells_out.append(int(c))
            files_out.append(name)
            rows_out.append(int(len(keep_ids)))
        return pa.table({"cell": pa.array(cells_out, pa.int64()),
                         "file": pa.array(files_out, pa.string()),
                         "rows": pa.array(rows_out, pa.int64())})

    res = hash_partition_map(tagged, "cell", fold).to_pandas()
    cells_ent: dict = {}
    total = 0
    if "file" in res.columns:
        for r in res.itertuples():
            cent = cells_ent.setdefault(str(int(r.cell)),
                                        {"files": [], "rows": 0})
            cent["files"].append(r.file)
            cent["rows"] += int(r.rows)
            total += int(r.rows)
        for cent in cells_ent.values():
            cent["files"].sort()

    m = _load_manifest(store_dir)  # re-read: driver is the only writer
    if m.get("params") is None:
        m["params"] = params
        m["centroids"] = [[float(x) for x in c] for c in cents]
    m["epochs"][epoch] = {"cells": cells_ent, "rows": total}
    _save_manifest(store_dir, m)  # the commit point
    from calendar_event_entity_extraction_ray.stages.storegc import (
        orphan_files,
        remove_files_and_prune_dirs,
    )

    listed = {os.path.join(f"epoch={epoch}", f"cell={c}", f)
              for c, cent in cells_ent.items() for f in cent["files"]}
    remove_files_and_prune_dirs(
        store_dir, orphan_files(store_dir, [f"epoch={epoch}"], listed))

    files = [os.path.join(store_dir, f"epoch={epoch}", f"cell={c}", f)
             for c, cent in cells_ent.items() for f in cent["files"]]
    return (ray.data.read_parquet(files, columns=[id_col, vec_col])
            if files
            else ray.data.from_arrow(pa.table(
                {id_col: pa.array([], pa.int64()),
                 vec_col: pa.array([], pa.list_(pa.float64()))})))


def store_rows(store_dir: str) -> int:
    m = _load_manifest(store_dir)
    return sum(int(e["rows"]) for e in m["epochs"].values())


def compact_store(store_dir: str) -> dict:
    """LSM compaction: fold every cell's files ACROSS epochs into one
    file per cell under a new base epoch (rows are a disjoint union —
    a vector registers in exactly one epoch — so membership and every
    future drop decision are identical before and after). One ray task
    per cell; the manifest ``os.replace`` is the commit, superseded
    epoch dirs deleted strictly AFTER (versioned-open-table rule).
    Compacted epoch names are retained: re-running ``dedup_epoch`` for
    one returns an EMPTY survivor set without touching the store (its
    vectors are already members of the folded base — the fpstore
    append_epoch rule)."""
    import shutil

    m = _load_manifest(store_dir)
    if not m["epochs"]:
        return m
    params = m["params"]
    id_col, vec_col = params["id_col"], params["vec_col"]
    cell_files = _cell_files(store_dir, m, None)
    gen = int(m.get("compaction_gen", 0)) + 1
    base = f"base{gen:04d}"
    old_dirs = [os.path.join(store_dir, f"epoch={e}")
                for e in m["epochs"]]

    @ray.remote(num_cpus=1)
    def fold(c: int, files: List[str]) -> tuple:
        t = pa.concat_tables(pq.read_table(f, columns=[id_col, vec_col])
                             for f in files)
        t = t.sort_by(id_col)
        cdir = os.path.join(store_dir, f"epoch={base}", f"cell={c}")
        os.makedirs(cdir, exist_ok=True)
        name = f"em-{uuid.uuid4().hex}.parquet"
        pq.write_table(t, os.path.join(cdir, name))
        return c, name, t.num_rows

    refs = [fold.remote(c, fs) for c, fs in sorted(cell_files.items())]
    new_cells: dict = {}
    total = 0
    for c, name, rows in ray.get(refs):
        new_cells[str(c)] = {"files": [name], "rows": rows}
        total += rows
    done = sorted(set(m.get("compacted_epochs", []))
                  | set(m["epochs"]) - {base})
    m2 = {"params": params, "centroids": m["centroids"],
          "compaction_gen": gen, "compacted_epochs": done,
          "epochs": {base: {"cells": new_cells, "rows": total}}}
    _save_manifest(store_dir, m2)  # THE commit
    for d in old_dirs:  # post-commit: no manifest references these
        if os.path.basename(d) != f"epoch={base}":
            shutil.rmtree(d, ignore_errors=True)
    return m2
