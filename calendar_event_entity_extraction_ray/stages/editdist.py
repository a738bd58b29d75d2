"""Edit-distance (Levenshtein) near-dup pairs over a text column.

The reference engine has no fuzzy-text join; this adds the edit-distance
family next to MinHash/SimHash/Jaccard (stages/dedup.py) with an EXACT
result (parity target: DuckDB ``levenshtein(a,b) <= d`` over all pairs
with ``abs(len(a)-len(b)) <= d``).

Scale design — lossless length banding:

  every string of length L is an original member of band ``L // W`` and
  is REPLICATED into band ``L // W + 1`` when ``L >= (k+1)*W - d``. For
  any pair within distance d the lengths differ by <= d, so the pair
  always co-occurs in the LONGER string's band; the fold emits a pair
  only from that canonical band, so each pair is produced exactly once
  and no distinct-exchange is needed. Replication factor <= 2.

  inside a band: sort by length, slide a two-pointer window over the
  <= d length gap, prune with the character-bag lower bound, then the
  Myers bit-parallel distance with early abandon (functions/editdist.py).
  The O(window^2) in-band work assumes lengths spread within a band —
  boilerplate corpora with thousands of SAME-length near-identical
  docs should pre-block (e.g. by SimHash) before this stage, the same
  caveat as the MinHash band cap (stages/dedup.py).
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa

import ray
import ray.data


def levenshtein_pairs(
    ds: "ray.data.Dataset",
    max_d: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_width: int = 0,
) -> "ray.data.Dataset":
    """All pairs (id_a < id_b, dist <= max_d); returns a Dataset with
    columns (``{id}_a``, ``{id}_b``, ``dist``)."""
    from calendar_event_entity_extraction_ray.functions.editdist import (
        myers_distance,
    )
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    w = band_width or max(4 * (max_d + 1), 64)

    def explode(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.utf8_length(b.column(text_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        k0 = lens // w
        # id type is preserved (int64 doc ids, or the surface string
        # itself when resolving entity forms — stages/resolve.py)
        id_type = b.schema.field(id_col).type
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        texts = b.column(text_col).to_pylist()
        rep = np.nonzero(lens >= (k0 + 1) * w - max_d)[0]
        out_bucket = np.concatenate([k0, k0[rep] + 1])
        out_ix = np.concatenate([np.arange(len(lens)), rep])
        return pa.table({
            "lbucket": pa.array(out_bucket, pa.int64()),
            id_col: pa.array(ids[out_ix], type=id_type),
            "_len": pa.array(lens[out_ix], pa.int64()),
            text_col: pa.array([texts[i] for i in out_ix], pa.string()),
        })

    exploded = ds.map_batches(
        lambda b: add_hash_column(explode(b), ["lbucket"], out_col="_bh"),
        batch_format="pyarrow")

    a_col, b_col = f"{id_col}_a", f"{id_col}_b"

    def _char_hists(texts: list) -> np.ndarray:
        """(n, 129) int32 codepoint histograms: bins 0-127 = ASCII, bin
        128 lumps everything else. Lumping only lets surpluses cancel,
        so the bag bound below stays an admissible LOWER bound."""
        out = np.zeros((len(texts), 129), dtype=np.int32)
        for i, s in enumerate(texts):
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            out[i] = np.bincount(np.minimum(cp, 128).astype(np.int64),
                                 minlength=129)
        return out

    def pairs_fold(t: pa.Table) -> pa.Table:
        import pandas as pd

        gids = t.column("lbucket").to_numpy()
        out_a: list = []
        out_b: list = []
        out_d: list = []
        id_type = t.schema.field(id_col).type
        df = pd.DataFrame({
            "g": gids,
            "len": t.column("_len").to_numpy(),
            "id": t.column(id_col).to_numpy(zero_copy_only=False),
            "text": t.column(text_col).to_pylist(),
        })
        for gid, grp in df.groupby("g", sort=False):
            grp = grp.sort_values(["len", "id"], kind="mergesort")
            lens = grp["len"].to_numpy()
            ids = grp["id"].to_numpy()
            texts = grp["text"].tolist()
            hists = _char_hists(texts)
            n = len(grp)
            for i in range(n):
                hi_ix = int(np.searchsorted(lens, lens[i] + max_d,
                                            side="right"))
                if hi_ix <= i + 1:
                    continue
                # vectorized admissible prune over the whole window:
                # dist >= max(sum of positive count surplus either side)
                diff = hists[i + 1:hi_ix] - hists[i]
                surplus = np.maximum(
                    np.where(diff > 0, diff, 0).sum(axis=1),
                    np.where(diff < 0, -diff, 0).sum(axis=1))
                # canonical band of the pair = longer string's band
                canon = (lens[i + 1:hi_ix] // w) == gid
                for off in np.nonzero((surplus <= max_d) & canon)[0]:
                    j = i + 1 + int(off)
                    if ids[i] == ids[j]:
                        continue
                    d = myers_distance(texts[i], texts[j], max_d=max_d)
                    if d <= max_d:
                        lo, hi = ((ids[i], ids[j]) if ids[i] < ids[j]
                                  else (ids[j], ids[i]))
                        out_a.append(lo)
                        out_b.append(hi)
                        out_d.append(d)
        return pa.table({
            a_col: pa.array(out_a, type=id_type),
            b_col: pa.array(out_b, type=id_type),
            "dist": pa.array(np.asarray(out_d, dtype=np.int64)),
        })

    return hash_partition_map(exploded, "_bh", pairs_fold)
