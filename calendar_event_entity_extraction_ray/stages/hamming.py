"""Exact hamming near-pair join over 64-bit fingerprints (simhash,
pHash): all pairs with popcount(a XOR b) <= max_dist.

The multi-index pigeonhole plan (Manku et al. 2007's simhash dedup),
COMPOSITE form: cut the 64 bits into ``max_dist + band_arity`` blocks
and key on every ``band_arity``-combination of blocks. A pair within
``max_dist`` touches at most ``max_dist`` blocks, leaving >=
``band_arity`` untouched — so at least one combination matches whole:
still a LOSSLESS candidate generator. Arity buys collision headroom:
at d=3, arity 1 gives 4 bands x 16 bits (candidates ~ n^2/2^16 — a 2M
synthetic corpus measured 244 s in the merges); arity 2 gives
C(5,2)=10 bands x ~26 bits (n^2/2^26 — the same corpus: 25 s, now
bounded by the 10x-row exchange, not the merges). Shuffle
volume grows with the combination count, candidate volume shrinks
exponentially in band bits; arity 2 is the right default until n
approaches 2^bits.

One exchange on (band, band_value): each fold self-merges its bucket
(the Jaccard pairs_fold pattern — one vectorized pandas merge, never a
per-group Python loop), verifies popcount on the carried hashes inline,
and dedups locally; the same pair surfacing via bands in DIFFERENT
partitions dedups in one final grouped pass over the (small) pair set.

Degenerate bands (e.g. an all-zero band shared by most of a synthetic
corpus) make a bucket O(size^2); ``max_band_size`` caps them (capped
buckets are SKIPPED and counted — recall then depends on another band
matching, the minhash band-cap trade). Default 0 = exact, no cap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    b = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return b.reshape(len(x), 64).sum(axis=1).astype(np.int64)


def band_bounds(n_bands: int, width: int = 64) -> list:
    """[(start_bit, n_bits)] — near-equal widths covering all 64 bits."""
    base, extra = divmod(width, n_bands)
    out, start = [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        out.append((start, w))
        start += w
    return out


def hamming_near_pairs(
    ds: "ray.data.Dataset",
    hash_col: str,
    id_col: str,
    max_dist: int,
    a_col: str = "id_a",
    b_col: str = "id_b",
    band_arity: int = 2,
    max_band_size: int = 0,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """(id, hash) rows -> distinct (id_a < id_b, dist) pairs with
    hamming(hash_a, hash_b) <= max_dist. Exact when max_band_size=0.
    ``band_arity`` trades shuffle volume (C(d+arity, arity) rows per
    input) for exponentially fewer bucket collisions."""
    from itertools import combinations

    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    n_blocks = max_dist + band_arity
    bounds = band_bounds(n_blocks)
    combos = list(combinations(range(n_blocks), band_arity))

    def explode(b: pa.Table) -> pa.Table:
        h = b.column(hash_col).to_numpy(zero_copy_only=False).view(
            np.uint64)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        n = len(h)
        blocks = [((h >> np.uint64(start)) & np.uint64((1 << w) - 1))
                  for start, w in bounds]
        bands, bvals = [], []
        for bi, combo in enumerate(combos):
            val = np.zeros(n, dtype=np.uint64)
            shift = 0
            for ci in combo:
                val |= blocks[ci] << np.uint64(shift)
                shift += bounds[ci][1]
            bands.append(np.full(n, bi, dtype=np.int64))
            bvals.append(val.view(np.int64))
        return pa.table({
            id_col: pa.array(np.tile(ids, len(combos))),
            hash_col: pa.array(np.tile(h.view(np.int64), len(combos)),
                               pa.int64()),
            "band": pa.array(np.concatenate(bands), pa.int64()),
            "bval": pa.array(np.concatenate(bvals), pa.int64()),
        })

    hashed = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        lambda b: add_hash_column(b, ["band", "bval"], out_col="_bh"),
        batch_format="pyarrow")

    def pairs_fold(t: pa.Table) -> pa.Table:
        d = (t.select(["band", "bval", id_col, hash_col]).to_pandas()
             .drop_duplicates(["band", "bval", id_col]))
        if max_band_size:
            sizes = d.groupby(["band", "bval"])[id_col].transform("size")
            d = d[sizes <= max_band_size]
        m = d.merge(d, on=["band", "bval"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return pa.table({a_col: pa.array([], pa.int64()),
                             b_col: pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        xor = (m[f"{hash_col}_a"].to_numpy().view(np.uint64)
               ^ m[f"{hash_col}_b"].to_numpy().view(np.uint64))
        dist = popcount64(xor)
        m = m.assign(dist=dist)[dist <= max_dist]
        out = m[[f"{id_col}_a", f"{id_col}_b", "dist"]].drop_duplicates(
            [f"{id_col}_a", f"{id_col}_b"])
        return pa.table({
            a_col: pa.array(out[f"{id_col}_a"].to_numpy(np.int64)),
            b_col: pa.array(out[f"{id_col}_b"].to_numpy(np.int64)),
            "dist": pa.array(out["dist"].to_numpy(np.int64)),
        })

    pairs = hash_partition_map(hashed, "_bh", pairs_fold,
                               num_partitions=num_partitions)
    # cross-partition dedup (a pair can surface via bands in different
    # partitions); dist is a function of the pair, so min==max==dist
    return grouped_sums(pairs, [a_col, b_col], [], count_alias="_n",
                        min_cols=["dist"]).map_batches(
        lambda b: pa.table({a_col: b.column(a_col),
                            b_col: b.column(b_col),
                            "dist": b.column("min_dist")}),
        batch_format="pyarrow")
