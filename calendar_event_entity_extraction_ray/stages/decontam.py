"""Train/eval n-gram decontamination.

The GPT-3-style benchmark-contamination check: flag every training
document that shares at least one word n-gram with any document of the
held-out (eval/benchmark) side, so it can be dropped or audited before
pretraining. (Reference scope note: the reference repo guards leakage by
exact text signature only — ``augmentation/augmentors.py`` anti-join,
covered by ``stages/split.py:drop_split_leakage``; n-gram overlap is the
engine-brief generalization of that check to fuzzy containment.)

Tokenization is ``text.split(' ')`` (empties kept) — byte-parity with
DuckDB ``string_split`` so the operator carries a real SQL oracle.

Two regimes, same exact result:

- **broadcast** (eval side small — the usual case: benchmarks are MBs,
  corpora are TBs): the eval side's distinct gram strings are collected
  once driver-side, ``ray.put`` once, and every train task membership-
  tests its docs' grams against the shared set. One streaming pass over
  the corpus, no shuffle. Exact string membership — no hash-collision
  false positives.
- **exchange** (eval side too large to hold in one heap): both sides
  explode to per-doc-distinct ``(doc_id, gram, side)`` rows, partition by
  a 64-bit gram hash on the explicit exchange, and each partition fold
  does an exact gram-string semi join (hash is the partition key ONLY —
  equal grams co-locate, membership is string equality, per the repo's
  64-bit-keys/exact-recheck convention). A final tiny distinct collapses
  multi-gram hits to one row per doc. Nothing driver-side grows with
  either corpus.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray
import ray.data

# Above this many eval-side ROWS (docs), auto mode stops trusting the
# driver-side gram set to fit and routes through the exchange. ~100k docs
# x ~100 grams x ~30 B is ~300 MB of set — the practical single-heap edge.
BROADCAST_MAX_EVAL_DOCS = 100_000

# Bloom regime defaults: 2^23 bits = 1 MiB of filter regardless of eval
# volume; k=7 probes ≈ 0.5% false-positive rate at 16 bits/key (~500k
# grams), and false positives only cost exact re-verification work.
BLOOM_DEFAULT_BITS = 1 << 23
BLOOM_K = 7


def _bloom_positions(h, m_bits: int, k: int):
    """(len(h), k) bit positions via double hashing pos_i = h1 + i*h2.

    h is the repo's 63-bit content hash (int64); h2 is a splitmix64
    scramble forced odd so consecutive probes never alias. All uint64
    wraparound arithmetic — process-stable, vectorized."""
    import numpy as np

    h1 = h.astype(np.uint64)
    z = (h1 + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def eval_gram_bloom(
    eval_ds: "ray.data.Dataset",
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m_bits: int = BLOOM_DEFAULT_BITS,
    k: int = BLOOM_K,
):
    """Bloom filter over the eval side's distinct grams as a MERGEABLE
    per-batch partial: each eval block folds its grams into one fixed
    m_bits bitset row; the driver ORs the block partials. Driver memory
    is m_bits/8 bytes no matter how large the eval corpus is — the set
    of gram STRINGS never exists anywhere."""
    import numpy as np

    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )

    words = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        t = gram_explode_batch(b, doc_id_col, text_col, n)
        bits = np.zeros(words, dtype=np.uint64)
        if t.num_rows:
            h = add_hash_column(t, ["gram"], out_col="_gh") \
                .column("_gh").to_numpy()
            pos = _bloom_positions(h, m_bits, k).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(words, dtype=np.uint64)
    for b in eval_ds.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for buf in b.column("bits").to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint64)
    return merged


def gram_explode_batch(b: pa.Table, doc_id_col: str, text_col: str,
                       n: int) -> pa.Table:
    """Explode a batch to (doc_id, gram) with PER-DOC distinct grams.

    Per-doc dedupe here bounds the exchange: a doc repeating one phrase
    1000x ships it once. NULL text yields no rows (SQL: string_split(NULL)
    is NULL, the lateral unnest emits nothing)."""
    ids_out: list = []
    grams_out: list = []
    for did, txt in zip(b.column(doc_id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
        if txt is None:
            continue
        toks = txt.split(" ")
        if len(toks) < n:
            continue
        seen = set()
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            if g not in seen:
                seen.add(g)
                ids_out.append(did)
                grams_out.append(g)
    return pa.table({
        doc_id_col: pa.array(ids_out, b.schema.field(doc_id_col).type),
        "gram": pa.array(grams_out, pa.string()),
    })


def contaminated_doc_ids(
    train_ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    mode: str = "auto",
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Distinct train-side doc_ids sharing >= 1 word n-gram with eval.

    ``mode``: "broadcast" | "exchange" | "bloom" | "auto" (auto counts
    the eval side's docs — parquet-metadata cheap on a read, one
    execution on a derived dataset — and broadcasts below
    BROADCAST_MAX_EVAL_DOCS). All modes return the identical exact
    result; tests pin that.

    **bloom**: the 100-TB-both-sides regime. The eval grams fold into a
    fixed 1 MiB Bloom bitset (mergeable per-block partials, driver ORs
    them), every train task prefilters its docs against the broadcast
    bitset (no false negatives), and ONLY the bloom-positive docs — the
    contaminated fraction plus a ~0.5% false-positive tail — take the
    exact-string exchange verify. Driver state is constant-size; the
    exchange moves candidate grams, not corpus grams.
    """
    if mode == "auto":
        mode = ("broadcast" if eval_ds.count() <= BROADCAST_MAX_EVAL_DOCS
                else "exchange")

    if mode == "bloom":
        import numpy as np

        from calendar_event_entity_extraction_ray.stages.dedup import (
            add_hash_column,
        )

        bits = eval_gram_bloom(eval_ds, doc_id_col=doc_id_col,
                               text_col=text_col, n=n)
        m_bits = len(bits) * 64
        bits_ref = ray.put(bits)

        def prefilter(b: pa.Table) -> pa.Table:
            t = gram_explode_batch(b, doc_id_col, text_col, n)
            if t.num_rows == 0:
                return b.slice(0, 0)
            bs = ray.get(bits_ref)
            h = add_hash_column(t, ["gram"], out_col="_gh") \
                .column("_gh").to_numpy()
            pos = _bloom_positions(h, m_bits, BLOOM_K)
            hit = np.ones(len(h), dtype=bool)
            for j in range(BLOOM_K):
                p = pos[:, j]
                hit &= (bs[(p >> np.uint64(6)).astype(np.int64)]
                        >> (p & np.uint64(63))) & np.uint64(1) != 0
            cand = set(np.asarray(
                t.column(doc_id_col).to_numpy(zero_copy_only=False))[hit]
                .tolist())
            import pyarrow.compute as pc
            keep = pc.is_in(b.column(doc_id_col),
                            value_set=pa.array(
                                sorted(cand),
                                b.schema.field(doc_id_col).type))
            return b.filter(keep)

        candidates = train_ds.map_batches(prefilter, batch_format="pyarrow")
        # exact-string verification on the candidate slice only; Bloom
        # guarantees no false negatives, so this equals the full check
        return contaminated_doc_ids(
            candidates, eval_ds, doc_id_col=doc_id_col, text_col=text_col,
            n=n, mode="exchange", num_partitions=num_partitions)

    if mode == "broadcast":
        # collect ONLY the distinct gram strings, never eval rows
        eval_grams: set = set()
        exploded = eval_ds.map_batches(
            lambda b: gram_explode_batch(b, doc_id_col, text_col, n),
            batch_format="pyarrow")
        for b in exploded.select_columns(["gram"]).iter_batches(
                batch_format="pyarrow", batch_size=None):
            eval_grams.update(b.column("gram").to_pylist())
        grams_ref = ray.put(eval_grams)

        def flag(b: pa.Table) -> pa.Table:
            gset = ray.get(grams_ref)
            hit_ids = []
            for did, txt in zip(b.column(doc_id_col).to_pylist(),
                                b.column(text_col).to_pylist()):
                if txt is None:
                    continue
                toks = txt.split(" ")
                for i in range(len(toks) - n + 1):
                    if " ".join(toks[i:i + n]) in gset:
                        hit_ids.append(did)
                        break
            return pa.table({doc_id_col: pa.array(
                hit_ids, b.schema.field(doc_id_col).type)})

        # doc_id is unique per input row -> output already distinct
        return train_ds.map_batches(flag, batch_format="pyarrow")

    if mode != "exchange":
        raise ValueError(f"unknown decontam mode: {mode!r}")

    from calendar_event_entity_extraction_ray.stages.aggregate import (
        grouped_sums,
    )
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    def explode_side(ds: "ray.data.Dataset", side: str) -> "ray.data.Dataset":
        def ex(b: pa.Table) -> pa.Table:
            t = gram_explode_batch(b, doc_id_col, text_col, n)
            t = t.append_column(
                "side", pa.array([side] * t.num_rows, pa.string()))
            return add_hash_column(t, ["gram"], out_col="_gh")
        return ds.map_batches(ex, batch_format="pyarrow")

    both = explode_side(train_ds, "t").union(explode_side(eval_ds, "e"))

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ev = set(df.loc[df["side"] == "e", "gram"])
        tr = df[df["side"] == "t"]
        hits = tr.loc[tr["gram"].isin(ev), doc_id_col].unique()
        return pa.table({doc_id_col: pa.array(
            hits, t.schema.field(doc_id_col).type)})

    hits = hash_partition_map(both, "_gh", fold,
                              num_partitions=num_partitions)
    # one doc can hit in many gram partitions -> tiny final distinct
    out = grouped_sums(hits, key_cols=[doc_id_col], sum_cols=[])
    return out.drop_columns(["n"])
