"""Entity resolution over surface strings — edit-distance clustering.

KG construction accumulates near-identical entity surface forms (typos,
OCR noise, inconsistent spellings: "Jonh Smith" next to "John Smith").
The reference engine links mentions against a KNOWN entity pool
(stages/link_entities.py mirrors its top-500 pools); this stage handles
the pool-free case — no authority list, just the corpus — by clustering
all surface forms within edit distance ``max_d`` and mapping every form
to a deterministic cluster canonical:

  1. distinct surfaces: content-hash exchange (stages/dedup.py
     exact_dedup — a hot surface ships one row per batch);
  2. exact edit-distance pair join — TWO engines, routed by ``method``:
       * ``deletions`` (SymSpell blocking; the short-surface scale
         path): explode each surface into its depth-``max_d`` deletion
         neighborhood, exchange on the variant key — any pair within
         distance ``max_d`` shares a variant (proof at
         functions/editdist.py:deletion_variants) — verify candidates
         with the Myers kernel inside tiny buckets, then one distinct
         exchange collapses the same pair found under several shared
         variants. Linear in n x neighborhood; immune to the
         same-length-corpus blowup of length banding.
       * ``bands`` (stages/editdist.py; the long-document path):
         lossless length banding + char-bag prune. Deletion
         neighborhoods of 10 KB documents are enormous, length spread
         keeps the in-band windows small — the regimes are opposites.
  3. connected components over the pair graph (stages/graph.py —
     min-label propagation; MIN over strings = lexicographic, which a
     SQL oracle can replay exactly);
  4. canonical = component minimum; singleton surfaces (no pair within
     distance) map to themselves via a LEFT join.

Everything flows through the exchange — nothing driver-side grows with
the vocabulary.

Transitivity is inherent to resolution-by-clustering: A~B and B~C chain
into one entity even when dist(A, C) > max_d. That is the standard
entity-resolution semantics (and what the recursive-CTE oracle
replays) — not a bug.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data


def deletion_neighborhood_pairs(
    ds: "ray.data.Dataset",
    col: str,
    max_d: int = 1,
    num_partitions: Optional[int] = None,
    max_bucket: int = 2000,
) -> "ray.data.Dataset":
    """All distinct pairs (a < b, levenshtein <= max_d) over the DISTINCT
    values of ``col`` via SymSpell deletion blocking. Input rows must
    already be distinct on ``col`` (resolve_surface_forms guarantees
    it). ``max_bucket`` caps the O(size^2) verify inside one variant
    bucket — the same not-silent mitigation as the MinHash band cap
    (stages/dedup.py:270); realistic surface corpora never approach it
    (a bucket is "all surfaces sharing one specific deletion variant")."""
    from calendar_event_entity_extraction_ray.functions.editdist import (
        deletion_variants,
        myers_distance,
    )
    from calendar_event_entity_extraction_ray.stages.dedup import (
        add_hash_column,
        exact_dedup,
    )
    from calendar_event_entity_extraction_ray.stages.exchange import (
        hash_partition_map,
    )

    a_col, b_col = f"{col}_a", f"{col}_b"

    def explode(b: pa.Table) -> pa.Table:
        keys: list = []
        ss: list = []
        for s in b.column(col).to_pylist():
            if s is None:
                continue
            for v in deletion_variants(s, max_d):
                keys.append(v)
                ss.append(s)
        t = pa.table({"_vkey": pa.array(keys, pa.string()),
                      col: pa.array(ss, pa.string())})
        return add_hash_column(t, ["_vkey"], out_col="_kh")

    def fold(t: pa.Table) -> pa.Table:
        df = t.select(["_vkey", col]).to_pandas()
        # almost every variant bucket is a singleton (one surface emitted
        # it, nothing else shares it) — drop them VECTORIZED before the
        # per-bucket Python loop, which then only walks candidate buckets
        # (dup-rate-sized, not neighborhood-sized)
        df = df[df.duplicated("_vkey", keep=False)]
        out_a: list = []
        out_b: list = []
        out_d: list = []
        n_skipped = 0
        for _, grp in df.groupby("_vkey", sort=False):
            ss = sorted(set(grp[col]))
            n = len(ss)
            if n < 2:
                continue
            if n > max_bucket:
                n_skipped += n
                continue
            for i in range(n):
                for j in range(i + 1, n):
                    d = myers_distance(ss[i], ss[j], max_d=max_d)
                    if d <= max_d:
                        out_a.append(ss[i])
                        out_b.append(ss[j])
                        out_d.append(d)
        if n_skipped:
            import logging

            logging.getLogger(__name__).warning(
                "deletion_neighborhood_pairs: skipped %d surfaces in "
                "oversized variant buckets (> %d); raise max_bucket or "
                "pre-block the corpus", n_skipped, max_bucket)
        return pa.table({
            a_col: pa.array(out_a, pa.string()),
            b_col: pa.array(out_b, pa.string()),
            "dist": pa.array(np.asarray(out_d, dtype=np.int64)),
        })

    cand = hash_partition_map(
        ds.map_batches(explode, batch_format="pyarrow"),
        "_kh", fold, num_partitions=num_partitions)
    # the same pair verifies under EVERY shared variant — distinct once
    # (dist is a function of the pair, so first-wins is value-stable)
    return exact_dedup(cand, key_cols=[a_col, b_col], order_col="dist",
                       num_partitions=num_partitions)


def resolve_surface_forms(
    ds: "ray.data.Dataset",
    col: str = "surface",
    max_d: int = 1,
    method: str = "auto",
    band_width: int = 0,
    num_partitions: Optional[int] = None,
    canonical: str = "min",
) -> "ray.data.Dataset":
    """(surface, entity_id) for every distinct non-null value of ``col``.
    ``method``: ``deletions`` | ``bands`` | ``auto`` (= deletions for
    max_d <= 2, the short-surface regime it was built for, else bands).
    ``canonical`` picks the cluster representative:

      * ``min`` — lexicographically smallest member (pure function of
        the cluster; what the recursive-CTE SQL oracle replays);
      * ``frequent`` — the member with the MOST INPUT MENTIONS (ties ->
        lexicographic min), the practical ER choice: the common spelling
        wins over the typo. Mention counts come from a grouped count
        over the raw input (pre-distinct), the winner per cluster from
        an ARGMAX exchange (stages/aggregate.py:extreme_row_per_group).
    """
    from calendar_event_entity_extraction_ray.stages.dedup import (
        exact_dedup,
    )
    from calendar_event_entity_extraction_ray.stages.editdist import (
        levenshtein_pairs,
    )
    from calendar_event_entity_extraction_ray.stages.graph import (
        connected_components,
    )
    from calendar_event_entity_extraction_ray.stages.joins import hash_join

    if method == "auto":
        method = "deletions" if max_d <= 2 else "bands"
    if canonical not in ("min", "frequent"):
        raise ValueError(f"canonical={canonical!r}: min | frequent")

    def project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = b.column(col)
        return pa.table({col: c.filter(pc.is_valid(c))})

    # materialize: the distinct-surface exchange output is consumed by
    # BOTH the pair join and the final left join — lazy exchange outputs
    # re-run per consumer (round-2.5 fact)
    surfaces = exact_dedup(ds.map_batches(project, batch_format="pyarrow"),
                           key_cols=[col], order_col=col,
                           num_partitions=num_partitions).materialize()

    if method == "deletions":
        pairs = deletion_neighborhood_pairs(
            surfaces, col, max_d=max_d, num_partitions=num_partitions)
    elif method == "bands":
        # duplicate the surface: editdist needs distinct id/text column
        # names, and using the surface AS the id makes the pair output
        # (surface_a, surface_b) without a rank indirection
        with_txt = surfaces.map_batches(
            lambda b: b.append_column("_txt", b.column(col)),
            batch_format="pyarrow")
        pairs = levenshtein_pairs(with_txt, max_d, id_col=col,
                                  text_col="_txt", band_width=band_width)
    else:
        raise ValueError(f"method={method!r}: deletions | bands | auto")

    # pin the (dup-rate-sized) pair list: CC consumes it for the edge
    # scan AND the schema probe, and exchange outputs are lazy — each
    # consumer would re-run the whole pair exchange (round-2.5 fact)
    pairs = pairs.materialize()
    comps = connected_components(pairs, f"{col}_a", f"{col}_b",
                                 num_partitions=num_partitions)
    comps = comps.map_batches(
        lambda b: pa.table({col: b.column("node"),
                            "_canon": b.column("cluster")}),
        batch_format="pyarrow")

    if canonical == "frequent":
        from calendar_event_entity_extraction_ray.stages.aggregate import (
            extreme_row_per_group,
            grouped_count,
        )

        # mention counts over the RAW input (pre-distinct); the cluster
        # winner is argmax(n, then lexicographic min). Singletons never
        # enter comps and stay self-canonical — a one-member cluster's
        # argmax IS itself, so the semantics agree.
        counts = grouped_count(
            ds.map_batches(project, batch_format="pyarrow"), col,
            out_col="_n_mentions")
        comps = comps.materialize()  # consumed by two joins below
        membered = hash_join(
            comps.map_batches(
                lambda b: pa.table({col: b.column(col),
                                    "_cluster": b.column("_canon")}),
                batch_format="pyarrow"),
            counts, key=col, left_cols=[col, "_cluster"],
            right_cols=[col, "_n_mentions"], num_buckets=num_partitions)
        winners = extreme_row_per_group(
            membered, ["_cluster"],
            [("_n_mentions", "descending"), (col, "ascending")])
        canon_tbl = winners.map_batches(
            lambda b: pa.table({"_cluster": b.column("_cluster"),
                                "_winner": b.column(col)}),
            batch_format="pyarrow")
        comps = hash_join(
            comps.map_batches(
                lambda b: pa.table({col: b.column(col),
                                    "_cluster": b.column("_canon")}),
                batch_format="pyarrow"),
            canon_tbl, key="_cluster",
            left_cols=[col, "_cluster"], right_cols=["_cluster", "_winner"],
            num_buckets=num_partitions)
        comps = comps.map_batches(
            lambda b: pa.table({col: b.column(col),
                                "_canon": b.column("_winner")}),
            batch_format="pyarrow")

    joined = hash_join(
        surfaces, comps, key=col,
        left_cols=[col], right_cols=[col, "_canon"],
        how="left", num_buckets=num_partitions)

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a block whose _canon values are ALL null arrives arrow-typed
        # `null` (the pandas join fold erases the dtype — CLAUDE.md
        # round-3 fact); coalesce(null, string) has no kernel
        canon = b.column("_canon").cast(b.schema.field(col).type)
        return pa.table({
            col: b.column(col),
            "entity_id": pc.coalesce(canon, b.column(col)),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def resolve_graph_entities(
    triples: "ray.data.Dataset",
    kinds=("person", "place"),
    obj_col: str = "obj",
    kind_col: str = "kind",
    max_d: int = 1,
    num_partitions: Optional[int] = None,
    broadcast_max: int = 2_000_000,
) -> "ray.data.Dataset":
    """Rewrite linkable entity objects of a triple stream to their
    resolved canonical form (KG post-linking canonicalization: typo'd
    surface forms that the alias dictionary does not know collapse into
    one node).

    Surfaces are resolved PER KIND — a person form never merges with a
    place form. Only CHANGED surfaces (entity_id != surface) need a
    lookup at rewrite time; identity mappings are free — so the rewrite
    table is dup-rate-sized, not vocabulary-sized. Two rewrite regimes
    (same split as stages/decontam.py):

      * broadcast (changed <= broadcast_max): the rewrite table ships
        once via ray.put as Arrow arrays (plasma zero-copy) and every
        triple block rewrites VECTORIZED (index_in -> take -> if_else);
      * exchange (bigger): composite-key (kind, obj) LEFT hash join +
        coalesce — nothing driver-side grows with the dup rate.

    Canonicalization can create duplicate triples; a per-batch local
    dedup runs here, and the graph materialize's per-partition distinct
    (pipelines/kg.py) makes the global set exact — dedup-by-design."""
    import ray

    import pyarrow.compute as pc

    from calendar_event_entity_extraction_ray.stages.dedup import (
        dedup_triples_batch,
    )
    from calendar_event_entity_extraction_ray.stages.joins import hash_join

    # the triple stream is consumed len(kinds)+1 times (one mention scan
    # per kind + the rewrite) — pin it once; re-running a lazy upstream
    # extract 3x costs more than letting the object store spill blocks
    triples = triples.materialize()

    changed_parts = []
    for k in kinds:
        def mentions_of(b: pa.Table, _k=k) -> pa.Table:
            m = pc.equal(b.column(kind_col), _k)
            return pa.table({obj_col: b.column(obj_col).filter(m)})

        mapping = resolve_surface_forms(
            triples.map_batches(mentions_of, batch_format="pyarrow"),
            col=obj_col, max_d=max_d, num_partitions=num_partitions)

        def only_changed(b: pa.Table, _k=k) -> pa.Table:
            keep = pc.invert(pc.equal(b.column(obj_col),
                                      b.column("entity_id")))
            t = b.filter(keep)
            return pa.table({
                kind_col: pa.array([_k] * t.num_rows, pa.string()),
                obj_col: t.column(obj_col),
                "_canon": t.column("entity_id"),
            })

        changed_parts.append(mapping.map_batches(
            only_changed, batch_format="pyarrow"))

    changed = changed_parts[0]
    for p in changed_parts[1:]:
        changed = changed.union(p)
    return _rewrite_changed(triples, changed, kinds, obj_col, kind_col,
                            broadcast_max, num_partitions)


def _rewrite_changed(
    triples: "ray.data.Dataset",
    changed: "ray.data.Dataset",
    kinds,
    obj_col: str,
    kind_col: str,
    broadcast_max: int,
    num_partitions: Optional[int],
) -> "ray.data.Dataset":
    """Apply a (kind, surface) -> canonical rewrite table to a triple
    stream — the shared back half of resolve_graph_entities and its
    registry-backed stable variant. Two regimes (see caller docstring)."""
    import ray

    import pyarrow.compute as pc

    from calendar_event_entity_extraction_ray.stages.dedup import (
        dedup_triples_batch,
    )
    from calendar_event_entity_extraction_ray.stages.joins import hash_join

    changed = changed.materialize()
    n_changed = changed.count()
    if n_changed == 0:
        return triples

    if n_changed <= broadcast_max:
        # group driver-side into per-kind Arrow arrays (bounded by
        # broadcast_max rows)
        parts: dict = {k: ([], []) for k in kinds}
        for b in changed.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            ks = b.column(kind_col).to_pylist()
            os_ = b.column(obj_col).to_pylist()
            cs = b.column("_canon").to_pylist()
            for kk, oo, cc in zip(ks, os_, cs):
                parts[kk][0].append(oo)
                parts[kk][1].append(cc)
        ref = ray.put({k: (pa.array(v[0], pa.string()),
                           pa.array(v[1], pa.string()))
                       for k, v in parts.items() if v[0]})

        def rewrite(b: pa.Table, *, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            obj = b.column(obj_col)
            if isinstance(obj, pa.ChunkedArray):
                obj = obj.combine_chunks()
            kind_arr = b.column(kind_col)
            for kk, (surfs, canons) in m.items():
                idx = pc.index_in(obj, value_set=surfs)
                mapped = pc.take(canons, idx)
                mask = pc.and_kleene(pc.equal(kind_arr, kk),
                                     pc.is_valid(mapped))
                mask = pc.fill_null(mask, False)
                obj = pc.if_else(mask, mapped, obj)
            out = b.set_column(b.schema.get_field_index(obj_col),
                               obj_col, obj)
            return dedup_triples_batch(out)

        return triples.map_batches(rewrite, batch_format="pyarrow")

    # exchange regime: (kind, obj) LEFT join + coalesce
    tcols = triples.schema().names
    joined = hash_join(
        triples, changed, key=[kind_col, obj_col],
        left_cols=tcols, right_cols=[kind_col, obj_col, "_canon"],
        how="left", num_buckets=num_partitions)

    def finish(b: pa.Table) -> pa.Table:
        canon = b.column("_canon").cast(pa.string())
        obj = pc.coalesce(canon, b.column(obj_col))
        out = b.drop_columns(["_canon"])
        out = out.set_column(out.schema.get_field_index(obj_col),
                             obj_col, obj)
        return dedup_triples_batch(out.select(tcols))

    return joined.map_batches(finish, batch_format="pyarrow")


def resolve_graph_entities_stable(
    triples: "ray.data.Dataset",
    store_root: str,
    epoch: str,
    kinds=("person", "place"),
    obj_col: str = "obj",
    kind_col: str = "kind",
    max_d: int = 1,
    num_partitions: Optional[int] = None,
    broadcast_max: int = 2_000_000,
) -> "ray.data.Dataset":
    """Registry-backed KG canonicalization: like resolve_graph_entities,
    but surfaces register into a PERSISTENT per-kind entity registry
    (stages/entityreg.py, sharded store under ``<store_root>/kind=<k>``)
    so canonical ids stay STABLE across crawl epochs — an entity minted
    in epoch 1 keeps its id when epoch 2 adds typos of it, where the
    batch resolver would re-cluster and could re-pick canonicals.
    Registration is idempotent per (store, epoch); the rewrite table is
    the registry lookup filtered to changed surfaces (dup-rate-sized)."""
    import os

    import pyarrow.compute as pc

    from calendar_event_entity_extraction_ray.stages.entityreg import (
        lookup_surfaces,
        register_epoch,
    )

    triples = triples.materialize()

    changed_parts = []
    for k in kinds:
        def mentions_of(b: pa.Table, _k=k) -> pa.Table:
            m = pc.equal(b.column(kind_col), _k)
            return pa.table({obj_col: b.column(obj_col).filter(m)})

        mentions = triples.map_batches(mentions_of, batch_format="pyarrow")
        store = os.path.join(store_root, f"kind={k}")
        register_epoch(mentions, store, epoch, col=obj_col, max_d=max_d,
                       num_partitions=num_partitions or 64)
        mapping = lookup_surfaces(mentions, store, col=obj_col,
                                  num_partitions=num_partitions)

        def only_changed(b: pa.Table, _k=k) -> pa.Table:
            ent = b.column("entity_id").cast(pa.string())
            keep = pc.invert(pc.equal(b.column(obj_col), ent))
            t = b.filter(pc.fill_null(keep, False))
            return pa.table({
                kind_col: pa.array([_k] * t.num_rows, pa.string()),
                obj_col: t.column(obj_col),
                "_canon": t.column("entity_id").cast(pa.string()),
            })

        changed_parts.append(mapping.map_batches(
            only_changed, batch_format="pyarrow"))

    changed = changed_parts[0]
    for p in changed_parts[1:]:
        changed = changed.union(p)
    return _rewrite_changed(triples, changed, kinds, obj_col, kind_col,
                            broadcast_max, num_partitions)
