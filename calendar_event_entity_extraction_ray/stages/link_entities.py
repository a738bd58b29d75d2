"""S4: entity linking — stateful actor pool with a broadcast alias dict.

Analogue of the reference's entity-pool lookup (augmentation/augmentors.py:
16-39, entity_pools.py:7-20) generalized to canonical resolution: exact
case-insensitive dict hit, then MinHash-blocked n-gram-Jaccard fuzzy match
(functions/linking.py).

Broadcast pattern: the driver ``ray.put``s the alias rows ONCE; each actor
fetches them in ``__init__`` and builds the lookup + LSH index locally. The
alias table never ships per batch, and linking never shuffles the triples.
A per-actor memo cache short-circuits repeated surfaces (hub entities make
surface distributions heavily skewed, so the hit rate is high).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import pyarrow as pa

from calendar_event_entity_extraction_ray.functions.linking import EntityLinker


class LinkEntities:
    """map_batches(LinkEntities, concurrency=N,
    fn_constructor_kwargs={"alias_ref": ray.put(alias_rows)})."""

    def __init__(self, alias_ref=None, canonicals=None) -> None:
        alias_rows = None
        if alias_ref is not None:
            import ray

            alias_rows = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self.linker = EntityLinker(alias_rows=alias_rows, canonicals=canonicals)
        self.memo: Dict[Tuple[str, str], Optional[str]] = {}

    _MEMO_CAP = 1_000_000  # per-actor; web-scale distinct surfaces are unbounded

    def _link(self, surface: Optional[str], kind: str) -> Optional[str]:
        if surface is None or not kind:
            return surface
        key = (kind, surface)
        hit = self.memo.get(key)
        if hit is None and key not in self.memo:
            hit = self.linker.link(surface, kind)
            if len(self.memo) >= self._MEMO_CAP:
                self.memo.clear()
            self.memo[key] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        objs = batch.column("obj").to_pylist()
        kinds = batch.column("kind").to_pylist()
        linked = [self._link(o, k) for o, k in zip(objs, kinds)]
        i = batch.column_names.index("obj")
        return batch.set_column(i, "obj", pa.array(linked, pa.string()))
