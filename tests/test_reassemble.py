"""Round-trip: extract -> emit triples -> reassemble == extracted events."""

from __future__ import annotations


class TestReassemble:
    def test_roundtrip(self, ray_session):
        from calendar_event_entity_extraction_ray import TARGET_KEYS
        from calendar_event_entity_extraction_ray.pipelines.kg import (
            extract_stage,
            kg_triples,
            synth_pages_dataset,
        )
        from calendar_event_entity_extraction_ray.stages.reassemble import (
            reassemble_events,
        )

        import pyarrow as pa

        import ray

        from calendar_event_entity_extraction_ray.stages.dedup import (
            dedup_triples_batch,
        )
        from calendar_event_entity_extraction_ray.stages.emit_triples import (
            emit_triples_batch,
        )

        pages = synth_pages_dataset(120, seed=5)
        # events straight from the extractor vs events rebuilt from UNLINKED
        # triples (linking would canonicalize aliases and change the base)
        events_ds = extract_stage(pages)
        events = pa.concat_tables(ray.get(events_ds.to_arrow_refs()))
        triples = (extract_stage(synth_pages_dataset(120, seed=5))
                   .map_batches(emit_triples_batch, batch_format="pyarrow")
                   .map_batches(dedup_triples_batch, batch_format="pyarrow"))
        rebuilt = pa.concat_tables(ray.get(reassemble_events(triples).to_arrow_refs()))

        def key(t: pa.Table):
            out = {}
            for i in range(t.num_rows):
                eid = t.column("event_id")[i].as_py()
                slots = {}
                for k in TARGET_KEYS:
                    v = t.column(k)[i].as_py()
                    if k == "attendees" and v is not None:
                        v = tuple(sorted(set(v)))
                    slots[k] = v
                out[eid] = slots
            return out

        a, b = key(events), key(rebuilt)
        assert set(a) == set(b)
        mismatches = {e: (a[e], b[e]) for e in a if a[e] != b[e]}
        assert not mismatches, list(mismatches.items())[:3]
