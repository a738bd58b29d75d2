"""CDC chunking + chunk-level dedup (stages/cdcdedup.py): chunker
invariants (sizes, reassembly, batch==single-doc kernel), the
content-defined RESYNC property (an insertion shifts early chunks but
later chunks re-align), and distributed dedup vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from calendar_event_entity_extraction_ray.stages.cdcdedup import (
    cdc_chunk_batch,
    cdc_dedup_docs,
    chunk_doc,
)


def _rand_text(n, seed):
    rng = np.random.RandomState(seed)
    return bytes(rng.randint(97, 123, size=n, dtype=np.uint8)).decode()


class TestChunker:
    def test_reassembly_and_size_bounds(self):
        buf = _rand_text(5000, 1).encode()
        chunks = chunk_doc(buf, min_size=32, mask_bits=6, max_size=256)
        assert b"".join(chunks) == buf
        # all but the final chunk respect min_size; all respect max_size
        assert all(len(c) <= 256 for c in chunks)
        assert all(len(c) >= 32 for c in chunks[:-1])
        assert len(chunks) > 5  # avg ~64B: plenty of cuts in 5000B

    def test_short_and_empty_docs(self):
        assert chunk_doc(b"") == []
        assert chunk_doc(b"abc") == [b"abc"]          # < window
        assert b"".join(chunk_doc(b"x" * 40)) == b"x" * 40

    def test_max_size_forced_cuts_on_no_candidates(self):
        # constant bytes give one repeated window hash; if it doesn't
        # trigger the mask, only forced cuts occur -> exact max_size runs
        buf = b"\x00" * 1000
        chunks = chunk_doc(buf, min_size=32, mask_bits=20, max_size=128)
        assert b"".join(chunks) == buf
        assert all(len(c) == 128 for c in chunks[:-1])

    def test_resync_after_insertion(self):
        """THE content-defined property: insert one byte at the front —
        fixed-size chunking would shift every boundary; CDC re-syncs and
        most chunk contents are shared."""
        a = _rand_text(8000, 7).encode()
        b = b"Z" + a
        ca, cb = set(chunk_doc(a)), set(chunk_doc(b))
        shared = len(ca & cb)
        assert shared / max(len(ca), 1) > 0.8

    def test_batch_kernel_matches_single_doc(self):
        """The concatenated-buffer batch kernel must cut exactly like the
        per-doc reference (doc boundaries never leak into windows)."""
        docs = [_rand_text(n, s) for n, s in
                [(0, 0), (10, 1), (500, 2), (3000, 3), (47, 4), (3000, 3)]]
        batch = pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        })
        out = cdc_chunk_batch(batch).to_pandas()
        for i, d in enumerate(docs):
            want = chunk_doc(d.encode())
            got = out[out.doc_id == i].sort_values("offset")
            assert got["nbytes"].tolist() == [len(c) for c in want]
            exp_off = (list(np.cumsum([0] + [len(c) for c in want[:-1]]))
                       if want else [])
            assert got["offset"].tolist() == exp_off

    def test_chunk_hashes_are_content_stable(self):
        """Same chunk content in different docs/batches -> same (h1, h2)."""
        t = _rand_text(2000, 9)
        b1 = pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array([t], pa.string())})
        b2 = pa.table({"doc_id": pa.array([2], pa.int64()),
                       "text": pa.array([t], pa.string())})
        h1 = cdc_chunk_batch(b1).to_pandas()[["offset", "h1", "h2"]]
        h2 = cdc_chunk_batch(b2).to_pandas()[["offset", "h1", "h2"]]
        pd.testing.assert_frame_equal(h1, h2)


def _brute_dedup(docs):
    """Exact first-wins on raw chunk BYTES (stronger than the engine's
    128-bit hashes — a collision would fail here)."""
    seen = {}
    rows = {}
    for doc_id in sorted(d for d, _ in docs):
        text = dict(docs)[doc_id]
        chunks = chunk_doc((text or "").encode())
        if not chunks:
            continue
        n_dup = dup_b = 0
        off = 0
        for c in chunks:
            if c in seen:
                n_dup += 1
                dup_b += len(c)
            else:
                seen[c] = (doc_id, off)
            off += len(c)
        rows[doc_id] = (len(chunks), sum(len(c) for c in chunks),
                        n_dup, dup_b)
    return rows


class TestDedup:
    def test_distributed_matches_brute_force(self, ray_session):
        import ray

        base = _rand_text(4000, 11)
        docs = [
            (1, base),
            (2, base),                          # full dup of 1
            (3, base[:2000] + _rand_text(2000, 12)),  # half dup
            (4, _rand_text(3000, 13)),          # unique
            (5, ""),                            # no chunks
            (6, base[100:1100]),                # interior copy (resync)
        ]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        })).repartition(4)
        out = cdc_dedup_docs(ds, num_partitions=4).to_pandas()
        got = {int(r.doc_id): (int(r.n_chunks), int(r.total_bytes),
                               int(r.n_dup_chunks), int(r.dup_bytes))
               for r in out.itertuples()}
        assert got == _brute_dedup(docs)
        # sanity on the planted structure
        assert got[2][3] == got[2][1]       # doc 2 is 100% duplicate bytes
        assert got[4][2] == 0               # unique doc has no dups
        assert got[6][3] > 0                # interior copy resyncs

    def test_partitioning_independent(self, ray_session):
        import ray

        docs = [(i, _rand_text(1500, i % 5)) for i in range(30)]
        tbl = pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        })
        a = cdc_dedup_docs(ray.data.from_arrow(tbl).repartition(2),
                           num_partitions=3).to_pandas()
        b = cdc_dedup_docs(ray.data.from_arrow(tbl).repartition(7),
                           num_partitions=5).to_pandas()
        key = ["doc_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))
