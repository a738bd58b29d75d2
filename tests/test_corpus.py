"""pipelines/corpus.py — composed cleanup chain + resumable writer."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from calendar_event_entity_extraction_ray.pipelines.corpus import (
    corpus_clean,
    langid_filter_batch,
    quality_filter_batch,
    write_corpus,
)


def _docs(n=60):
    rows = []
    for i in range(n):
        rows.append({"doc_id": i,
                     "text": f"The quarterly planning meeting number {i} "
                             f"will cover roadmap items and action points "
                             f"for the upcoming review cycle {i}."})
    rows.append({"doc_id": 900, "text": "x" * 10})          # too short
    rows.append({"doc_id": 901, "text": "1234567890 " * 20})  # too digity
    rows.append({"doc_id": 902, "text": rows[0]["text"]})     # exact dup
    return rows


class TestFilters:
    def test_quality_and_langid(self):
        df = pd.DataFrame(_docs())
        q = quality_filter_batch(df)
        assert 900 not in set(q["doc_id"])
        assert 901 not in set(q["doc_id"])
        assert 0 in set(q["doc_id"])
        l = langid_filter_batch(q)
        assert len(l) <= len(q)


class TestCorpusClean:
    def test_chain_drops_dups_and_junk(self, ray_session):
        import ray

        ds = ray.data.from_items(_docs())
        out = corpus_clean(ds).to_pandas()
        ids = set(out["doc_id"])
        assert 900 not in ids and 901 not in ids
        assert 902 not in ids  # exact dup of doc 0, doc 0 kept
        assert 0 in ids

    def test_write_corpus_resume(self, ray_session, tmp_path):
        import ray

        from calendar_event_entity_extraction_ray.state.manifest import (
            load_manifest,
        )

        out_dir = str(tmp_path / "corpus")
        ds = ray.data.from_items(_docs())
        m1 = write_corpus(corpus_clean(ds), out_dir, fingerprint="fp1",
                          num_partitions=4)
        stamps1 = {p: e["written_at"] for p, e in m1["partitions"].items()}
        n1 = sum(e["rows"] for e in m1["partitions"].values())
        assert n1 == 60  # junk + dup dropped

        # same fingerprint: completed partitions untouched
        m2 = write_corpus(corpus_clean(ray.data.from_items(_docs())),
                          out_dir, fingerprint="fp1", num_partitions=4)
        stamps2 = {p: e["written_at"] for p, e in m2["partitions"].items()}
        assert stamps1 == stamps2

        # rows round-trip, sorted by doc_id within partition
        total = 0
        for p in m1["partitions"].values():
            t = pq.read_table(os.path.join(out_dir, p["file"]))
            ids = t.column("doc_id").to_pylist()
            assert ids == sorted(ids)
            total += t.num_rows
        assert total == n1


class TestPartitionPrunedRead:
    def test_day_partitioned_write_prunes_at_read(self, ray_session, tmp_path):
        """Storage-side pruning: events written day-partitioned are read
        back with a partition filter that touches only the matching
        directories — the at-scale pattern for time-ranged reads (prune
        at the read, not after it)."""
        import os

        import pyarrow.compute as pc

        import ray

        ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                                   columns=["event_id", "ts", "event_type"])

        def add_day(b):
            import pyarrow as pa_

            return pa_.table({
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "day": pc.strftime(
                    pc.floor_temporal(b.column("ts"), unit="day"),
                    format="%Y-%m-%d"),
            })

        out = str(tmp_path / "by_day")
        ds.map_batches(add_day, batch_format="pyarrow").write_parquet(
            out, partition_cols=["day"])
        days = sorted(d.split("=", 1)[1] for d in os.listdir(out)
                      if d.startswith("day="))
        assert len(days) >= 2
        target = days[0]
        # partition_filter prunes FILE PATHS before any byte is read
        from ray.data.datasource.partitioning import Partitioning

        pruned = ray.data.read_parquet(
            out,
            partitioning=Partitioning("hive"),
            partition_filter=lambda paths, _t=f"day={target}/": [
                p for p in paths if _t in p],
        )
        got = pruned.to_pandas()
        assert (got["day"] == target).all()
        full = ray.data.read_parquet(
            out, partitioning=Partitioning("hive")).count()
        assert 0 < len(got) < full
