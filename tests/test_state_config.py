"""Config loading, metrics manifest, split writing."""

from __future__ import annotations

import json


class TestConfig:
    def test_yaml_merge_and_overrides(self, tmp_path):
        from calendar_event_entity_extraction_ray.config import EngineConfig

        a = tmp_path / "a.yaml"
        a.write_text("seed: 7\nn_synth: 10\nunknown_key: ignored\n")
        b = tmp_path / "b.yaml"
        b.write_text("n_synth: 20\n")
        cfg = EngineConfig.load(str(a), str(b), overrides={"lang": "de"})
        assert cfg.seed == 7
        assert cfg.n_synth == 20  # later file wins (reference merge behavior)
        assert cfg.lang == "de"
        assert cfg.split_props == [0.75, 0.15]

    def test_defaults(self):
        from calendar_event_entity_extraction_ray.config import EngineConfig

        cfg = EngineConfig()
        assert cfg.num_partitions == 16


class TestMetrics:
    def test_roundtrip(self, tmp_path):
        from calendar_event_entity_extraction_ray.state.metrics import (
            read_metrics,
            write_metrics,
        )

        write_metrics(str(tmp_path), {"n_docs": 5}, stats_str="stage stats")
        m = read_metrics(str(tmp_path))
        assert m["counters"]["n_docs"] == 5
        assert m["stats"] == "stage stats"


class TestWriteSplits:
    def test_jsonl_outputs(self, ray_session, tmp_path):
        import ray

        from calendar_event_entity_extraction_ray.pipelines.augmentation import (
            split_records,
            write_splits,
        )
        from calendar_event_entity_extraction_ray.stages.augment import records_to_table

        rows = [{"event_text": f"text number {i}", "row_id": i} for i in range(120)]
        splits = split_records(ray.data.from_arrow(records_to_table(rows)))
        counts = write_splits(splits, str(tmp_path / "splits"))
        assert set(counts) == {"train", "eval", "test"}
        assert sum(counts.values()) == 120
        # files readable back as JSON lines
        import glob

        files = glob.glob(str(tmp_path / "splits" / "train" / "*"))
        assert files
        with open(files[0]) as f:
            rec = json.loads(f.readline())
        assert "event_text" in rec
