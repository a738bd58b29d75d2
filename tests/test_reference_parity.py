"""Parity against the reference's REAL data artifacts (read-only).

These tests run this engine's kernels over the reference repo's actual
outputs — the strongest available evidence that the re-implemented
semantics match:

  - every normalized date/time the reference wrote is a fixed point of our
    ``normalize_date``/``normalize_time`` (same normalization rules);
  - every record canonicalizes to the exact 8-slot shape with our coercion;
  - our brace-scan JSON extraction parses the reference's real model
    prediction strings (JSON followed by markdown prose — the case cited in
    SURVEY.md §5) identically to its recorded ``finetuned_json``;
  - our metrics reproduce the reference's PUBLISHED comparison numbers from
    its raw prediction strings.
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not present"
)


def _jsonl(path):
    with open(path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


class TestNormalizationFixedPoints:
    def test_augmented_dates_times_are_fixed_points(self):
        from calendar_event_entity_extraction_ray.functions.normalize import (
            normalize_date,
            normalize_time,
        )

        rows = _jsonl(f"{REF}/data/processed/augmented.jsonl")
        assert len(rows) == 2584  # BASELINE.md corpus size
        n_date = n_time = 0
        for r in rows:
            o = r["output"]
            d, t = o.get("date"), o.get("time")
            if d is not None:
                assert normalize_date(d) == d, (d, normalize_date(d))
                n_date += 1
            if t is not None:
                assert normalize_time(t) == t, (t, normalize_time(t))
                n_time += 1
        assert n_date > 2000 and n_time > 2000

    def test_augmented_rows_canonical_shape(self):
        from calendar_event_entity_extraction_ray import TARGET_KEYS
        from calendar_event_entity_extraction_ray.functions.schema import (
            ensure_output_schema_row,
        )

        rows = _jsonl(f"{REF}/data/processed/augmented.jsonl")
        for r in rows:
            out = ensure_output_schema_row(r)
            # the reference sanitized with the same rule — idempotent here
            assert out["output"] == {k: r["output"].get(k) for k in TARGET_KEYS}


class TestSplitArtifacts:
    def test_split_rows_parse_via_format_dispatch(self):
        from calendar_event_entity_extraction_ray.functions.formats import (
            parse_record,
            strip_prompt_echo,
        )

        rows = _jsonl(f"{REF}/data/splits/test.jsonl")
        assert len(rows) == 120  # BASELINE.md split size
        for r in rows:
            pair = parse_record(r)
            assert pair is not None
            prompt, completion = pair
            obj = json.loads(completion)
            assert isinstance(obj, dict)
            # echo-strip of the reference's own prompt recovers plain text
            assert "Extract calendar information" not in strip_prompt_echo(prompt)

    def test_split_sizes(self):
        assert len(_jsonl(f"{REF}/data/splits/train.jsonl")) == 554
        assert len(_jsonl(f"{REF}/data/splits/eval.jsonl")) == 118


class TestPredictionParsing:
    def test_brace_scan_matches_reference_recorded_json(self):
        from calendar_event_entity_extraction_ray.functions.jsonx import (
            safe_json_load,
        )

        res = json.load(open(f"{REF}/results/comparison_evaluation.json"))
        for ex in res["examples"]:
            ours = safe_json_load(ex["finetuned_prediction"])
            assert ours == ex["finetuned_json"]
            # baseline predictions are markdown junk: reference recorded null
            ours_b = safe_json_load(ex["baseline_prediction"])
            assert ours_b == ex["baseline_json"]

    def test_reproduce_published_metrics_from_raw_predictions(self):
        """Replays the reference's full 30-example comparison set through
        OUR evaluation pipeline and reproduces the published fractions
        (results/comparison_evaluation.json:17-19) — only possible because
        extraction-parse + per-field metric semantics match exactly."""
        from calendar_event_entity_extraction_ray.functions.jsonx import (
            safe_json_load,
        )
        from calendar_event_entity_extraction_ray.functions.metrics import (
            row_indicators,
        )

        res = json.load(open(f"{REF}/results/comparison_evaluation.json"))
        examples = res.get("examples", [])
        if len(examples) < res["test_samples"]:
            pytest.skip("full raw predictions not stored in results file")
        inds = [
            row_indicators(safe_json_load(ex["finetuned_prediction"]),
                           json.loads(ex["target"]))
            for ex in examples
        ]
        n = len(inds)
        assert abs(sum(i["exact_match"] for i in inds) / n
                   - res["finetuned_metrics"]["exact_match"]) < 1e-6
