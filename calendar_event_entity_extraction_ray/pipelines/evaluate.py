"""Evaluation pipeline: predicted vs golden records -> global metric
fractions.

Reference: src/evaluate_finetuned.py:48-99 / evaluate_baseline.py:49-100 —
per-row JSON brace-parse of the prediction, per-field equality indicators,
global fractions; rows whose prediction fails to parse contribute 0 to all
numerators but remain in the denominator. Here: ``map_batches`` emits
indicator columns, a global ``Mean`` aggregate produces the fractions —
partial+final mean, no driver-side loop.
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa

import ray.data
from ray.data.aggregate import Mean

from calendar_event_entity_extraction_ray import TARGET_KEYS
from calendar_event_entity_extraction_ray.functions.jsonx import safe_json_load
from calendar_event_entity_extraction_ray.functions.metrics import row_indicators


def indicators_batch(batch: pa.Table) -> pa.Table:
    """Input: (prediction_text, <8 golden slot columns>). Output: indicator
    columns per metric."""
    preds = batch.column("prediction_text").to_pylist()
    golds = [
        {k: batch.column(k)[i].as_py() for k in TARGET_KEYS}
        for i in range(batch.num_rows)
    ]
    rows = [row_indicators(safe_json_load(p or ""), g) for p, g in zip(preds, golds)]
    names = ["json_validity", "field_accuracy", "exact_match"] + [
        f"{k}_accuracy" for k in TARGET_KEYS
    ]
    return pa.table({n: pa.array([r[n] for r in rows], pa.float64()) for n in names})


def evaluate(ds: "ray.data.Dataset") -> Dict[str, float]:
    """Global metric dict (the reference's results/*.json payload)."""
    ind = ds.map_batches(indicators_batch, batch_format="pyarrow")
    names = ["json_validity", "field_accuracy", "exact_match"] + [
        f"{k}_accuracy" for k in TARGET_KEYS
    ]
    agg = ind.aggregate(*[Mean(n, alias_name=n) for n in names])
    return {n: float(agg[n]) for n in names}
