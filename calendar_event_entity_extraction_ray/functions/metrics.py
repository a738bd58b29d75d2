"""Extraction-quality metrics.

Pins the reference's comparison semantics:
  - ``canonicalize``: lowercase + strip STRING values only; None and lists
    pass through untouched (reference: src/metrics.py:9-17).
  - ``json_valid``: all 8 keys present (reference: src/metrics.py:20-22).
  - ``per_field_f1``: fraction of the 8 fields exactly equal after
    canonicalization — an accuracy despite the name (src/metrics.py:25-34).
  - ``exact_match``: all 8 canonicalized fields equal (src/metrics.py:37-40).
  - ``compute_field_accuracy``: raw ``==`` per field, NO lowercasing — this
    is the variant the evaluation scripts actually use
    (reference: src/loss.py:72-90).
  - ``row_indicators``: per-row indicator dict for the distributed metric
    aggregate; rows whose prediction fails to parse contribute 0 to every
    numerator but stay in the denominator
    (reference: src/evaluate_finetuned.py:48-99).
  - triple-level precision/recall for the P/R >= 0.95 gate.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

from calendar_event_entity_extraction_ray import TARGET_KEYS


def canonicalize(o: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k in TARGET_KEYS:
        v = o.get(k, None)
        if isinstance(v, str):
            v = v.strip().lower()
        out[k] = v
    return out


def json_valid(o: Dict[str, Any]) -> bool:
    return all(k in o for k in TARGET_KEYS)


def per_field_f1(pred: Dict[str, Any], gold: Dict[str, Any]) -> Tuple[float, Dict[str, float]]:
    p = canonicalize(pred)
    g = canonicalize(gold)
    field_scores = {k: (1.0 if p.get(k) == g.get(k) else 0.0) for k in TARGET_KEYS}
    micro = sum(field_scores.values()) / len(TARGET_KEYS)
    return micro, field_scores


def exact_match(pred: Dict[str, Any], gold: Dict[str, Any]) -> bool:
    p = canonicalize(pred)
    g = canonicalize(gold)
    return all(p.get(k) == g.get(k) for k in TARGET_KEYS)


def compute_field_accuracy(predicted: Any, target: Any) -> float:
    """Raw equality variant — no canonicalization (src/loss.py:72-90)."""
    if not isinstance(predicted, dict) or not isinstance(target, dict):
        return 0.0
    correct = sum(1 for k in TARGET_KEYS if predicted.get(k) == target.get(k))
    return correct / len(TARGET_KEYS)


def row_indicators(pred: Optional[Dict[str, Any]], gold: Dict[str, Any]) -> Dict[str, float]:
    """Per-row indicators; aggregate with a global Mean to reproduce the
    reference's ``compute_metrics`` fractions (evaluate_finetuned.py:48-99)."""
    out: Dict[str, float] = {}
    if pred is None:
        out["json_validity"] = 0.0
        out["field_accuracy"] = 0.0
        out["exact_match"] = 0.0
        for k in TARGET_KEYS:
            out[f"{k}_accuracy"] = 0.0
        return out
    out["json_validity"] = 1.0 if json_valid(pred) else 0.0
    out["field_accuracy"] = compute_field_accuracy(pred, gold)
    out["exact_match"] = 1.0 if all(pred.get(k) == gold.get(k) for k in TARGET_KEYS) else 0.0
    for k in TARGET_KEYS:
        out[f"{k}_accuracy"] = 1.0 if pred.get(k) == gold.get(k) else 0.0
    return out


def triple_prf(
    predicted: Iterable[Tuple[str, str, str]],
    golden: Iterable[Tuple[str, str, str]],
) -> Dict[str, float]:
    """Set-based precision/recall/F1 over (subj, pred, obj) triples."""
    p = set(predicted)
    g = set(golden)
    tp = len(p & g)
    precision = tp / len(p) if p else (1.0 if not g else 0.0)
    recall = tp / len(g) if g else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_pred": len(p),
        "n_gold": len(g),
        "tp": tp,
    }
