"""Text-analysis operators over a documents table: token counting, quality
scoring, language-ID, fingerprinting.

Vectorized pandas/pyarrow kernels inside ``map_batches``. The token/quality
kernels use explicit regex definitions (not Python ``str`` semantics) so the
same computation is expressible as the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` — names and formulas must stay in sync with
those SQL strings.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from calendar_event_entity_extraction_ray.functions.textstats import (
    detect_lang,
    rolling_fingerprint,
)

_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def token_count_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """whitespace tokens + BPE-ish tokens per doc (vectorized str ops)."""
    s = batch[text_col].fillna("")
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["n_tokens_ws"] = s.str.strip().str.split().str.len().fillna(0).astype("int64")
    out["n_tokens_bpe"] = s.str.count(_BPE_PATTERN).astype("int64")
    return out


def quality_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality features; formulas mirror the oracle SQL exactly."""
    s = batch[text_col].fillna("")
    n = s.str.len().astype("float64")
    alpha = s.str.count(r"[A-Za-z]").astype("float64")
    digit = s.str.count(r"[0-9]").astype("float64")
    punct = s.str.count(r"[^A-Za-z0-9\s]").astype("float64")
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["n_chars"] = n.astype("int64")
    out["alpha_ratio"] = (alpha / n).where(n > 0, 0.0)
    out["digit_ratio"] = (digit / n).where(n > 0, 0.0)
    out["punct_ratio"] = (punct / n).where(n > 0, 0.0)
    return out


def langid_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["pred_lang"] = batch[text_col].map(detect_lang)
    return out


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    out = pd.DataFrame()
    out["doc_id"] = batch["doc_id"]
    out["fingerprint"] = batch[text_col].map(rolling_fingerprint)
    return out
