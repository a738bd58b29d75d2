"""Model-hosted inference as an actor-pool stage.

The reference's core runtime is ``model.generate`` inside an eval loop
(reference ``src/infer.py:135-147``, ``src/evaluate_baseline.py:24-47``):
per-process heavyweight model state, batched scoring. The north-rule
replaces the LLM with a deterministic extractor for the KG path, but a
real training-data pipeline eventually hosts a model in the worker pool —
this stage proves that shape end-to-end with a deterministic stand-in the
container can actually run (no torch/onnx here).

``DummyModelScorer.__init__`` "loads a checkpoint": a seed-generated
``(vocab x dim)`` float32 embedding matrix (default 1M x 64 = 256 MB
resident, ~1 s to materialize). That setup cost is exactly the case the
task-form cache (``stages/taskform.py``) is WRONG for: task-form
constructs one instance per worker process (32 workers x 256 MB = 8 GB
resident + 32 setup pays), while an actor pool bounds both with
``concurrency=(lo, hi)`` and declares the residency to the scheduler via
``ray_remote_args(memory=...)`` so multi-node placement packs actors
where the RAM is. Use ``scored = score_documents(ds)`` and see
BASELINE.md for the measured pool-vs-task-form crossover.

Scoring is batched vectorized "inference": token-hash bag-of-words ->
embedding-row gather -> mean-pool -> fixed projection, quantized to
int64 micro-units. Deterministic in (seed, text), so the golden oracle
is a single-process run of this same class.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

DEFAULT_VOCAB = 1 << 20
DEFAULT_DIM = 64


class DummyModelScorer:
    """Actor-pool callable: heavy per-actor state in ``__init__`` (once
    per actor), vectorized batch scoring in ``__call__`` (per batch)."""

    def __init__(self, seed: int = 42, vocab: int = DEFAULT_VOCAB,
                 dim: int = DEFAULT_DIM, text_col: str = "text",
                 id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        # the "checkpoint": vocab x dim float32 (256 MB at defaults)
        self.weights = rng.standard_normal((vocab, dim), dtype=np.float32)
        self.proj = rng.standard_normal(dim, dtype=np.float32)
        self.vocab = vocab
        self.text_col = text_col
        self.id_col = id_col

    def _token_ids(self, texts: "pd.Series") -> "tuple[np.ndarray, np.ndarray]":
        """Vectorized tokenize+hash: one exploded Series, one siphash pass
        (process-stable fixed-key hash — Python ``hash()`` is salted)."""
        toks = texts.fillna("").str.split()
        lens = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().dropna()
        ids = (pd.util.hash_pandas_object(flat, index=False).to_numpy()
               % np.uint64(self.vocab)).astype(np.int64)
        return ids, lens

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas()
        ids, lens = self._token_ids(texts)
        # gather + project: s[t] = W[t] @ p, doc score = mean over tokens.
        # Accumulate in float64: a float32 matvec's BLAS kernel varies by
        # host CPU, and its ~1e-6 relative error flips the e6 rounding
        # boundary between sessions (observed as a 1-unit golden drift).
        tok_scores = self.weights[ids].astype(np.float64) @ \
            self.proj.astype(np.float64)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        sums = np.add.reduceat(
            np.concatenate((tok_scores, [0.0])), bounds[:-1])
        sums[lens == 0] = 0.0
        score = np.divide(sums, lens, out=np.zeros_like(sums, dtype=np.float64),
                          where=lens > 0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "score_e6": pa.array(
                np.floor(score * 1e6 + 0.5).astype(np.int64)),
        })


def score_documents(
    ds: "ray.data.Dataset",
    seed: int = 42,
    vocab: int = DEFAULT_VOCAB,
    dim: int = DEFAULT_DIM,
    concurrency: "tuple | int" = (1, 4),
    num_cpus: float = 1,
) -> "ray.data.Dataset":
    """The pool-sized model stage: ``concurrency`` bounds resident copies
    of the weights (hi x 256 MB at defaults), ``memory`` tells Ray's
    scheduler about the residency so actors pack onto nodes with room —
    the knobs that matter when the dummy matrix becomes a real model."""
    weight_bytes = vocab * dim * 4
    return ds.map_batches(
        DummyModelScorer,
        fn_constructor_kwargs={"seed": seed, "vocab": vocab, "dim": dim},
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
        num_cpus=num_cpus,
        memory=int(weight_bytes * 1.5),
    )
