"""Scale check: dictionary tagging (stages/dicttag.py) automaton regime.

Construction gives exact planted truth: document text is lowercase words
from vocab A; dictionary phrases are UPPERCASE two-word strings from a
disjoint vocab B, so NO accidental matches are possible — the only hits
are phrases planted verbatim into known docs. Verifies the full result
set exactly at scale, then measures the automaton's
dictionary-size-independence: the per-byte scan cost must stay ~flat as
the dictionary grows 50x (an alternation regex or per-phrase pass grows
linearly).

Usage: python scripts/scale_dicttag_check.py [--docs 200000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_corpus(n_docs: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:04d}" for i in range(500)], dtype=object)
    words = vocab[rng.randint(0, len(vocab), size=(n_docs, 40))]
    texts = [" ".join(row) for row in words]
    return texts


def make_dict(k: int):
    return [f"P{i:06d}A P{i:06d}B" for i in range(k)]


def plant(texts, phrases, every: int = 10, seed: int = 11):
    """Insert one dictionary phrase into every ``every``-th doc at a
    word boundary; returns the exact truth set."""
    rng = np.random.RandomState(seed)
    truth = set()
    for i in range(0, len(texts), every):
        p = phrases[int(rng.randint(0, len(phrases)))]
        parts = texts[i].split(" ")
        pos = int(rng.randint(0, len(parts)))
        texts[i] = " ".join(parts[:pos] + [p] + parts[pos:])
        truth.add((i, p))
    return truth


def run(n_docs: int, dict_k: int, texts) -> tuple:
    import ray

    from calendar_event_entity_extraction_ray.stages.dicttag import (
        tag_documents,
    )

    phrases = make_dict(dict_k)
    texts = list(texts)
    truth = plant(texts, phrases)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(64).materialize()

    t0 = time.time()
    out = tag_documents(ds, phrases, mode="automaton").to_pandas()
    wall = time.time() - t0
    got = set(map(tuple, out[["doc_id", "tag"]].itertuples(index=False)))
    assert got == truth, (len(got), len(truth))
    return wall, len(got)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)

    texts = make_corpus(args.docs)
    mb = sum(len(t) for t in texts) / 1e6
    for k in (1_000, 50_000):
        wall, n = run(args.docs, k, texts)
        print(f"dict={k:>6}: {wall:6.1f}s  {mb / wall:7.1f} MB/s  "
              f"{n} tags verified exact")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
