"""Repeated-span removal (stages/spandedup.py).

Pins: planted cross-doc spans are stripped (including overlapping
windows), unique text survives byte-identical, fully-covered docs drop,
short docs (< n tokens) survive whole, result is partitioning-invariant.
"""

from __future__ import annotations

import pandas as pd
import pytest

from calendar_event_entity_extraction_ray.stages.spandedup import (
    remove_repeated_spans,
)


@pytest.fixture(scope="module")
def docs():
    shared = "one two three four"  # 4-gram shared by docs 1 and 2
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            f"alpha beta {shared} gamma delta",
            f"prefix words {shared} and more tail here",
            "totally unique text with no repeats at all",
            shared,                    # fully covered -> dropped
            "tiny doc",                # < n tokens -> survives whole
            None,                      # NULL -> dropped (no tokens)
        ],
    })


class TestRemoveRepeatedSpans:
    def test_semantics_and_partition_invariance(self, ray_session, docs):
        import ray

        results = []
        for nparts in (1, 3):
            ds = ray.data.from_pandas(docs).repartition(nparts)
            out = (remove_repeated_spans(ds, n=4)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            results.append(out)
        assert results[0].equals(results[1])
        out = results[0]
        by_id = dict(zip(out["doc_id"], out["clean_text"]))
        # shared 4-gram stripped from both carriers, rest intact
        assert by_id[1] == "alpha beta gamma delta"
        assert by_id[2] == "prefix words and more tail here"
        # unique doc byte-identical
        assert by_id[3] == "totally unique text with no repeats at all"
        # fully-covered doc dropped; NULL dropped; short doc whole
        assert 4 not in by_id and 6 not in by_id
        assert by_id[5] == "tiny doc"

    def test_overlapping_windows_union_of_coverage(self, ray_session):
        import ray

        # docs share TWO overlapping 3-grams ("b c d", "c d e") -> the
        # union covers b..e, leaving only the distinct flanks
        docs = pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["a b c d e f", "x b c d e y"],
        })
        out = (remove_repeated_spans(ray.data.from_pandas(docs), n=3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["clean_text"].tolist() == ["a f", "x y"]
