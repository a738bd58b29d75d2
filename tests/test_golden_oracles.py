"""Golden-oracle freshness: re-derive each golden sequentially and compare
to the committed parquet. Catches BOTH accidental semantic drift in the
kernels and stale goldens after an intentional change (regenerate with
scripts/make_goldens.py)."""

import importlib.util
import os

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden", "oracle")

spec = importlib.util.spec_from_file_location(
    "make_goldens", os.path.join(REPO, "scripts", "make_goldens.py"))
make_goldens = importlib.util.module_from_spec(spec)
spec.loader.exec_module(make_goldens)


@pytest.mark.parametrize("name", sorted(make_goldens.GOLDENS))
def test_golden_matches_recompute(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    assert os.path.exists(path), f"missing golden {name} — run make_goldens.py"
    stored = pq.read_table(path)
    fresh = make_goldens.GOLDENS[name]()
    assert fresh.schema.names == stored.schema.names
    assert fresh.num_rows == stored.num_rows
    assert fresh.equals(stored), (
        f"golden {name} drifted — if the semantic change was intentional, "
        f"regenerate with: python scripts/make_goldens.py {name}")
