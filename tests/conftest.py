"""Session-scoped Ray fixture: init ONCE per pytest session."""

from __future__ import annotations

import warnings

import pytest

warnings.filterwarnings("ignore")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # ragged list<string> columns (attendees) are not tensor-convertible;
    # keep them as plain object columns in pandas conversions
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_pages():
    """400 deterministic synthetic pages + golden slots (driver-side)."""
    from calendar_event_entity_extraction_ray.sources.pages import synth_page

    pages, golden = [], []
    for i in range(400):
        p, g = synth_page(i, seed=42)
        pages.append(p)
        golden.extend(g)
    return pages, golden
