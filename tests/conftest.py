"""Session-scoped Ray fixture: exactly one ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """500-row deterministic corpus + its oracle output (computed once)."""
    from document_extractor_ray import fixtures, oracle
    from document_extractor_ray.config import DEFAULT_CONFIG

    table = fixtures.make_pages_table(500, seed=42)
    out = oracle.run_oracle(table, DEFAULT_CONFIG)
    return {"pages": table, "oracle": out, "cfg": DEFAULT_CONFIG}
