"""Session-scoped Ray fixture (driver instruction: init Ray ONCE per pytest
session, never per test/module).  Tests that don't need Ray simply don't use
the fixture; the init is lazy."""

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
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_tbl():
    """Small fixture table (giant rows shrunk so pytest stays fast but the
    row-split path is still exercised: 2.5x MAX via a reduced MAX in tests
    is NOT done — instead we keep real MAX and a 2.5M-token giant row once
    per session)."""
    from anomalydetection_ray.sources.fixtures import fixture_table

    return fixture_table(include_giant=True, giant_len=2_500_000)
