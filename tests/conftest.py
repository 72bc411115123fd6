"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_pages(tmp_path_factory):
    """Small deterministic pages parquet (FIXTURES.md sf_test scale)."""
    from basicocr_ray.fixtures.gen import write_pages_parquet

    d = tmp_path_factory.mktemp("pages")
    path = str(d / "pages.parquet")
    write_pages_parquet(path, 800)
    return path
