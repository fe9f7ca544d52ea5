"""Shared fixtures: one Ray session per pytest session, fixture tables."""

from __future__ import annotations

import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture(tmp_path_factory):
    from p_id_text_extraction_ray.fixtures.generate import generate_fixture

    root = tmp_path_factory.mktemp("fixture_tiny")
    return generate_fixture(str(root), n_docs=16, seed=42)


@pytest.fixture(scope="session")
def small_fixture(tmp_path_factory):
    from p_id_text_extraction_ray.fixtures.generate import generate_fixture

    root = tmp_path_factory.mktemp("fixture_small")
    return generate_fixture(str(root), n_docs=60, seed=7)
