"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
def pages_small(tmp_path_factory):
    """A small deterministic pages corpus shared by pipeline tests."""
    from transner_ray import synth

    out = str(tmp_path_factory.mktemp("pages") / "corpus")
    paths = synth.write_pages(out, seed=42, n_docs=30, num_shards=3)
    return paths


@pytest.fixture(scope="session")
def oracle_small(pages_small):
    import pyarrow.parquet as pq

    from transner_ray.oracle import run_oracle

    rows = []
    for p in pages_small:
        rows.extend(pq.read_table(p).to_pylist())
    return run_oracle(rows)
