import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (tests that need Ray depend
    on this fixture; pure-kernel tests never start Ray)."""
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def xs_fixture_dir(tmp_path_factory):
    """Deterministic xs-scale transcript fixture (FIXTURES.md scale 'xs')."""
    from record_linkage_ldu_ray.fixtures import FixtureSpec, cached_fixture

    return cached_fixture(FixtureSpec(n_families=120, hot_block=300))


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
