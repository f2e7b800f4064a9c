import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "1")


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

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_sequences(tmp_path_factory):
    """A small deterministic sequences fixture dir (4 shards, 2000 rows)."""
    from logpipe_ray.fixtures.generator import ensure_sequences

    root = tmp_path_factory.mktemp("fixtures")
    os.environ["LOGPIPE_FIXTURE_ROOT"] = str(root)
    import logpipe_ray.fixtures.generator as gen

    old_root = gen.FIXTURE_ROOT
    gen.FIXTURE_ROOT = str(root)
    path = ensure_sequences("sf0.001", n_rows=2000, n_shards=4)
    yield path
    gen.FIXTURE_ROOT = old_root
