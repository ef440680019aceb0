import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale test (50k-row recall)")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()
