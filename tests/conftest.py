import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import morph_kgc_ray  # noqa: E402,F401  (sets the hash-shuffle DataContext before any Dataset is created)


@pytest.fixture(scope='session')
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address='local', num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level='ERROR')
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
