from __future__ import annotations

import pytest
import ray

from kgdata_ray import context
from kgdata_ray.synth import SynthConfig


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    context.configure()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_cfg() -> SynthConfig:
    # ~200 conversations / ~2k turns (FIXTURES.md scale point for unit tests)
    return SynthConfig(n_convs=200, n_entities=60)
