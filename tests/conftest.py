"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharded code paths are validated on
``--xla_force_host_platform_device_count=8`` exactly as SURVEY.md §4 plans
(the reference has no distributed path to mirror; this is the TPU build's own
multi-"node" test strategy).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# deterministic simulated-stream fixtures cache to disk (keyed by source
# hashes — see simulate.cache_streams); warm suite runs skip ~60 s of pure
# numpy ray-casting
os.environ.setdefault(
    "SIMPLESLAM_SIM_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "simpleslam_test_streams"))

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" after register();
# env JAX_PLATFORMS is ignored, so override through jax.config before any
# backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_singletons():
    from simpleslam_tpu.utils.config import Params
    from simpleslam_tpu.utils.logging import Logger

    Params.reset()
    yield
    Params.reset()
    Logger.reset()
