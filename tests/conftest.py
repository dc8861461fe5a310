"""Test env: force an 8-virtual-device CPU platform.

The ambient environment registers a remote-TPU ('axon') backend via
sitecustomize before conftest runs, so plain env vars are not enough:
we set the XLA host-device-count flag before the CPU client initializes
and switch jax_platforms in-process. Multi-chip sharding tests run on
this virtual mesh; real-TPU benchmarks live in bench.py, not here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs skip the multi-minute
# CPU compiles of the full-size models
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_gssd_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1111)
