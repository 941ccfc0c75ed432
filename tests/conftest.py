"""Test configuration: CPU backend with 8 virtual devices.

Per SURVEY.md §4.5, sharding correctness is tested on an emulated 8-device
CPU mesh; the real TPU is exercised by bench.py. Env vars must be set before
jax initializes, hence this header runs first.
"""

import os

# force-set: the environment presets JAX_PLATFORMS=axon (tunneled TPU);
# tests must run on the virtual 8-device CPU mesh (SURVEY.md §4.5)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# surface NaNs where they originate (SURVEY.md §5.2)
jax.config.update("jax_debug_nans", False)  # enabled per-test where useful

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
