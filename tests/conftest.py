"""Test configuration.

Platform policy: let JAX auto-choose (``JAX_PLATFORMS=""``): on this image
that's the axon-tunneled TPU (fast compiles via the remote-compile service);
on a TPU-less box it falls back to CPU automatically. The profile's hard
``JAX_PLATFORMS=axon`` would instead *raise* if the tunnel is down, so we
relax it here. The CPU backend always exists alongside, and ``XLA_FLAGS``
forces 8 virtual CPU devices for the sharding tests (SURVEY.md §4.5), which
grab them explicitly via ``jax.devices("cpu")``.

Compile frugality matters: this image has ONE CPU core and XLA CPU compiles
can take ~20s each — share capacities/configs across parametrized cases so
jitted programs are reused.
"""

import os

if os.environ.get("JAX_PLATFORMS", "") == "axon":
    os.environ["JAX_PLATFORMS"] = ""  # auto: axon if alive, else cpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# SURVEY.md §5.2: run the whole suite under NaN debugging — any jitted
# function returning a NaN fails loudly instead of corrupting physics
# downstream. Cost is one output scan per call; masked-lane garbage inside
# kernels is fine as long as the *outputs* are clean, which is the contract.
jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    """8 virtual CPU devices for sharding tests (exist on every backend)."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "xla_force_host_platform_device_count not applied"
    return devs[:8]
