"""Test harness: run everything on CPU with 8 virtual devices and f64 enabled.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and pins JAX_PLATFORMS=axon. JAX backends initialize
lazily, so switching the platform config + XLA flags here (before the first
computation) is sufficient to run the whole suite on a virtual 8-device CPU
mesh — the standard JAX fake-backend trick for exercising multi-chip sharding
without hardware. Real-TPU behavior is covered by bench.py /
__graft_entry__.py on the hardware runner.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
