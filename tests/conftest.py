"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding tests follow the standard JAX pattern of faking
devices with ``xla_force_host_platform_device_count`` (no pod required).
Must run before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# tunnel, where every jit recompile costs ~30 s. Correctness tests run on
# CPU; TPU execution is covered by bench.py and the driver's compile checks.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
