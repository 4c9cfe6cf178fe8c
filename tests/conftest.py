"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding paths are exercised on a virtual CPU mesh (no TPU pod is
available in CI); the same `Mesh`/`NamedSharding` code runs unchanged on real
ICI-connected chips.
"""

import os

# Force CPU: the session environment may point JAX at a remote TPU tunnel
# (JAX_PLATFORMS=axon), which is far too slow for unit tests (every compile
# round-trips through a relay) and runs TPU numerics. The tunnel's
# sitecustomize hook calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, so setting the env var alone is not enough — override
# the config directly before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
