"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-shard behavior is exercised
hermetically (the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip). Env vars must be set before JAX initializes
its backends, hence the module-level setup here. The image pins
JAX_PLATFORMS=axon, so the platform must also be forced via jax.config.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from semcode_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
    return make_mesh((8,), ("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
