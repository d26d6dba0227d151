"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is testable without TPU hardware (SURVEY.md §4 lesson).

Note: this environment preloads jax at interpreter startup and presets
JAX_PLATFORMS=axon (the real TPU tunnel), so env vars alone are too late —
we must override through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls for oracle comparison (TPU default would be bf16-ish)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_backend():
    """Make the suite order-independent: any test that flips the global op
    backend (het_tpu.ops.set_backend) gets it restored afterwards."""
    import het_tpu.ops as ops

    prev = ops.get_backend()
    yield
    ops.set_backend(prev)
