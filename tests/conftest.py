"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY.md §4 — the mesh-simulation test pyramid the reference
lacks). Must run before the first JAX backend initialization."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# H2GCN_TPU_TESTS=1 leaves the real accelerator active (for the tpu-marked
# kernel tests); default forces the CPU virtual mesh.
if not os.environ.get("H2GCN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/baselines/mixhop/data/planetoid/data"


@pytest.fixture(scope="session")
def planetoid_path():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("planetoid data not available")
    return REFERENCE_DATA
