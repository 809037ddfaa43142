"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices
(same GSPMD partitioner as TPU).
"""
import os

# NOTE: jax may already be imported by the environment's sitecustomize
# (axon plugin), so setting env vars alone is not enough — use
# jax.config.update, which takes effect because backend init is lazy.
os.environ["JAX_PLATFORMS"] = "cpu"
# never attempt HF downloads from tests (zero-egress environment)
os.environ["ENABLE_HF_INTERNET_CONNECTION"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from cremage_tpu.core.mesh import make_mesh

    assert jax.device_count() == 8
    return make_mesh()


@pytest.fixture(scope="session")
def mesh_4x2():
    from cremage_tpu.core.mesh import make_mesh

    return make_mesh(model=2)
