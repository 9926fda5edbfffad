import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.
# Real-TPU kernels are exercised by bench.py, not the unit suite.
# NOTE: this environment registers a TPU PJRT plugin at interpreter startup
# (sitecustomize) and exports JAX_PLATFORMS; jax.config is the reliable
# override, applied before any backend is initialized.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

CAMINANDES = pathlib.Path(
    "/root/reference/test/excerpt_(CC)_caminandes.com_640x360.hevc")


@pytest.fixture(scope="session")
def caminandes_bytes() -> bytes:
    return CAMINANDES.read_bytes()
