import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.
# Real-TPU kernels are exercised by bench.py, not the unit suite.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import pathlib

import pytest

CAMINANDES = pathlib.Path(
    "/root/reference/test/excerpt_(CC)_caminandes.com_640x360.hevc")


@pytest.fixture(scope="session")
def caminandes_bytes() -> bytes:
    return CAMINANDES.read_bytes()
