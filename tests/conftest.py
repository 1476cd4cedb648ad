"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Per the driver contract, sharding tests use
XLA_FLAGS=--xla_force_host_platform_device_count=8 with JAX_PLATFORMS=cpu;
float64 gives bit-comparable parity against the reference's doubles.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def data_dir():
    return DATA
