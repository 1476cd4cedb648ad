"""Test configuration: CPU with float64 for golden-value parity.

Multi-device sharding tests (tests/test_dist.py) spawn subprocesses with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu, since
the flag must be set before jax import and slows every compile when active.
"""
import os

# jax is preloaded at interpreter startup in this environment (and
# JAX_PLATFORMS may be set to the TPU tunnel), so mutate the config, not env.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def data_dir():
    return DATA
