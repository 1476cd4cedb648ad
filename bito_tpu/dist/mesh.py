"""Device mesh + sharding over the site-pattern axis.

The reference has no distributed layer (SURVEY §2 P5/P6: a pthread pool and
BEAGLE flags).  Here the single scaling axis is site patterns: every PLV and
per-pattern quantity carries S as its last dimension, so sharding S across a
`jax.sharding.Mesh` data-parallelizes the whole likelihood pipeline; XLA
inserts the psum for the final per-edge/per-root weighted reductions when the
jitted program consumes S-sharded operands and produces replicated outputs.

DAG structure, model parameters, and branch lengths are replicated
(BASELINE.json north star).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: Optional[int] = None, axis: str = "sites") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"Need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_patterns(mesh: Mesh, array, pattern_axis: int, axis: str = "sites"):
    """Place `array` with its pattern axis sharded across the mesh."""
    spec = [None] * array.ndim
    spec[pattern_axis] = axis
    return jax.device_put(array, NamedSharding(mesh, PartitionSpec(*spec)))


def replicate(mesh: Mesh, array):
    return jax.device_put(array, NamedSharding(mesh, PartitionSpec()))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
