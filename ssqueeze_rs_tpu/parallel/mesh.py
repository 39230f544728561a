"""Device mesh helpers.

The reference's only distribution story is dask chunking
(tests/stft_test.py:262-269). Here: an explicit `jax.sharding.Mesh` with
two logical axes —
  'data': batch/channel parallelism (reference P5/P6),
  'time': long-signal segments with halo exchange (reference P9).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch"]


def make_mesh(shape=None, axis_names=("data", "time"), devices=None) -> Mesh:
    """Create a mesh over `devices` (default: all).

    `shape`: tuple matching `axis_names`; default puts all devices on
    'data'. Example: make_mesh((2, 4)) -> 2-way batch x 4-way time.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, "
                         f"only {n} available")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(x, mesh: Mesh, axis_name: str = "data", batch_dim: int = 0):
    """Place `x` with its batch dim sharded over `axis_name`."""
    spec = [None] * np.ndim(x)
    spec[batch_dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
