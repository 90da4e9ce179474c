"""Device-mesh helpers (SURVEY.md §2.4: the jt.mpi replacement).

The workload's parallel axes are:
  * 'data'  — rays (NeRF) / images+pixel bands (rasterizer).  Forward
    rasterization is embarrassingly parallel over pixels (the online
    softmax is tile-local); gradients reduce over 'data' with psum.
  * 'model' — NeRF MLP width (tensor parallel), available for scaling
    the volume renderer; the reference has no TP, we provide it.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_data=None, n_model=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ('data', 'model'))


def shard_batch(x, mesh, axis=0):
    """Shard an array's leading axis over the 'data' mesh axis."""
    spec = [None] * x.ndim
    spec[axis] = 'data'
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh):
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x)
