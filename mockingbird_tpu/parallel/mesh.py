"""Device mesh construction + sharding helpers.

One SPMD story for the whole framework (SURVEY.md §2.7): a mesh with axes
``('data', 'model')``, batch sharded over ``data``, weights/long activations
optionally sharded over ``model``. XLA inserts the collectives (psum for
gradients, all-gathers for cross-shard losses) — there is no explicit
process-group code anywhere in model logic, unlike the reference's
gloo/nccl/`mp.spawn` plumbing (`train_vits.py:133`, `hifigan/train.py:38-40`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over available devices.

    With defaults, all devices go to the data axis. ``model > 1`` carves a
    model-parallel axis (for sharding vocoder/VITS activations when HBM-bound).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch, axis: int = 0):
    """Place a host array onto the mesh, sharded over 'data'. No-op mesh=None.

    Multi-process: every process computes the same global batch; each
    contributes its row slice via `jax.make_array_from_process_local_data`
    (see `parallel/multihost.py`)."""
    if mesh is None:
        return batch
    if jax.process_count() > 1:
        from .multihost import shard_global_batch
        return shard_global_batch(mesh, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)), batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
