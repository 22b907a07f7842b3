"""Parameter/batch sharding rules for SPMD training.

Data parallelism: batch arrays sharded over the mesh 'data' axis. Tensor
parallelism: large kernels sharded over the 'model' axis on their widest
dimension (output-feature sharding — XLA inserts the reduce-scatter /
all-gather collectives as needed). The reference has no TP at all
(SURVEY.md §2.7); these rules give every trainer a mesh-ready step without
per-model plumbing.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: tuple, leaf, mesh: Mesh, min_size: int = 1024) -> P:
    """Shard the largest dimension divisible by the model-axis size.

    Small tensors (biases, norms) stay replicated; kernels big enough to
    matter get their widest divisible dim on 'model'.
    """
    n_model = mesh.shape["model"]
    shape = np.shape(leaf)
    if n_model <= 1 or np.prod(shape, dtype=np.int64) < min_size or len(shape) == 0:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % n_model == 0 and shape[d] >= n_model * 8:
            spec = [None] * len(shape)
            spec[d] = "model"
            return P(*spec)
    return P()


def shard_params(params: Any, mesh: Mesh, min_size: int = 1024) -> Any:
    """Place a parameter pytree onto the mesh per `param_spec`."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, leaf):
        spec = param_spec(path, leaf, mesh, min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def params_sharding_tree(params: Any, mesh: Mesh, min_size: int = 1024) -> Any:
    """NamedSharding pytree matching `shard_params` placement (for jit
    in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mesh, min_size)),
        params)


def batch_sharding_tree(batch: Any, mesh: Mesh) -> Any:
    """Batch arrays: leading axis over 'data'."""
    def spec(leaf):
        nd = np.ndim(leaf)
        return NamedSharding(mesh, P(*( ["data"] + [None] * (nd - 1) )) if nd else P())
    return jax.tree_util.tree_map(spec, batch)
