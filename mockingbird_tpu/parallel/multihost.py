"""Multi-host (multi-process) SPMD bootstrap + per-host data feeding.

The reference runs real multi-process training: gloo DDP for VITS
(`/root/reference/models/synthesizer/train_vits.py:126-171`) and
NCCL `mp.spawn` for the GAN vocoders
(`/root/reference/models/vocoder/hifigan/train.py:30-45`,
`control/cli/vocoder_train.py:73-79`). The TPU-native equivalent is one SPMD
program over a global mesh: `jax.distributed.initialize()` connects the
processes, `jax.devices()` then spans every host, the existing
``('data','model')`` mesh covers the pod, and XLA lowers gradient psums onto
ICI/DCN. Model code is untouched — only the bootstrap and the host→device
batch feeding below are multi-process aware.

Launch (every process, e.g. one per TPU host)::

    MB_COORDINATOR=host0:12345 MB_NUM_PROCESSES=4 MB_PROCESS_ID=$i \
        python -m mockingbird_tpu.cli train-vits ...

or rely on the TPU platform auto-detection (`jax.distributed.initialize()`
with no args inside GKE/TPU-VM environments) via ``MB_MULTIHOST=auto``.

Data feeding: every process builds the same deterministic *global* batch
order (same seed); `shard_global_batch` carves out this process's row slice
and assembles the global jax.Array via
`jax.make_array_from_process_local_data`, so the device-side train step is
identical to the single-process path. `BucketBatcher` additionally supports
true per-process strided subsampling (`num_shards`/`shard_index`) matching
the reference's `DistributedBucketSampler` (`vits_dataset.py:166-262`);
`assemble_local_batch` then builds the global batch from per-process local
rows.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_from_env() -> bool:
    """`jax.distributed.initialize()` driven by env vars; no-op when unset.

    MB_COORDINATOR=<host:port> MB_NUM_PROCESSES=<n> MB_PROCESS_ID=<i>
    initialize explicitly (works on CPU/GPU/TPU); MB_MULTIHOST=auto uses
    the TPU-platform auto-detection. Safe to call more than once.
    """
    if jax.distributed.is_initialized():
        return True
    coord = os.environ.get("MB_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["MB_NUM_PROCESSES"]),
            process_id=int(os.environ["MB_PROCESS_ID"]),
        )
        return True
    if os.environ.get("MB_MULTIHOST", "").lower() == "auto":
        jax.distributed.initialize()
        return True
    return False


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should own logging/TensorBoard/printing
    (the reference's ``rank == 0`` guards, `train_vits.py:283-317`)."""
    return jax.process_index() == 0


def make_global(mesh: Mesh, tree):
    """Turn process-local (single-device) arrays holding identical values on
    every process into fully-replicated *global* arrays over the mesh — the
    placement jit requires for train-state inputs under multi-controller
    SPMD. No-op single-process (jit replicates implicitly there)."""
    if jax.process_count() == 1:
        return tree
    sharding = NamedSharding(mesh, P())

    def to_global(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global array
        return jax.device_put(np.asarray(x), sharding)

    return jax.tree.map(to_global, tree)


def _global_data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def shard_global_batch(mesh: Mesh, batch):
    """Multi-process batch placement from a *globally known* batch.

    Every process computed the same global host batch (same loader seed /
    order); each contributes only its row slice. Under a single process this
    degrades to a plain sharded device_put.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, _global_data_sharding(mesh, np.ndim(x))),
            batch)
    pid = jax.process_index()

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), x, x.shape)
        assert x.shape[0] % n_proc == 0, \
            f"global batch {x.shape[0]} not divisible by {n_proc} processes"
        rows = x.shape[0] // n_proc
        local = x[pid * rows:(pid + 1) * rows]
        return jax.make_array_from_process_local_data(
            _global_data_sharding(mesh, x.ndim), local, x.shape)

    return jax.tree.map(put, batch)


def assemble_local_batch(mesh: Mesh, local_batch, num_shards: Optional[int] = None):
    """Multi-process batch placement from per-process *local* rows (each
    process loaded different utterances — `DistributedBucketSampler`
    semantics). Global batch = concat of process shards in rank order; all
    processes must produce identical array shapes (static bucket padding).
    """
    n_proc = num_shards or jax.process_count()
    if n_proc == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, _global_data_sharding(mesh, np.ndim(x))),
            local_batch)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), x, x.shape)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            _global_data_sharding(mesh, x.ndim), x, global_shape)

    return jax.tree.map(put, local_batch)
