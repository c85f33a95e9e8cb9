"""Device mesh + sharding seam (SPMD data parallelism).

The reference's parallelism is single-process ``torch.nn.DataParallel``
scatter/gather (scripts/main.py:60-61) plus NCCL DDP in the external
detector trainer (configs/detection/mnv2_ssd_300_2_heads.py:165).  The
TPU-native equivalent is one 1-axis ``jax.sharding.Mesh('data')``: batches
are sharded over the axis, parameters are replicated, and XLA GSPMD inserts
the gradient all-reduce over ICI (multi-host: DCN) automatically
(SURVEY.md §2.10, §5.8).

This module is the single seam every entry point uses, so scaling past one
host is a mesh-construction change, not a trainer change.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'data_sharding', 'replicated_sharding',
           'shard_batch', 'replicate', 'maybe_init_distributed',
           'local_batch_slice']

DATA_AXIS = 'data'


def maybe_init_distributed(cfg=None):
    """Multi-host bring-up hook: call ``jax.distributed.initialize`` when a
    coordinator is configured.  Single-host (this environment) is a no-op."""
    if cfg and cfg.get('coordinator_address'):
        jax.distributed.initialize(
            coordinator_address=cfg['coordinator_address'],
            num_processes=int(cfg['num_processes']),
            process_id=int(cfg['process_id']))


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a pytree of host arrays with batch-dim sharding.

    Single-host: a plain sharded device_put.  Multi-host: each process
    passes its *local* slice of the global batch (the loader interleaves
    indices per process) and the global array is assembled across processes.
    """
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_slice(global_batch_size: int, mesh: Mesh) -> slice:
    """Per-process slice of the global batch for multi-host input feeding."""
    n_proc = jax.process_count()
    per_proc = global_batch_size // n_proc
    start = jax.process_index() * per_proc
    return slice(start, start + per_proc)
