"""Device mesh and sharding helpers.

TPU-native replacement of the reference's distributed runtime
(`/root/reference/slowfast/utils/multiprocessing.py`, `distributed.py`):

- ``torch.multiprocessing.spawn`` + NCCL process groups → one process per
  host (`jax.distributed.initialize`), XLA owns per-chip parallelism.
- ``DistributedSampler`` + DDP allreduce → a ``Mesh`` with a ``data`` axis
  and ``NamedSharding`` on the batch dimension; XLA inserts the gradient
  collectives when the loss averages over a sharded batch.
- ``all_gather_cat_self`` (gradient-preserving gather, distributed.py:42-96)
  → ``jax.lax.all_gather`` inside jit — JAX collectives are differentiable,
  so the reference's hand-rolled autograd splice is unnecessary.
- gloo pickled-object gather → ``multihost_utils.process_allgather``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(cfg) -> None:
    """Initialize multi-host JAX (no-op single host).

    Replaces `multiprocessing.py:54-61`'s NCCL process-group setup.
    """
    if cfg.NUM_SHARDS > 1 and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(cfg=None, devices=None) -> Mesh:
    """Build the device mesh from ``cfg.TPU.MESH_SHAPE`` / ``MESH_AXES``.

    Default: all devices on a single ``data`` axis (pure data parallelism —
    the only parallelism the reference supports, SURVEY §2.2).
    """
    if devices is None:
        devices = jax.devices()
    if cfg is not None and cfg.TPU.MESH_SHAPE:
        shape = tuple(cfg.TPU.MESH_SHAPE)
        axes = tuple(cfg.TPU.MESH_AXES)
        assert len(shape) == len(axes), (shape, axes)
        assert math.prod(shape) == len(devices), (shape, len(devices))
    else:
        shape = (len(devices),)
        axes = tuple(cfg.TPU.MESH_AXES) if cfg is not None else ("data",)
        axes = axes[:1]
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the batch axis sharded."""
    sh = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, replicated(mesh))


def process_allgather(x):
    """Host-side any-object gather (replaces the reference's gloo subgroup
    pickled gather, distributed.py:220-336)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)
