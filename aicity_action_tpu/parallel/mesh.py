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

    Replaces `multiprocessing.py:54-61`'s NCCL process-group setup. The
    reference's ``--init_method tcp://host:port`` rendezvous maps directly
    onto the JAX coordinator: NUM_SHARDS = num_processes, SHARD_ID =
    process_id.
    """
    if cfg.NUM_SHARDS <= 1:
        return
    # NOTE: must not call jax.process_count()/jax.devices() here — they
    # initialize the XLA backend, after which initialize() refuses to run.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older jax
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    if not already:
        coord = str(getattr(cfg, "INIT_METHOD", "") or "")
        if coord.startswith("tcp://"):
            coord = coord[len("tcp://"):]
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=cfg.NUM_SHARDS,
                process_id=cfg.SHARD_ID,
            )
        else:  # cluster auto-detection (GKE/SLURM/TPU pods)
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


def host_transfer_dtype(cfg):
    """Numpy dtype to pre-cast float32 input frames to before
    ``device_put``, or None to ship as-is.

    With ``TPU.COMPUTE_DTYPE=bfloat16`` the model's entry op casts f32
    inputs to bf16 on device anyway (``models/mvit.py:893``,
    round-to-nearest-even — the same rounding ml_dtypes applies on the
    host), so pre-casting is BIT-IDENTICAL and halves the host->device
    input bytes: the dominant input-pipeline cost on PCIe and a 2x win on
    tunneled links. ``TPU.BF16_HOST_TRANSFER=False`` restores f32 wire
    format."""
    if (getattr(cfg.TPU, "BF16_HOST_TRANSFER", False)
            and cfg.TPU.COMPUTE_DTYPE == "bfloat16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return None


def cast_for_transfer(x, in_dtype):
    """Pre-cast a float32 frame array for upload (no-op otherwise)."""
    if in_dtype is not None and x.dtype == np.float32:
        return x.astype(in_dtype)
    return x


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


def put_local_shard(x, sharding: NamedSharding):
    """Place this host's slice of a globally-sharded batch array.

    Single-process: plain ``device_put``. Multi-process: each host holds
    only its own rows (the loader shards indices per host), so the global
    array is assembled from process-local data (the reference's per-rank
    DistributedSampler batches, datasets/utils.py:326-341)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def process_allgather(x):
    """Host-side gather of per-process arrays; returns a list (one entry per
    process) so callers ``np.concatenate`` it. Handles RAGGED leading axes
    by exchanging lengths first and padding to the max (replaces the
    reference's byte-padded gloo pickled gather, distributed.py:220-336)."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return [x]
    from jax.experimental import multihost_utils as mhu

    lengths = np.asarray(mhu.process_allgather(np.int64(x.shape[0])))
    m = int(lengths.max())
    if x.shape[0] < m:
        pad = np.zeros((m - x.shape[0], *x.shape[1:]), x.dtype)
        x = np.concatenate([x, pad])
    gathered = np.asarray(mhu.process_allgather(x))
    return [gathered[p, :int(lengths[p])] for p in range(len(lengths))]
