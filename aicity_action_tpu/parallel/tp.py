"""Tensor-parallel parameter sharding rules.

The reference supports only data parallelism (SURVEY §2.2); this module adds
an *optional* TPU-native scaling axis: large Dense/conv kernels are sharded
over a ``model`` mesh axis via ``NamedSharding`` on the parameter pytree, and
GSPMD propagates the layouts through the jitted step (inserting the
all-gathers/reduce-scatters on ICI). No model-code changes — sharding is a
pure post-init annotation of the param tree.

Usage:
    mesh = make_mesh(cfg)            # TPU.MESH_SHAPE [dp, tp],
                                     # TPU.MESH_AXES ["data", "model"]
    shardings = mvit_param_shardings(mesh, params)
    params = jax.device_put(params, shardings)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_keys: tuple[str, ...], leaf, model_axis: str):
    """Shard the big matmul weights; replicate everything else.

    - qkv / mlp fc1 kernels: shard the OUTPUT features (column parallel)
    - attention proj / mlp fc2 kernels: shard the INPUT features
      (row parallel) — the natural Megatron-style pairing, so the
      activations between the two stay sharded and only one collective per
      block pair is needed.
    """
    name = "/".join(path_keys)
    if leaf.ndim == 2:
        if name.endswith("qkv/kernel") or name.endswith("fc1/kernel"):
            return P(None, model_axis)
        if name.endswith("attn/proj/kernel") or name.endswith("fc2/kernel"):
            return P(model_axis, None)
    return P()


def mvit_param_shardings(mesh: Mesh, params, model_axis: str = "model"):
    """NamedSharding pytree for an MViT param tree (Megatron-style TP)."""
    if model_axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def make(path, leaf):
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        return NamedSharding(mesh, _spec_for(keys, leaf, model_axis))

    return jax.tree_util.tree_map_with_path(make, params)


def zero1_opt_shardings(mesh: Mesh, opt_state, data_axis: str = "data"):
    """ZeRO-1: shard optimizer moments over the DATA axis.

    TPU-native equivalent of ``ZeroRedundancyOptimizer``
    (reference: slowfast/models/optimizer.py:142-155,189-199 —
    ``zero_sgd`` / ``zero_adamw`` with ``parameters_as_bucket_view``).
    The torch version buckets whole parameters round-robin across ranks;
    under GSPMD the natural equivalent is a ``NamedSharding`` over the data
    axis on each moment tensor — XLA keeps the adam/momentum update local to
    each shard and all-gathers nothing (the param update itself still sees
    replicated params, so only mu/nu memory shrinks by 1/dp, which is
    exactly ZeRO *stage 1*).

    Each leaf is sharded along its largest axis divisible by the data-axis
    size; indivisible leaves (scalars, small 1-D vectors) stay replicated.
    """
    if data_axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_state)
    n = mesh.shape[data_axis]

    def spec(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        dims = list(getattr(leaf, "shape", ()))
        # largest divisible axis → best balance, fewest padded shards
        best, best_size = None, 0
        for i, d in enumerate(dims):
            if d % n == 0 and d > best_size:
                best, best_size = i, d
        if best is None:
            return NamedSharding(mesh, P())
        parts = [None] * len(dims)
        parts[best] = data_axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, opt_state)


def zero1_state_shardings(mesh: Mesh, state, data_axis: str = "data"):
    """Shardings for a TrainState under ZeRO-1: params/model_state
    replicated, optimizer moments sharded over the data axis."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        step=repl,
        params=jax.tree.map(lambda _: repl, state.params),
        opt_state=zero1_opt_shardings(mesh, state.opt_state, data_axis),
        model_state=jax.tree.map(lambda _: repl, state.model_state),
    )


def state_shardings(mesh: Mesh, state, model_axis: str = "model"):
    """Shardings for a whole TrainState: params + matching optimizer moments
    (adam mu/nu have the same shapes as params and inherit their specs)."""
    p_sh = mvit_param_shardings(mesh, state.params, model_axis)

    def like_params(tree):
        flat_p, treedef_p = jax.tree.flatten(p_sh)
        flat_t, treedef_t = jax.tree.flatten(tree)
        if treedef_p == treedef_t:
            return jax.tree.unflatten(treedef_t, flat_p)
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)

    import optax

    def opt_sharding(o):
        if isinstance(o, (optax.ScaleByAdamState,)):
            return o.__class__(
                count=NamedSharding(mesh, P()),
                mu=like_params(o.mu),
                nu=like_params(o.nu),
            )
        if isinstance(o, optax.TraceState):
            return o.__class__(trace=like_params(o.trace))
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), o)

    opt_sh = jax.tree.map(
        opt_sharding, state.opt_state,
        is_leaf=lambda x: isinstance(
            x, (optax.ScaleByAdamState, optax.TraceState)),
    )
    return state.replace(
        step=NamedSharding(mesh, P()),
        params=p_sh,
        opt_state=opt_sh,
        model_state=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.model_state),
    )
