"""Expert parallelism for the MoE MLP banks (models/moe.py).

The reference has no MoE and no expert parallelism (SURVEY §2.2: DP +
ZeRO-1); this module completes the beyond-reference parallelism set
(dp / tp / sp / pp / **ep**). Two execution routes, both TPU-native:

1. **GSPMD route** (:func:`moe_param_shardings`): annotate the expert-bank
   leaves (``fc1_kernel [E, D, H]`` …) with ``P("ep", ...)`` on the expert
   axis and jit the unchanged train step over a ``(dp, ep)`` mesh — XLA
   propagates the expert sharding through the batched-FFN einsums and
   inserts the dispatch collectives itself. Zero model-code changes, and
   expert weights are never replicated (the memory story that makes MoE
   pay). This is what ``dryrun_multichip`` exercises.

2. **Explicit shard_map route** (:func:`ep_moe_apply` /
   :func:`ep_moe_mlp`): the classic two-``all_to_all`` schedule, stated
   explicitly so the collective pattern is pinned and testable rather
   than left to the compiler. The batch is sharded over "ep"; each device
   routes its local samples (routing is per-sample, so it is
   sharding-invariant — models/moe.py), builds the dispatch tensor over
   the FULL expert axis, then:

       expert_in [B_l, E, C, D]
         -- all_to_all(split E -> concat batch) -->   (ICI)
       [ep*B_l, E_local, C, D]  -- local expert FFN -->
       [ep*B_l, E_local, C, O]
         -- all_to_all(split batch -> concat E) -->   (ICI)
       out [B_l, E, C, O]  -- local combine --> y [B_l, L, O]

   Exactly equal to the dense layer (no capacity-drop divergence:
   per-sample capacity means sharding the batch never changes routing) —
   pinned by tests/test_moe.py against ``moe_apply`` including gradients
   through both ``all_to_all``s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.moe import moe_ffn, route_tokens

# leaf names of an MoE expert bank (models/moe.py MoEMlp); axis 0 = expert
_EXPERT_BANK_LEAVES = ("fc1_kernel", "fc1_bias", "fc2_kernel", "fc2_bias")


def ep_moe_apply(params, x, *, top_k: int, capacity_factor: float,
                 axis_name: str, n_ep: int, ln_eps: float = 1e-6,
                 dtype=jnp.float32):
    """Expert-parallel MoE MLP; runs INSIDE ``shard_map``.

    ``x [B_local, L, D]`` — batch sharded over ``axis_name``;
    ``params["fc1"]/["fc2"]`` hold the LOCAL expert slice (``E_local =
    E / n_ep`` on axis 0); ``router``/``ln_*`` are replicated. Returns
    ``(y [B_local, L, O], aux)`` with ``aux`` already pmean'd.
    """
    E_local = params["fc1"]["kernel"].shape[0]
    E = E_local * n_ep
    xn, dispatch, combine, aux = route_tokens(
        params, x, num_experts=E, top_k=top_k,
        capacity_factor=capacity_factor, ln_eps=ln_eps)
    expert_in = jnp.einsum("blec,bld->becd", dispatch, xn.astype(dtype))
    # ship each expert's tokens to its owner: split E, concat batch
    ei = lax.all_to_all(expert_in, axis_name, split_axis=1, concat_axis=0,
                        tiled=True)  # [n_ep*B_l, E_local, C, D]
    out = moe_ffn(ei, params["fc1"]["kernel"], params["fc1"]["bias"],
                  params["fc2"]["kernel"], params["fc2"]["bias"], dtype)
    # ship results home: split batch, concat E
    out = lax.all_to_all(out, axis_name, split_axis=0, concat_axis=1,
                         tiled=True)  # [B_l, E, C, O]
    y = jnp.einsum("blec,beco->blo", combine.astype(dtype), out)
    return y, lax.pmean(aux, axis_name)


def ep_moe_mlp(mesh: Mesh, params, x, *, top_k: int, capacity_factor: float,
               ep_axis: str = "ep", ln_eps: float = 1e-6,
               dtype=jnp.float32):
    """One MoE layer expert-parallel over ``mesh[ep_axis]``: shards the
    batch AND the expert banks, runs :func:`ep_moe_apply` under
    ``shard_map``. ``params`` is the full (host/replicated) layer dict;
    ``x [B, L, D]`` the full batch (``B`` divisible by the axis size)."""
    from jax import shard_map

    n_ep = mesh.shape[ep_axis]
    p_specs = {"ln_scale": P(), "ln_bias": P(), "router": P(),
               "fc1": jax.tree.map(lambda _: P(ep_axis), params["fc1"]),
               "fc2": jax.tree.map(lambda _: P(ep_axis), params["fc2"])}

    fn = shard_map(
        lambda p, t: ep_moe_apply(
            p, t, top_k=top_k, capacity_factor=capacity_factor,
            axis_name=ep_axis, n_ep=n_ep, ln_eps=ln_eps, dtype=dtype),
        mesh=mesh,
        in_specs=(p_specs, P(ep_axis)),
        out_specs=(P(ep_axis), P()),
    )
    return fn(params, x)


def moe_param_shardings(mesh: Mesh, params, ep_axis: str = "ep"):
    """GSPMD expert sharding: ``NamedSharding`` pytree putting every MoE
    expert-bank leaf's expert axis (axis 0) on ``ep_axis`` and replicating
    everything else. Same post-init annotation pattern as
    ``tp.mvit_param_shardings`` — zero model-code changes."""
    if ep_axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    n = mesh.shape[ep_axis]

    def make(path, leaf):
        name = getattr(path[-1], "key", getattr(path[-1], "name", ""))
        if name in _EXPERT_BANK_LEAVES and leaf.shape[0] % n == 0:
            return NamedSharding(
                mesh, P(*([ep_axis] + [None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(make, params)


def ep_state_shardings(mesh: Mesh, state, ep_axis: str = "ep"):
    """TrainState shardings for GSPMD expert parallelism: params and the
    matching adam moments shard their expert banks over ``ep_axis``."""
    import optax

    p_sh = moe_param_shardings(mesh, state.params, ep_axis)

    def like_params(tree):
        flat_p, treedef_p = jax.tree.flatten(p_sh)
        flat_t, treedef_t = jax.tree.flatten(tree)
        if treedef_p == treedef_t:
            return jax.tree.unflatten(treedef_t, flat_p)
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)

    def opt_sharding(o):
        if isinstance(o, optax.ScaleByAdamState):
            return o.__class__(count=NamedSharding(mesh, P()),
                               mu=like_params(o.mu), nu=like_params(o.nu))
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), o)

    opt_sh = jax.tree.map(
        opt_sharding, state.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    return state.replace(
        step=NamedSharding(mesh, P()),
        params=p_sh,
        opt_state=opt_sh,
        model_state=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.model_state),
    )
