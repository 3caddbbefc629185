"""Mixture-of-Experts MLP for MViT blocks (beyond-reference capability).

The reference has no MoE (its scaling story stops at DP/ZeRO-1,
SURVEY §2.2); this is the conditional-compute width-scaling mode that
completes the parallelism set (dp / tp / sp / pp / **ep** — see
``parallel/ep.py`` for the expert-parallel execution of this layer).
The design is the V-MoE / Switch recipe re-derived for TPU:

- **Static shapes end-to-end.** Routing is materialized as dispatch /
  combine one-hot tensors (``[L, E, C]``) and the expert FFN runs as two
  batched einsums over a fixed per-expert capacity ``C`` — no gather with
  data-dependent shapes, no sort. Everything XLA sees is a dense matmul
  chain it can tile onto the MXU; over-capacity tokens are dropped
  (their combine weight is zero, so they ride the residual unchanged),
  exactly the Switch/V-MoE trade.
- **Per-sample routing.** Each batch element routes its own L tokens
  with capacity ``C = ceil(top_k * L * capacity_factor / E)``. This makes
  routing (and therefore the layer's output) invariant to HOW the batch
  is sharded: dense, dp-sharded, and expert-parallel (batch over "ep")
  execution are exactly equal — the property the parity tests pin.
- **Priority = slot-major.** All tokens' first choices claim capacity
  before any token's second choice, so a token is never bumped by
  another token's lower-priority pick; within a slot, priority is token
  order (cumsum). Gates renormalize over the kept top-k (V-MoE style).
- The auxiliary load-balance loss is the Switch loss
  ``E * sum_e f_e * p_e`` (f_e = fraction of tokens whose top-1 pick is
  e, p_e = mean router prob), averaged over the batch; the flax module
  sows it into the ``"intermediates"`` collection and the train step
  adds ``MVIT.MOE.AUX_LOSS_WEIGHT`` times its mean over MoE layers.

Router is deterministic (argmax of softmax logits; no jitter noise) —
routing noise is a regularization refinement orthogonal to the execution
design. Expert FFNs have no internal dropout (the block's DropPath still
applies to the whole MLP branch).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import exact_gelu, trunc_normal_init


@dataclasses.dataclass(frozen=True)
class MoESpec:
    """Static MoE configuration (hashable; lives on MViTSpec)."""

    num_experts: int = 0  # 0 = MoE disabled
    top_k: int = 2
    capacity_factor: float = 1.25
    # indices of blocks whose MLP is an MoE bank; () + num_experts>0 is
    # resolved by build_mvit_spec to "every other block" (V-MoE default)
    layers: tuple = ()

    def capacity(self, n_tokens: int) -> int:
        c = int(np.ceil(self.top_k * n_tokens * self.capacity_factor
                        / self.num_experts))
        return max(1, min(c, n_tokens))


def router_dispatch(xn, wr, *, top_k: int, capacity: int):
    """Route one sample's tokens: ``xn [L, D]``, ``wr [D, E]`` →
    ``(dispatch [L, E, C] f32, combine [L, E, C] f32, aux_loss scalar)``.

    ``sum_ec dispatch[l]`` is 1 for a kept (token, slot) and 0 for a
    dropped one; ``combine`` carries the renormalized gate on the same
    one-hot support. Pure function — shared verbatim by the flax layer
    and the expert-parallel shard_map path (parallel/ep.py), which is
    what makes their parity structural rather than coincidental.
    """
    L, E = xn.shape[0], wr.shape[1]
    logits = jnp.dot(xn.astype(jnp.float32), wr.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # [L, E]
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # [L, k]
    gate_vals = gate_vals / jnp.maximum(
        gate_vals.sum(axis=-1, keepdims=True), 1e-9)

    # slot-major capacity assignment: slot 0 for every token, then slot 1
    onehot = jax.nn.one_hot(gate_idx, E, dtype=jnp.float32)  # [L, k, E]
    sm = jnp.transpose(onehot, (1, 0, 2))  # [k, L, E], slot-major
    flat = sm.reshape(top_k * L, E)
    pos = (jnp.cumsum(flat, axis=0) - flat).astype(jnp.int32)
    keep = (pos < capacity) * flat  # [k*L, E]
    slot_pos = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # [k*L,E,C]
    disp_km = keep[..., None] * slot_pos  # [k*L, E, C]
    disp = disp_km.reshape(top_k, L, E, capacity)
    dispatch = disp.sum(axis=0)  # slots are disjoint experts per token
    combine = jnp.einsum(
        "klec,lk->lec", disp, gate_vals.astype(jnp.float32))

    # Switch load-balance loss over this sample's tokens
    top1 = onehot[:, 0, :]  # [L, E]
    f = top1.mean(axis=0)
    p = probs.mean(axis=0)
    aux = E * jnp.sum(f * p)
    return dispatch, combine, aux


def moe_ffn(expert_in, w1, b1, w2, b2, dtype):
    """Batched expert FFN: ``expert_in [..., E, C, D]``,
    ``w1 [E, D, H]``, ``w2 [E, H, O]`` → ``[..., E, C, O]``."""
    h = exact_gelu(
        jnp.einsum("...ecd,edh->...ech", expert_in.astype(dtype),
                   w1.astype(dtype)) + b1.astype(dtype)[:, None])
    return (jnp.einsum("...ech,eho->...eco", h, w2.astype(dtype))
            + b2.astype(dtype)[:, None])


def route_tokens(params, x, *, num_experts: int, top_k: int,
                 capacity_factor: float, ln_eps: float = 1e-6):
    """Pre-LN + per-sample routing for ``x [B, L, D]`` →
    ``(xn [B, L, D] f32, dispatch [B, L, E, C], combine [B, L, E, C],
    aux scalar)``. Shared by the dense layer and the expert-parallel path
    (the routing decision never depends on how the batch is sharded)."""
    L = x.shape[1]
    C = MoESpec(num_experts=num_experts, top_k=top_k,
                capacity_factor=capacity_factor).capacity(L)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + ln_eps)
          * params["ln_scale"].astype(jnp.float32)
          + params["ln_bias"].astype(jnp.float32))
    dispatch, combine, aux = jax.vmap(
        lambda t: router_dispatch(t, params["router"], top_k=top_k,
                                  capacity=C))(xn)
    return xn, dispatch, combine, aux.mean()


def moe_apply(params, x, *, top_k: int, capacity_factor: float,
              ln_eps: float = 1e-6, dtype=jnp.float32):
    """Full pre-LN MoE MLP on ``x [B, L, D]`` with a params dict
    ``{ln_scale, ln_bias, router, fc1:{kernel [E,D,H], bias [E,H]},
    fc2:{kernel [E,H,O], bias [E,O]}}`` → ``(y [B, L, O], aux scalar)``.

    Dense single-program execution; ``parallel/ep.py:ep_moe_apply`` is
    the expert-parallel execution of the same math.
    """
    E = params["router"].shape[1]
    xn, dispatch, combine, aux = route_tokens(
        params, x, num_experts=E, top_k=top_k,
        capacity_factor=capacity_factor, ln_eps=ln_eps)
    expert_in = jnp.einsum("blec,bld->becd", dispatch, xn.astype(dtype))
    out = moe_ffn(expert_in, params["fc1"]["kernel"], params["fc1"]["bias"],
                  params["fc2"]["kernel"], params["fc2"]["bias"], dtype)
    y = jnp.einsum("blec,beco->blo", combine.astype(dtype), out)
    return y, aux


class MoEMlp(nn.Module):
    """Pre-LN MoE MLP — drop-in for ``FusedMlp`` on blocks without a
    channel change (``build_mvit_spec`` validates MoE layers have
    ``dim_att == dim_out``). Sows the load-balance loss into
    ``intermediates/moe_aux_loss`` (collected by the train step when
    ``MVIT.MOE.AUX_LOSS_WEIGHT > 0``; silently dropped at eval)."""

    num_experts: int
    top_k: int
    capacity_factor: float
    hidden_features: int
    out_features: int
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale, ln_bias, *, deterministic: bool = True):
        D = x.shape[-1]
        E, H, O = self.num_experts, self.hidden_features, self.out_features
        router = self.param("router", trunc_normal_init, (D, E),
                            self.param_dtype)
        w1 = self.param("fc1_kernel", trunc_normal_init, (E, D, H),
                        self.param_dtype)
        b1 = self.param("fc1_bias", nn.initializers.zeros, (E, H),
                        self.param_dtype)
        w2 = self.param("fc2_kernel", trunc_normal_init, (E, H, O),
                        self.param_dtype)
        b2 = self.param("fc2_bias", nn.initializers.zeros, (E, O),
                        self.param_dtype)
        shape = x.shape
        params = {"ln_scale": ln_scale, "ln_bias": ln_bias,
                  "router": router,
                  "fc1": {"kernel": w1, "bias": b1},
                  "fc2": {"kernel": w2, "bias": b2}}
        assert x.ndim == 3, shape  # blocks pass [B, L, D]
        y, aux = moe_apply(
            params, x,
            top_k=self.top_k, capacity_factor=self.capacity_factor,
            ln_eps=self.ln_eps, dtype=self.dtype)
        self.sow("intermediates", "moe_aux_loss", aux)
        return y, None
