"""Pipeline parallelism (GPipe) for MViT.

The reference has no pipeline parallelism (SURVEY §2.2: DP/ZeRO-1 only);
this is a beyond-reference scaling mode for depth-dominated regimes —
models too large for one chip where tensor parallelism's per-layer
collectives don't pay (docs/DESIGN.md §12 measures that trade-off for
this family). The 51M flagship does not need it; the capability targets
bigger towers (e.g. scaled ActionCLIP text/video encoders) and is
validated end-to-end by ``dryrun_multichip``.

Design — TPU-first, but deliberately NOT a single GSPMD program:

- MViT stages are *heterogeneous*: token count shrinks 4x at every q-pool
  block and channels grow 96→768, so the classic ``shard_map`` +
  ``ppermute`` collective pipeline (uniform-layer scan over a stacked
  params axis) would need every inter-stage buffer padded to the largest
  (L, C) and every stage's params padded to the widest block. Instead,
  each stage is its own jitted executable pinned to its device; JAX's
  async dispatch overlaps them — device ``s`` executes microbatch ``m``
  while device ``s-1`` executes ``m+1`` — and inter-stage activations move
  with ``jax.device_put`` (ICI transfers on real hardware). The Python
  driver only *enqueues*; it never blocks until the final loss fetch.
- Stage split is FLOP-balanced over contiguous block ranges
  (:func:`split_pp_stages`): MViT's per-block cost is wildly non-uniform
  (stage-1 blocks see 16x the tokens of stage-4), so equal-depth splits
  would idle most of the pipe.
- Backward is GPipe-style recompute: each stage checkpoints only its
  INPUT per microbatch and re-runs its forward inside ``jax.vjp`` during
  the backward sweep — activation memory is O(stages + microbatches)
  stage-inputs, exactly the fairscale/GPipe trade the reference makes
  per-block with ``checkpoint_wrapper`` (video_model_builder.py:1036).
- Per-stage gradients accumulate on their own device; nothing is
  replicated. The schedule is the two-phase GPipe fill/drain (simple,
  bubble = (S-1)/(S-1+M)); 1F1B interleaving is a scheduling refinement
  the driver loop could adopt without touching the stage executables.

The block math reuses ``sp_model._sp_block`` (axis_name=None = dense),
which is parity-tested against ``MViT.apply`` — so pipeline parity
inherits the same kernel-level guarantees. Stochastic depth (the aicity
fine-tune trains with drop-path 0.1) is supported by drawing the
pre-scaled per-sample masks per (block, GLOBAL sample index) at the
driver and shipping each stage its slice alongside the activations: the
masks — not the rng — cross stage boundaries, so gradients are exactly
invariant to the microbatch count even with stochastic depth on
(test-pinned). ``init_optimizer(tx)`` / ``opt_step`` attach an optax
transform with per-stage optimizer state resident on each stage's
device (no moment is ever replicated). Dropout inside attention/MLP is
not plumbed (the aicity recipes train those at 0; head dropout would
live on the last stage only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sp_model import _ln, _dense, _pooled, _sp_block, dense_embed


def _active(kernel, stride) -> bool:
    return len(kernel) > 0 and not (
        np.prod(kernel) == 1 and np.prod(stride) == 1)


def thw_schedule(spec) -> list:
    """``out[i]`` = (T, H, W) token grid INTO block ``i``; ``out[depth]``
    is the final grid."""
    thw = spec.patch_dims
    out = [thw]
    for bs in spec.blocks:
        if _active(bs.kernel_q, bs.stride_q):
            thw = tuple(
                _pooled(e, k, s)
                for e, k, s in zip(thw, bs.kernel_q, bs.stride_q))
        out.append(thw)
    return out


def block_flops(spec, i: int, thw_in) -> float:
    """Rough matmul-FLOP estimate of block ``i`` per batch element (enough
    for load balancing; pooling convs and norms are O(L·C) noise at these
    shapes)."""
    bs = spec.blocks[i]
    expand = spec.channel_expand_front and bs.dim != bs.dim_out
    dim_att = bs.dim_out if expand else bs.dim
    L = int(np.prod(thw_in))
    thw_q = thw_in
    if _active(bs.kernel_q, bs.stride_q):
        thw_q = tuple(_pooled(e, k, s)
                      for e, k, s in zip(thw_in, bs.kernel_q, bs.stride_q))
    Lq = int(np.prod(thw_q))
    Lk = L
    if _active(bs.kernel_kv, bs.stride_kv):
        Lk = int(np.prod(tuple(
            _pooled(e, k, s)
            for e, k, s in zip(thw_in, bs.kernel_kv, bs.stride_kv))))
    hidden = int(dim_att * spec.mlp_ratio)
    f = 2.0 * L * bs.dim * 3 * dim_att        # fused qkv
    f += 2.0 * Lq * Lk * dim_att * 2          # qk^T + attn·v
    f += 2.0 * Lq * dim_att * dim_att         # attn out proj
    f += 2.0 * Lq * dim_att * hidden          # fc1
    f += 2.0 * Lq * hidden * bs.dim_out       # fc2
    if expand:
        f += 2.0 * L * bs.dim * bs.dim_out    # skip-path expansion proj
    elif dim_att != bs.dim_out:
        f += 2.0 * Lq * dim_att * bs.dim_out  # residual proj (back-expand)
    return f


def split_pp_stages(spec, n_stages: int) -> list:
    """FLOP-balanced contiguous partition of the blocks into ``n_stages``
    ``[lo, hi)`` ranges (min-max-stage-cost DP). The patch embed rides on
    stage 0 and the head on the last stage (both are noise)."""
    depth = len(spec.blocks)
    assert 1 <= n_stages <= depth, (n_stages, depth)
    sched = thw_schedule(spec)
    costs = [block_flops(spec, i, sched[i]) for i in range(depth)]
    prefix = np.concatenate([[0.0], np.cumsum(costs)])

    def rng_cost(lo, hi):
        return prefix[hi] - prefix[lo]

    # dp[s][i] = minimal max-stage-cost splitting blocks[:i] into s stages
    NEG = -1
    dp = np.full((n_stages + 1, depth + 1), np.inf)
    cut = np.full((n_stages + 1, depth + 1), NEG, dtype=int)
    dp[0][0] = 0.0
    for s in range(1, n_stages + 1):
        for i in range(s, depth + 1):
            for j in range(s - 1, i):
                c = max(dp[s - 1][j], rng_cost(j, i))
                if c < dp[s][i]:
                    dp[s][i] = c
                    cut[s][i] = j
    ranges = []
    i = depth
    for s in range(n_stages, 0, -1):
        j = int(cut[s][i])
        ranges.append((j, i))
        i = j
    return ranges[::-1]


def _dense_head(params, spec, xv, cls_tok, dtype):
    """Final LN → token mean (or cls) → linear head; dense mirror of the
    tail of ``sp_model.sp_forward`` (reference head_helper.py:369-417,
    eval path without the activation)."""
    B = xv.shape[0]
    tokens = xv.reshape(B, -1, xv.shape[-1])
    if spec.cls_embed:
        feat = cls_tok[:, 0]
        if not spec.no_norm_before_avg:
            feat = _ln(feat, params["norm"]["scale"],
                       params["norm"]["bias"], 1e-6)
    else:
        if not spec.no_norm_before_avg:
            tokens = _ln(tokens, params["norm"]["scale"],
                         params["norm"]["bias"], 1e-6)
        feat = tokens.mean(axis=1)
    return _dense(feat, params["head"]["projection"], dtype)


_EMBED_KEYS = ("patch_embed", "pos_embed_spatial", "pos_embed_temporal",
               "pos_embed", "pos_embed_class", "cls_token")
_HEAD_KEYS = ("norm", "head")


def stage_param_keys(spec, ranges, s: int) -> list:
    keys = [f"blocks_{i}" for i in range(*ranges[s])]
    if s == 0:
        keys += [k for k in _EMBED_KEYS]
    if s == len(ranges) - 1:
        keys += list(_HEAD_KEYS)
    return keys


def split_stage_params(params, spec, ranges) -> list:
    """Disjoint per-stage param subtrees (union == params)."""
    out = []
    for s in range(len(ranges)):
        keys = stage_param_keys(spec, ranges, s)
        out.append({k: params[k] for k in keys if k in params})
    return out


def merge_stage_params(stage_params) -> dict:
    merged = {}
    for p in stage_params:
        merged.update(p)
    return merged


class MViTPipeline:
    """GPipe executor: one jitted stage per device, async-dispatch overlap.

    ``apply(x)`` — pipelined inference logits (pre-activation).
    ``loss_and_grads(x, labels, n_microbatches)`` — mean softmax-CE over
    the batch + per-stage gradient pytrees (each resident on its stage's
    device), computed with the GPipe fill/drain schedule and per-stage
    forward recompute.
    """

    def __init__(self, params, spec, devices, *, n_stages: int | None = None,
                 dtype=jnp.float32):
        n_stages = n_stages or len(devices)
        assert len(devices) >= n_stages, (len(devices), n_stages)
        if any(getattr(b, "moe", False) for b in spec.blocks):
            # _sp_block runs the dense FusedMlp math; MoE expert banks
            # have a different param layout (and their own scaling axis —
            # dp x ep, parallel/ep.py). Composing pp x ep is future work.
            raise NotImplementedError(
                "MViTPipeline does not support MoE blocks; use dp x ep")
        self.spec = spec
        self.dtype = dtype
        self.devices = list(devices)[:n_stages]
        self.ranges = split_pp_stages(spec, n_stages)
        self.n_stages = n_stages
        self.stage_params = [
            jax.device_put(p, d) for p, d in
            zip(split_stage_params(params, spec, self.ranges), self.devices)
        ]
        sched = thw_schedule(spec)
        blk_kw = dict(mode=spec.mode, qkv_bias=spec.qkv_bias,
                      q_pool_residual=spec.q_pool_residual,
                      channel_expand_front=spec.channel_expand_front,
                      axis_name=None, n_sp=1, dtype=dtype)

        def run_blocks(p, xv, cls, lo, hi, dpm):
            thw = sched[lo]
            for i in range(lo, hi):
                xv, cls, thw = _sp_block(
                    xv, cls, p[f"blocks_{i}"], spec.blocks[i], thw,
                    droppath=(dpm[i - lo, 0], dpm[i - lo, 1]), **blk_kw)
            return xv, cls

        def make_stage_fn(s):
            lo, hi = self.ranges[s]
            first, last = s == 0, s == self.n_stages - 1

            def fn(p, carry, dpm):
                # dpm [hi-lo, 2, B]: pre-scaled stochastic-depth masks
                # (all-ones at eval) — drawn by the driver per
                # (block, GLOBAL sample), so microbatching is invariant
                if first:
                    xv, cls = dense_embed(p, spec, carry, dtype)
                else:
                    xv, cls = carry
                    if not spec.cls_embed:
                        cls = None  # [B, 0, C] placeholder -> real None
                xv, cls = run_blocks(p, xv, cls, lo, hi, dpm)
                if last:
                    return _dense_head(p, spec, xv, cls, dtype)
                if cls is None:
                    # keep the carry pytree structure static across stages
                    cls = jnp.zeros((xv.shape[0], 0, xv.shape[-1]), dtype)
                return xv, cls

            return fn

        # cls is threaded as a [B, 0, C] placeholder when CLS_EMBED is off
        # so every stage boundary carries the same pytree structure
        self._has_cls = spec.cls_embed
        self._stage_fns = [make_stage_fn(s) for s in range(n_stages)]
        self._fwd = [jax.jit(f) for f in self._stage_fns]

        def make_bwd_last(fn):
            def loss_fn(p, carry, labels, scale, dpm):
                logits = fn(p, carry, dpm)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32))
                loss = -jnp.take_along_axis(
                    logp, labels[:, None], axis=1).mean()
                return loss * scale

            def bwd(p, carry, labels, scale, dpm):
                (loss), grads = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(p, carry, labels, scale, dpm)
                return loss, grads[0], grads[1]

            return bwd

        def make_bwd(fn):
            def bwd(p, carry, dy, dpm):
                _, vjp = jax.vjp(lambda pp, cc: fn(pp, cc, dpm), p, carry)
                dp, dcarry = vjp(dy)
                return dp, dcarry

            return bwd

        self._bwd = [
            jax.jit(make_bwd_last(self._stage_fns[-1])
                    if s == n_stages - 1 else make_bwd(self._stage_fns[s]))
            for s in range(n_stages)
        ]
        self._acc = [jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
                     for _ in range(n_stages)]
        self._sgd = jax.jit(
            lambda p, g, lr: jax.tree.map(lambda a, b: a - lr * b, p, g))

    def _to_stage(self, val, s: int):
        return jax.device_put(val, self.devices[s])

    def _droppath_masks(self, key, B: int):
        """Pre-scaled stochastic-depth masks ``[depth, 2, B]`` (attention
        branch, MLP branch) drawn per (block, GLOBAL sample) — reference
        common.py drop_path semantics (keep w.p. 1-rate, scale 1/(1-rate)).
        All-ones when ``key`` is None (eval) or every rate is 0, so the
        deterministic path is the rate-0 special case of one executable."""
        depth = len(self.spec.blocks)
        masks = np.ones((depth, 2, B), np.float32)
        if key is None:
            return masks
        for i, bs in enumerate(self.spec.blocks):
            rate = float(bs.drop_path)
            if rate <= 0.0:
                continue
            keep = 1.0 - rate
            bern = jax.random.bernoulli(
                jax.random.fold_in(key, i), keep, (2, B))
            masks[i] = np.asarray(bern, np.float32) / keep
        return masks

    def _stage_masks(self, masks, s: int):
        lo, hi = self.ranges[s]
        return jnp.asarray(masks[lo:hi])

    def apply(self, x, n_microbatches: int = 1):
        """Pipelined inference: logits ``[B, num_classes]`` on stage -1's
        device. With M > 1 microbatches the M×S stage executions overlap
        across devices (fill/drain bubble only)."""
        B = x.shape[0]
        assert B % n_microbatches == 0, (B, n_microbatches)
        masks = np.split(self._droppath_masks(None, B), n_microbatches, 2)
        outs = []
        for m, xm in enumerate(np.split(np.asarray(x), n_microbatches)):
            carry = self._to_stage(jnp.asarray(xm, self.dtype), 0)
            for s in range(self.n_stages):
                carry = self._fwd[s](self.stage_params[s], carry,
                                     self._stage_masks(masks[m], s))
                if s + 1 < self.n_stages:
                    carry = self._to_stage(carry, s + 1)
            outs.append(carry)
        return jnp.concatenate(outs, axis=0)

    def loss_and_grads(self, x, labels, n_microbatches: int = 1,
                       droppath_key=None):
        """GPipe fwd/bwd: returns ``(loss, stage_grads)`` where ``loss`` is
        the softmax-CE mean over the full batch and ``stage_grads[s]`` is
        the gradient pytree of ``stage_params[s]`` on its device.

        ``droppath_key``: optional PRNG key enabling stochastic depth at
        the spec's per-block rates. Masks are drawn per (block, GLOBAL
        sample) before the microbatch split, so the gradients are exactly
        invariant to ``n_microbatches`` (test-pinned)."""
        B = x.shape[0]
        M = n_microbatches
        assert B % M == 0, (B, M)
        x_mbs = np.split(np.asarray(x), M)
        y_mbs = np.split(np.asarray(labels), M)
        m_mbs = np.split(self._droppath_masks(droppath_key, B), M, 2)
        scale = 1.0 / M  # batch mean = mean of equal-size microbatch means

        # ---- forward fill: stash each stage's INPUT per microbatch
        # (recomputed inside the backward's vjp — GPipe checkpointing)
        inputs = [[None] * M for _ in range(self.n_stages)]
        for m in range(M):
            carry = self._to_stage(jnp.asarray(x_mbs[m], self.dtype), 0)
            for s in range(self.n_stages):
                inputs[s][m] = carry
                if s + 1 < self.n_stages:
                    carry = self._to_stage(
                        self._fwd[s](self.stage_params[s], carry,
                                     self._stage_masks(m_mbs[m], s)),
                        s + 1)

        # ---- backward drain (reverse stage order per microbatch)
        grads = [None] * self.n_stages
        losses = []
        for m in range(M):
            ym = self._to_stage(jnp.asarray(y_mbs[m]), self.n_stages - 1)
            loss_m, dp, dcarry = self._bwd[-1](
                self.stage_params[-1], inputs[-1][m], ym,
                jnp.float32(scale), self._stage_masks(m_mbs[m], -1))
            losses.append(loss_m)
            grads[-1] = dp if grads[-1] is None else self._acc[-1](
                grads[-1], dp)
            for s in range(self.n_stages - 2, -1, -1):
                dcarry = self._to_stage(dcarry, s)
                dp, dcarry = self._bwd[s](
                    self.stage_params[s], inputs[s][m], dcarry,
                    self._stage_masks(m_mbs[m], s))
                grads[s] = dp if grads[s] is None else self._acc[s](
                    grads[s], dp)
        loss = jnp.sum(jnp.stack(losses))
        return loss, grads

    def sgd_step(self, x, labels, lr: float, n_microbatches: int = 1,
                 droppath_key=None):
        """One in-place SGD update (dryrun/test convenience); returns loss."""
        loss, grads = self.loss_and_grads(x, labels, n_microbatches,
                                          droppath_key)
        for s in range(self.n_stages):
            self.stage_params[s] = self._sgd(
                self.stage_params[s], grads[s], jnp.float32(lr))
        return loss

    def init_optimizer(self, tx):
        """Attach an optax transform: per-stage optimizer state lives on
        its stage's device (a pipeline-parallel ZeRO — no moment is ever
        replicated), updates run as per-stage jitted executables."""
        self._tx = tx
        self.opt_states = [
            self._to_stage(tx.init(jax.device_get(p)), s)
            for s, p in enumerate(self.stage_params)
        ]

        def upd(g, o, p):
            updates, new_o = tx.update(g, o, p)
            import optax

            return optax.apply_updates(p, updates), new_o

        self._opt_upd = [jax.jit(upd) for _ in range(self.n_stages)]

    def opt_step(self, x, labels, n_microbatches: int = 1,
                 droppath_key=None):
        """One full training step (fwd + recompute-bwd + optax update) —
        the pipeline equivalent of engine/steps.make_train_step's
        fwd/bwd/update. Returns the batch loss."""
        assert getattr(self, "_tx", None) is not None, \
            "call init_optimizer(tx) first"
        loss, grads = self.loss_and_grads(x, labels, n_microbatches,
                                          droppath_key)
        for s in range(self.n_stages):
            self.stage_params[s], self.opt_states[s] = self._opt_upd[s](
                grads[s], self.opt_states[s], self.stage_params[s])
        return loss

    def merged_params(self):
        """Reassemble the full (host) param dict from the stages."""
        return merge_stage_params([jax.device_get(p)
                                   for p in self.stage_params])
