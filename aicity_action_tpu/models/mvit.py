"""MViT-v1/v2 video backbone, TPU-native.

Re-design of the reference MViT
(`/root/reference/slowfast/models/video_model_builder.py:794-1335` and
`slowfast/models/attention.py`) in flax/JAX:

- The per-block dim/head/pool schedule is a *pure derivation*
  (:func:`build_mvit_spec`) instead of the reference's in-place cfg mutation
  (`video_model_builder.py:957-981`).
- Token tensors are channels-last; pooling runs in NDHWC (see ops/pooling.py).
- Activation checkpointing uses `flax.linen.remat` (replaces fairscale's
  checkpoint_wrapper, `video_model_builder.py:1036-1037`).
- Numerical parity notes vs the reference:
  * block norms (norm1/norm2/final) use LayerNorm eps=1e-6
    (`video_model_builder.py:849-851`); the q/k/v pool norms inside attention
    use the torch default eps=1e-5 (`attention.py:338` passes raw
    nn.LayerNorm).
  * GELU is the exact erf form (torch default).
  * softmax/matmul accumulate in float32 via preferred_element_type.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pooling import attention_pool
from ..ops.pallas import flash_attention as fa
from ..ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_supported,
)
from .common import (
    DropPath,
    FusedLayerNorm,
    round_width,
    trunc_normal_init,
)
from .heads import TransformerBasicHead, ContrastiveProjectionHead
from .moe import MoEMlp, MoESpec

Triple = tuple[int, int, int]


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Static description of one MultiScaleBlock."""

    dim: int  # input channel dim
    dim_out: int  # output channel dim
    num_heads: int
    kernel_q: Triple | tuple  # () = no q pooling
    kernel_kv: Triple | tuple
    stride_q: Triple | tuple
    stride_kv: Triple | tuple
    drop_path: float
    moe: bool = False  # MLP is an MoE expert bank (models/moe.py)


@dataclasses.dataclass(frozen=True)
class MViTSpec:
    """Static, hashable description of a full MViT model."""

    crop_size: int
    num_frames: int
    in_channels: int
    patch_kernel: Triple
    patch_stride: Triple
    patch_padding: Triple
    embed_dim: int
    depth: int
    cls_embed: bool
    sep_pos_embed: bool
    drop_rate: float
    mode: str  # conv | max | avg
    qkv_bias: bool
    mlp_ratio: float
    q_pool_residual: bool
    channel_expand_front: bool
    no_norm_before_avg: bool
    direct_input: bool
    blocks: tuple  # tuple[BlockSpec, ...] and expand flags resolved
    num_classes: int
    head_dropout: float
    head_act: str
    use_head_act_in_train: bool
    act_checkpoint: bool
    contra_enable: bool = False
    contra_embed_dim: int = 512
    contra_use_mlp: bool = False
    # multi-dataset heads (MODEL.USE_MULTI_HEAD, video_model_builder:1106-1117)
    use_multi_head: bool = False
    multi_datasets: tuple = ()
    multi_num_classes: tuple = ()
    multi_head_act: tuple = ()
    multi_use_mlp: bool = False
    multi_add_cross_proj: bool = False
    # detection (MViT ROI path, video_model_builder:1258-1303)
    detection_enable: bool = False
    roi_resolution: int = 7
    roi_scale_factor: int = 16
    roi_aligned: bool = True
    use_spatial_maxpool_before_proj: bool = False
    # Mixture-of-Experts MLPs (beyond-reference; models/moe.py)
    moe: "MoESpec" = MoESpec()

    @property
    def patch_dims(self) -> Triple:
        return (
            self.num_frames // self.patch_stride[0],
            self.crop_size // self.patch_stride[1],
            self.crop_size // self.patch_stride[2],
        )


def _t3(x) -> Triple:
    return tuple(int(v) for v in x)  # type: ignore[return-value]


def build_mvit_spec(cfg) -> MViTSpec:
    """Derive the static block schedule from a config.

    Pure version of the reference constructor logic
    (`video_model_builder.py:915-1040`): dim/head multipliers, q-pool stride
    schedule (incl. Q_POOL_ALL stride-1 conv pooling at every block), and the
    adaptive kv-stride decay (POOL_KV_STRIDE_ADAPTIVE divides by each block's
    q stride as resolution shrinks).
    """
    m = cfg.MVIT
    depth = m.DEPTH

    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    for i, mul in m.DIM_MUL:
        dim_mul[i] = mul
    for i, mul in m.HEAD_MUL:
        head_mul[i] = mul

    pool_q: list = [() for _ in range(depth)]
    pool_kv: list = [() for _ in range(depth)]
    stride_q: list = [() for _ in range(depth)]
    stride_kv: list = [() for _ in range(depth)]

    kvq_kernel = m.POOL_KVQ_KERNEL
    for entry in m.POOL_Q_STRIDE:
        i, s = entry[0], entry[1:]
        stride_q[i] = _t3(s)
        pool_q[i] = _t3(kvq_kernel) if kvq_kernel is not None else _t3(
            [v + 1 if v > 1 else v for v in s]
        )

    if m.Q_POOL_ALL:
        # v2: stride-1 conv pooling on q at every remaining block
        assert kvq_kernel is not None
        for i in range(depth):
            if not pool_q[i]:
                pool_q[i] = _t3(kvq_kernel)
                stride_q[i] = (1, 1, 1)

    kv_stride_schedule = m.POOL_KV_STRIDE
    if m.POOL_KV_STRIDE_ADAPTIVE is not None:
        _skv = list(m.POOL_KV_STRIDE_ADAPTIVE)
        kv_stride_schedule = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _skv = [max(_skv[d] // stride_q[i][d], 1) for d in range(3)]
            kv_stride_schedule.append([i] + list(_skv))

    for entry in kv_stride_schedule or []:
        i, s = entry[0], entry[1:]
        stride_kv[i] = _t3(s)
        pool_kv[i] = _t3(kvq_kernel) if kvq_kernel is not None else _t3(
            [v + 1 if v > 1 else v for v in s]
        )

    dpr = np.linspace(0, m.DROPPATH_RATE, depth)

    moe_spec = MoESpec()
    moe_layers: frozenset = frozenset()
    if m.MOE.ENABLE:
        layers = tuple(int(i) for i in m.MOE.LAYERS)
        if not layers:
            layers = tuple(range(1, depth, 2))  # V-MoE "every other" default
        moe_spec = MoESpec(
            num_experts=int(m.MOE.NUM_EXPERTS),
            top_k=int(m.MOE.TOP_K),
            capacity_factor=float(m.MOE.CAPACITY_FACTOR),
            layers=layers,
        )
        moe_layers = frozenset(layers)

    blocks = []
    num_heads = m.NUM_HEADS
    embed_dim = m.EMBED_DIM
    dim_out = m.EMBED_DIM
    for i in range(depth):
        num_heads = round_width(num_heads, head_mul[i])
        if m.CHANNEL_EXPAND_FRONT:
            embed_dim_mul = 1.0 if i == 0 else dim_mul[i - 1]
            embed_dim = round_width(embed_dim, embed_dim_mul, divisor=num_heads)
            dim_out = round_width(dim_out, dim_mul[i], divisor=num_heads)
        else:
            embed_dim = round_width(embed_dim, dim_mul[i], divisor=num_heads)
            dim_out = round_width(
                embed_dim,
                dim_mul[i + 1],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
        moe_here = i in moe_layers
        if moe_here and not (m.CHANNEL_EXPAND_FRONT or embed_dim == dim_out):
            # the MoE bank replaces the MLP, which on non-expand-front
            # channel-change blocks also carries the dim change + normed
            # residual projection — keep those on the dense FusedMlp
            raise ValueError(
                f"MVIT.MOE.LAYERS includes block {i}, which changes "
                f"channels {embed_dim}->{dim_out}; MoE blocks must have "
                "dim == dim_out (pick non-transition blocks)")
        blocks.append(
            BlockSpec(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                kernel_q=pool_q[i],
                kernel_kv=pool_kv[i],
                stride_q=stride_q[i],
                stride_kv=stride_kv[i],
                drop_path=float(dpr[i]),
                moe=moe_here,
            )
        )

    return MViTSpec(
        crop_size=cfg.DATA.TRAIN_CROP_SIZE,
        num_frames=cfg.DATA.NUM_FRAMES,
        in_channels=cfg.DATA.INPUT_CHANNEL_NUM[0],
        patch_kernel=_t3(m.PATCH_KERNEL),
        patch_stride=_t3(m.PATCH_STRIDE),
        patch_padding=_t3(m.PATCH_PADDING),
        embed_dim=m.EMBED_DIM,
        depth=depth,
        cls_embed=m.CLS_EMBED_ON,
        sep_pos_embed=m.SEP_POS_EMBED,
        drop_rate=m.DROPOUT_RATE,
        mode=m.MODE,
        qkv_bias=m.QKV_BIAS,
        mlp_ratio=m.MLP_RATIO,
        q_pool_residual=m.Q_POOL_RESIDUAL,
        channel_expand_front=m.CHANNEL_EXPAND_FRONT,
        no_norm_before_avg=m.NO_NORM_BEFORE_AVG,
        direct_input=m.DIRECT_INPUT,
        blocks=tuple(blocks),
        num_classes=cfg.MODEL.NUM_CLASSES,
        head_dropout=cfg.MODEL.DROPOUT_RATE,
        head_act=cfg.MODEL.HEAD_ACT,
        use_head_act_in_train=cfg.MODEL.USE_HEAD_ACT_IN_TRAIN,
        act_checkpoint=cfg.MODEL.ACT_CHECKPOINT,
        contra_enable=cfg.CONTRA.ENABLE,
        contra_embed_dim=cfg.CONTRA.embed_dim,
        contra_use_mlp=cfg.CONTRA.use_MLP,
        use_multi_head=cfg.MODEL.USE_MULTI_HEAD,
        multi_datasets=tuple(cfg.MODEL.MULTI_DATASETS),
        multi_num_classes=tuple(cfg.MODEL.MULTI_NUM_CLASSES),
        multi_head_act=tuple(cfg.MODEL.MULTI_HEAD_ACT),
        multi_use_mlp=cfg.MODEL.MULTI_USE_MLP,
        multi_add_cross_proj=cfg.MODEL.MULTI_ADD_CROSS_PROJ,
        detection_enable=cfg.DETECTION.ENABLE,
        roi_resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
        roi_scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
        roi_aligned=cfg.DETECTION.ALIGNED,
        use_spatial_maxpool_before_proj=(
            cfg.DETECTION.USE_SPATIAL_MAXPOOL_BEFORE_PROJ),
        moe=moe_spec,
    )


class _DenseParams(nn.Module):
    """Declares Dense-compatible params (``kernel``/``bias``) and returns
    them as arrays — used where a fused Pallas kernel consumes the weights
    of several logical layers at once while checkpoint paths must keep the
    reference's per-layer module structure."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", trunc_normal_init, (in_features, self.features),
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
        return kernel, bias


class _LNParams(nn.Module):
    """Declares LayerNorm params (``scale``/``bias``) and returns them."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: int):
        scale = self.param(
            "scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), self.param_dtype)
        return scale, bias


def _ln_math(x, scale, bias, eps):
    """Reference LayerNorm math (f32 stats) — the XLA fallback path."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu" and not fa.is_disabled()


def _fuse_attn_ln_enabled(deterministic: bool = True) -> bool:
    """Fuse the post-pool per-head LNs (+ v2 q-residual) into the flash
    kernels (ops/pallas/flash_attention.py fused-LN section).

    Default ``auto``: fused for inference only. The fused forward is a
    measured win at eval (67.3 vs 63.9 clips/s @448 bs8 — no-lse kernels
    keep the plain logits budget), but the AD path is a measured LOSS
    (201.3 vs 193.9 ms/step @448 bs4): the lse-saving forward must starve
    its logits tiles to fit the resident kn/vn scratch, and the backward's
    in-kernel LN recompute gives back more than the ~11 ms of norm
    launches it saves (docs/DESIGN.md §17). Env override for A/B:
    ``AICITY_TPU_FUSE_ATTN_LN=1`` forces it everywhere, ``0`` disables."""
    import os

    v = os.environ.get("AICITY_TPU_FUSE_ATTN_LN", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return deterministic


class FusedMlp(nn.Module):
    """Pre-LN + MLP, fused into one Pallas kernel on TPU.

    Computes ``fc2(gelu(fc1(LN(x))))`` (reference: block norm2 + Mlp,
    `attention.py:436-445`). Param paths match the reference (`fc1`/`fc2``
    submodules); the LN params are passed in by the block (they live at the
    block level as ``norm2``). Returns ``(mlp_out, x_norm)`` — ``x_norm``
    is materialized only when ``need_normed`` (the non-expand-front
    residual projection reads it).
    """

    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    need_normed: bool = False
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale, ln_bias, *, deterministic: bool = True):
        from ..ops.pallas.fused_dense import fused_ln_mlp, ln_mlp_supported
        from .common import exact_gelu

        D = x.shape[-1]
        w1, b1 = _DenseParams(
            features=self.hidden_features, param_dtype=self.param_dtype,
            name="fc1")(D)
        w2, b2 = _DenseParams(
            features=self.out_features, param_dtype=self.param_dtype,
            name="fc2")(self.hidden_features)
        w1, b1, w2, b2 = (t.astype(self.dtype) for t in (w1, b1, w2, b2))

        shape = x.shape
        M = int(np.prod(shape[:-1]))
        dropout_off = deterministic or self.drop_rate == 0.0
        if (
            _use_pallas()
            and not self.need_normed
            and dropout_off
            and ln_mlp_supported(M, D, self.hidden_features,
                                 self.out_features)
        ):
            out = fused_ln_mlp(
                x.reshape(M, D).astype(self.dtype),
                ln_scale.astype(self.dtype), ln_bias.astype(self.dtype),
                w1, b1, w2, b2, self.ln_eps,
            ).reshape(*shape[:-1], self.out_features)
            return out, None

        xn = _ln_math(x.astype(self.dtype), ln_scale, ln_bias, self.ln_eps)
        h = exact_gelu(jnp.dot(xn, w1) + b1)
        if not dropout_off:
            h = nn.Dropout(self.drop_rate, deterministic=deterministic)(h)
        out = jnp.dot(h, w2) + b2
        if not dropout_off:
            out = nn.Dropout(self.drop_rate,
                             deterministic=deterministic)(out)
        return out, xn


class MultiScaleAttention(nn.Module):
    """Pooled multi-head attention (reference: attention.py:86-284).

    q/k/v are pooled in token space (depthwise conv / max / avg) before the
    attention matmuls; the output length follows the pooled query. MViT-v2
    adds a query residual (``x += q``) before the output projection.
    """

    dim: int
    dim_out: int
    num_heads: int
    kernel_q: tuple
    kernel_kv: tuple
    stride_q: tuple
    stride_kv: tuple
    mode: str
    qkv_bias: bool
    has_cls: bool
    q_pool_residual: bool
    drop_rate: float = 0.0
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _active(kernel, stride) -> bool:
        """Pooling is skipped entirely for 1x1x1 kernel with unit stride."""
        return (
            len(kernel) > 0
            and not (np.prod(kernel) == 1 and np.prod(stride) == 1)
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, thw: Triple, *, ln_scale=None, ln_bias=None,
        ln_eps: float = 1e-6, deterministic: bool = True
    ) -> tuple[jax.Array, Triple]:
        """``x`` is the UN-normalized block input when ``ln_scale`` is given
        (the pre-LN fuses into the qkv projection, ops/pallas/fused_dense);
        otherwise the caller normalized already."""
        B, L, _ = x.shape
        C = self.dim_out
        h = self.num_heads
        d = C // h
        scale = d ** -0.5

        # qkv params keep the reference's fused-linear layout
        # (attention.py:230): one [D, 3C] kernel under module "qkv".
        qkv_w, qkv_b = _DenseParams(
            features=3 * C,
            use_bias=self.qkv_bias,
            param_dtype=self.param_dtype,
            name="qkv",
        )(x.shape[-1])
        qkv_w = qkv_w.astype(self.dtype)
        qkv_b = qkv_b.astype(self.dtype) if qkv_b is not None else None

        from ..ops.pallas.fused_dense import fused_ln_qkv, ln_qkv_supported

        D = x.shape[-1]
        if (
            ln_scale is not None
            and _use_pallas()
            and ln_qkv_supported(B * L, D, 3 * C)
        ):
            q, k, v = fused_ln_qkv(
                x.reshape(B * L, D).astype(self.dtype),
                ln_scale.astype(self.dtype), ln_bias.astype(self.dtype),
                qkv_w, qkv_b, ln_eps,
            )
            q, k, v = (t.reshape(B, L, C) for t in (q, k, v))
        else:
            xn = (
                _ln_math(x.astype(self.dtype), ln_scale, ln_bias, ln_eps)
                if ln_scale is not None else x.astype(self.dtype)
            )
            # slice the WEIGHT, not the [B, L, 3C] activation (the
            # activation slice profiled at ~8 ms/step of copy at 448)
            outs = []
            for i in range(3):
                o = jnp.dot(xn, qkv_w[:, i * C:(i + 1) * C])
                if qkv_b is not None:
                    o = o + qkv_b[i * C:(i + 1) * C]
                outs.append(o)
            q, k, v = outs

        do_q = self._active(self.kernel_q, self.stride_q)
        do_kv = self._active(self.kernel_kv, self.stride_kv)

        def _pool_param(name, kernel):
            return self.param(
                f"pool_{name}",
                nn.initializers.lecun_normal(),
                (*kernel, 1, d),
                self.param_dtype,
            ).astype(self.dtype)

        def _norm(name, t, groups=1):
            # LN over head_dim; torch-default eps (attention.py:338
            # constructs a raw nn.LayerNorm). groups=h normalizes per head
            # without leaving the fused [B, L, h*d] channel layout.
            return FusedLayerNorm(
                epsilon=1e-5, groups=groups, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"norm_{name}",
            )(t)

        # TPU-fast layout: heads stay folded in the channel dim
        # ([B, L, h*d]) through pooling — all heads share the depthwise
        # pool weights (the reference folds heads into batch; identical
        # math), so ONE conv with h-tiled weights pools every head, and
        # the flash kernel slices heads via its grid. No head-major
        # transposes before pooling; the q-residual add is layout-free.
        # A cls token (if any) bypasses pooling and rejoins before the
        # pool norm (reference attention_pool order: pool -> re-attach
        # cls -> LN, attention.py:12-83); its odd sequence lengths go
        # through the padded flash kernel (masked KV columns).

        # single injectable gate (_use_pallas) so interpret-mode tests can
        # force the fused branches on CPU (monkeypatch mvit._use_pallas)
        use_fa = self.use_flash and _use_pallas()
        # Defer the post-pool per-head LNs into the flash kernel when the
        # fused-LN path can take them (kills ~6 kernel launches per block
        # and the HBM round-trip of the LONG normalized q; the v2
        # q-residual rides along in-kernel). Params are declared with the
        # same names either way (checkpoint layout unchanged).
        fuse_ln = (
            use_fa
            and self.mode == "conv"
            and not self.has_cls
            and _fuse_attn_ln_enabled(deterministic)
        )

        def _apply_deferred_norm(t, sc, bi):
            # identical to FusedLayerNorm.__call__ (grouped, eps 1e-5)
            from ..ops.pallas.layer_norm import (
                fused_layer_norm,
                layer_norm_supported,
            )

            t = t.astype(self.dtype)
            if _use_pallas() and layer_norm_supported(t.shape, h):
                return fused_layer_norm(
                    t, sc.astype(self.dtype), bi.astype(self.dtype),
                    1e-5, h)
            ts = t.reshape(*t.shape[:-1], h, d)
            return _ln_math(ts, sc, bi, 1e-5).reshape(t.shape)

        def _pool_fused(t, name, kernel, stride):
            if self.mode == "conv":
                w = jnp.tile(_pool_param(name, kernel), (1, 1, 1, 1, h))
            else:
                w = None
            cls_tok, body = (
                (t[:, :1], t[:, 1:]) if self.has_cls else (None, t))
            body, new_thw = attention_pool(
                body, thw, mode=self.mode, kernel=kernel, stride=stride,
                conv_weights=w, has_cls=False,
            )
            t = (body if cls_tok is None
                 else jnp.concatenate([cls_tok, body], axis=1))
            ln_par = None
            if self.mode == "conv":
                if fuse_ln:
                    # declare the LN params without applying (same paths
                    # as FusedLayerNorm — checkpoints unchanged); the norm
                    # itself fuses into the attention kernel below
                    ln_par = _LNParams(
                        param_dtype=self.param_dtype,
                        name=f"norm_{name}")(d)
                else:
                    t = _norm(name, t, groups=h)
            return t, new_thw, ln_par

        out_thw = thw
        q_ln = k_ln = v_ln = None
        if do_q:
            q, out_thw, q_ln = _pool_fused(
                q, "q", self.kernel_q, self.stride_q)
        if do_kv:
            k, _, k_ln = _pool_fused(k, "k", self.kernel_kv, self.stride_kv)
            v, _, v_ln = _pool_fused(v, "v", self.kernel_kv, self.stride_kv)

        Lq, Lk = q.shape[1], k.shape[1]
        resid_done = False
        if fuse_ln:
            flags = (q_ln is not None, k_ln is not None, v_ln is not None)
            if any(flags) and fa.flash_attention_ln_supported(
                    Lq, Lk, d, flags):
                dummy = jnp.ones((d,), self.dtype), jnp.zeros(
                    (d,), self.dtype)
                gq, bq = q_ln if q_ln is not None else dummy
                gk, bk = k_ln if k_ln is not None else dummy
                gv, bv = v_ln if v_ln is not None else dummy

                def _hm(t, L):  # head-major [B*h, L, d] view
                    if h == 1:
                        return t.reshape(B, L, d)
                    return (t.reshape(B, L, h, d)
                            .transpose(0, 2, 1, 3).reshape(B * h, L, d))

                out = fa.flash_attention_ln(
                    _hm(q.astype(self.dtype), Lq),
                    _hm(k.astype(self.dtype), Lk),
                    _hm(v.astype(self.dtype), Lk),
                    gq.astype(self.dtype), bq.astype(self.dtype),
                    gk.astype(self.dtype), bk.astype(self.dtype),
                    gv.astype(self.dtype), bv.astype(self.dtype),
                    scale, 1e-5, flags, self.q_pool_residual,
                )
                if h == 1:
                    out = out.reshape(B, Lq, C)
                else:
                    out = (out.reshape(B, h, Lq, d)
                           .transpose(0, 2, 1, 3).reshape(B, Lq, C))
                resid_done = True  # q-residual was added in-kernel
            else:
                # fused path declined these shapes: apply the deferred
                # norms and continue on the standard path
                if q_ln is not None:
                    q = _apply_deferred_norm(q, *q_ln)
                if k_ln is not None:
                    k = _apply_deferred_norm(k, *k_ln)
                if v_ln is not None:
                    v = _apply_deferred_norm(v, *v_ln)
                fuse_ln = False
        if not resid_done:
            q4 = q.reshape(B, Lq, h, d)
            k4 = k.reshape(B, Lk, h, d)
            v4 = v.reshape(B, Lk, h, d)
            if use_fa and flash_attention_supported(Lq, Lk, d):
                fa_fn = flash_attention
            elif use_fa and fa.flash_attention_padded_supported(Lq, Lk, d):
                fa_fn = fa.flash_attention_padded
            else:
                fa_fn = None
            if fa_fn is not None:
                if h == 1:
                    # [B, L, 1, d] == [G, L, d]: zero-copy into the kernel
                    out = fa_fn(
                        q.reshape(B, Lq, d), k.reshape(B, Lk, d),
                        v.reshape(B, Lk, d), scale,
                    ).reshape(B, Lq, C)
                else:
                    # head-major transposes happen on POOLED tensors only
                    # (4-64x smaller than the pre-pool activations)
                    out = fa_fn(
                        q4.transpose(0, 2, 1, 3).reshape(B * h, Lq, d),
                        k4.transpose(0, 2, 1, 3).reshape(B * h, Lk, d),
                        v4.transpose(0, 2, 1, 3).reshape(B * h, Lk, d),
                        scale,
                    ).reshape(B, h, Lq, d).transpose(0, 2, 1, 3)
                    out = out.reshape(B, Lq, C)
            else:
                attn = jnp.einsum(
                    "bqhd,bkhd->bhqk", q4, k4,
                    preferred_element_type=jnp.float32,
                ) * scale
                attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
                out = jnp.einsum(
                    "bhqk,bkhd->bqhd", attn, v4,
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
                out = out.reshape(B, Lq, C)
            if self.q_pool_residual:
                out = out + q

        out = nn.Dense(
            C,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(out)
        if self.drop_rate > 0.0:
            out = nn.Dropout(self.drop_rate, deterministic=deterministic)(out)
        return out, out_thw


class MultiScaleBlock(nn.Module):
    """Transformer block with pooled attention (reference: attention.py:287-446)."""

    spec: BlockSpec
    mode: str
    qkv_bias: bool
    has_cls: bool
    q_pool_residual: bool
    channel_expand_front: bool
    mlp_ratio: float
    drop_rate: float = 0.0
    moe_spec: MoESpec = MoESpec()  # read only when spec.moe
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, thw: Triple, deterministic: bool = True
    ) -> tuple[jax.Array, Triple]:
        s = self.spec
        expand_channel = self.channel_expand_front and s.dim != s.dim_out
        # with front expansion the attention output (and the rest of the
        # block) runs at dim_out; otherwise attention stays at dim and the
        # MLP performs the channel change.
        dim_att = s.dim_out if expand_channel else s.dim

        # norm1/norm2 params declared here (reference paths), applied
        # inside the fused Pallas kernels (or the _ln_math fallback)
        n1_scale, n1_bias = _LNParams(
            param_dtype=self.param_dtype, name="norm1")(s.dim)
        n2_scale, n2_bias = _LNParams(
            param_dtype=self.param_dtype, name="norm2")(dim_att)

        x_block, thw_new = MultiScaleAttention(
            dim=s.dim,
            dim_out=dim_att,
            num_heads=s.num_heads,
            kernel_q=s.kernel_q,
            kernel_kv=s.kernel_kv,
            stride_q=s.stride_q,
            stride_kv=s.stride_kv,
            mode=self.mode,
            qkv_bias=self.qkv_bias,
            has_cls=self.has_cls,
            q_pool_residual=self.q_pool_residual,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )(x, thw, ln_scale=n1_scale, ln_bias=n1_bias, ln_eps=1e-6,
          deterministic=deterministic)

        if expand_channel:
            x = nn.Dense(
                s.dim_out,
                kernel_init=trunc_normal_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj_max_pool",
            )(x)

        # skip-path pooling: maxpool with kernel s+1 where stride>1
        kernel_skip = tuple(v + 1 if v > 1 else v for v in s.stride_q)
        if len(kernel_skip) > 0 and np.prod(kernel_skip) > 1:
            x_res, _ = attention_pool(
                x, thw, mode="max", kernel=kernel_skip, stride=s.stride_q,
                has_cls=self.has_cls,
            )
        else:
            x_res = x

        dp = DropPath(s.drop_path)
        x = x_res + dp(x_block, deterministic=deterministic)

        if s.moe:
            # MoE expert bank replaces the dense MLP (models/moe.py);
            # build_mvit_spec guarantees dim_att == s.dim_out here, so the
            # normed-residual projection branch below never triggers
            x_mlp, x_norm = MoEMlp(
                num_experts=self.moe_spec.num_experts,
                top_k=self.moe_spec.top_k,
                capacity_factor=self.moe_spec.capacity_factor,
                hidden_features=int(dim_att * self.mlp_ratio),
                out_features=s.dim_out,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="mlp",
            )(x, n2_scale, n2_bias, deterministic=deterministic)
        else:
            x_mlp, x_norm = FusedMlp(
                hidden_features=int(dim_att * self.mlp_ratio),
                out_features=s.dim_out,
                drop_rate=self.drop_rate,
                need_normed=dim_att != s.dim_out,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="mlp",
            )(x, n2_scale, n2_bias, deterministic=deterministic)

        if dim_att != s.dim_out:
            # (non-expand-front) channel change in the MLP: residual comes
            # from the *normed* input through a linear projection
            x = nn.Dense(
                s.dim_out,
                kernel_init=trunc_normal_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj",
            )(x_norm)

        x = x + dp(x_mlp, deterministic=deterministic)
        return x, thw_new


def _patch_embed_s2d(x, kernel, bias, k, s, p):
    """Space-to-depth patch embedding.

    The stem conv has C_in=3 — hopeless for the 128-lane MXU (profiled at
    2.3 TFLOP/s). Re-expressed: pad, fold (st, sh, sw) blocks into the
    channel dim, and convolve with a block-space kernel whose channel count
    is MXU-friendly (96 for the 16x4 recipe). The block kernel is a zero-
    padded rearrangement of the original weights, so the arithmetic is
    IDENTICAL (covered by the full-model parity tests).

    Requires kernel <= 2*stride per axis (true for (3,7,7)/(2,4,4)).
    """
    B, T, H, W, C = x.shape
    kt, kh, kw = k
    st, sh, sw = s
    pt, ph, pw = p

    # pad so every axis is block-divisible and all taps stay in range
    def pad_hi(size, pad_lo, stride):
        total = size + pad_lo
        rem = (-total) % stride
        return rem if rem >= pad_lo else rem + stride

    pt_hi = pad_hi(T, pt, st)
    ph_hi = pad_hi(H, ph, sh)
    pw_hi = pad_hi(W, pw, sw)
    xp = jnp.pad(x, ((0, 0), (pt, pt_hi), (ph, ph_hi), (pw, pw_hi), (0, 0)))
    Tp, Hp, Wp = xp.shape[1], xp.shape[2], xp.shape[3]
    Wb = Wp // sw
    # Build [B, Tb, Hb, Wb, st*sh*sw*C] (channel order (st, sh, sw, C))
    # WITHOUT the generic 8-D reshape+transpose, which XLA executes at
    # ~55 GB/s on this shape (~9 ms/iter at 448, vs ~1 ms for the conv it
    # feeds). The W-group is a free contiguous reinterpretation (W and C
    # are the two minormost dims); the H/T groups are concats of strided
    # slices — plain strided copies XLA runs near memcpy speed.
    xb = xp.reshape(B, Tp, Hp, Wb, sw * C)
    xb = jnp.concatenate([xb[:, :, b_::sh] for b_ in range(sh)], axis=-1)
    xb = jnp.concatenate([xb[:, a::st] for a in range(st)], axis=-1)

    # block kernel: 2 blocks per axis where the kernel overhangs the stride
    nbt = 2 if kt > st else 1
    nbh = 2 if kh > sh else 1
    nbw = 2 if kw > sw else 1
    C_out = kernel.shape[-1]
    bk = jnp.zeros((nbt, nbh, nbw, st, sh, sw, C, C_out), kernel.dtype)
    # scatter original taps into block coordinates
    for a in range(kt):
        for b_ in range(kh):
            for c_ in range(kw):
                bk = bk.at[a // st, b_ // sh, c_ // sw,
                           a % st, b_ % sh, c_ % sw].set(kernel[a, b_, c_])
    bk = bk.reshape(nbt, nbh, nbw, st * sh * sw * C, C_out)

    out = jax.lax.conv_general_dilated(
        xb, bk, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    # valid output counts from the original conv arithmetic
    To = (T + 2 * pt - kt) // st + 1
    Ho = (H + 2 * ph - kh) // sh + 1
    Wo = (W + 2 * pw - kw) // sw + 1
    out = out[:, :To, :Ho, :Wo]
    return out + bias


class PatchEmbed(nn.Module):
    """Conv3d patch stem (reference: stem_helper.py:308-338) with an
    MXU-friendly space-to-depth formulation when the kernel overhangs the
    stride by at most one block (:func:`_patch_embed_s2d`). Parameter layout
    matches nn.Conv (kernel DHWIO + bias) for checkpoint conversion."""

    features: int
    kernel_size: Triple
    strides: Triple
    padding: Triple
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)  # promote like nn.Conv does
        k, s, p = self.kernel_size, self.strides, self.padding
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*k, x.shape[-1], self.features), self.param_dtype,
        ).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype,
        ).astype(self.dtype)
        s2d_ok = all(kk <= 2 * ss for kk, ss in zip(k, s)) and all(
            pp < ss for pp, ss in zip(p, s)
        )
        if s2d_ok:
            return _patch_embed_s2d(x, kernel, bias, k, s, p)
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=s,
            padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + bias


class MViT(nn.Module):
    """MViT-v1/v2 backbone + classification head.

    Input: list of pathway tensors (``x[0]`` used) or a single tensor when
    ``spec.direct_input``; tensor layout ``[B, T, H, W, C]`` (channels last —
    TPU-native; the reference uses ``[B, C, T, H, W]``).
    """

    spec: MViTSpec
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bboxes=None, dataset_name=None, *,
                 train: bool = False, run_cross_proj: bool = False,
                 return_emb: bool = False):
        sp = self.spec
        deterministic = not train
        if not sp.direct_input and isinstance(x, (list, tuple)):
            x = x[0]

        B = x.shape[0]
        x = PatchEmbed(
            features=sp.embed_dim,
            kernel_size=sp.patch_kernel,
            strides=sp.patch_stride,
            padding=sp.patch_padding,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x)
        T, H, W = x.shape[1], x.shape[2], x.shape[3]
        x = x.reshape(B, T * H * W, sp.embed_dim)

        if sp.cls_embed:
            cls_token = self.param(
                "cls_token", nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                (1, 1, sp.embed_dim), self.param_dtype,
            )
            x = jnp.concatenate(
                [jnp.tile(cls_token.astype(self.dtype), (B, 1, 1)), x], axis=1
            )

        pt, ph, pw = sp.patch_dims
        if sp.sep_pos_embed:
            pos_sp = self.param(
                "pos_embed_spatial",
                nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                (1, ph * pw, sp.embed_dim), self.param_dtype,
            )
            pos_tmp = self.param(
                "pos_embed_temporal",
                nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                (1, pt, sp.embed_dim), self.param_dtype,
            )
            pos = jnp.tile(pos_sp, (1, pt, 1)) + jnp.repeat(
                pos_tmp, ph * pw, axis=1
            )
            if sp.cls_embed:
                pos_cls = self.param(
                    "pos_embed_class",
                    nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                    (1, 1, sp.embed_dim), self.param_dtype,
                )
                pos = jnp.concatenate([pos_cls, pos], axis=1)
        else:
            n_tok = pt * ph * pw + (1 if sp.cls_embed else 0)
            pos = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0),
                (1, n_tok, sp.embed_dim), self.param_dtype,
            )
        x = x + pos.astype(self.dtype)

        if sp.drop_rate > 0.0:
            x = nn.Dropout(sp.drop_rate, deterministic=deterministic)(x)

        thw = (T, H, W)
        block_cls = MultiScaleBlock
        if sp.act_checkpoint:
            # thw (arg 2) and deterministic (arg 3) are static; arg 0 is self
            block_cls = nn.remat(
                MultiScaleBlock, static_argnums=(2, 3), prevent_cse=False,
            )
        for i, bs in enumerate(sp.blocks):
            blk = block_cls(
                spec=bs,
                mode=sp.mode,
                qkv_bias=sp.qkv_bias,
                has_cls=sp.cls_embed,
                q_pool_residual=sp.q_pool_residual,
                channel_expand_front=sp.channel_expand_front,
                mlp_ratio=sp.mlp_ratio,
                drop_rate=sp.drop_rate,
                moe_spec=sp.moe,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )
            x, thw = blk(x, thw, deterministic)

        if not sp.no_norm_before_avg:
            x = FusedLayerNorm(
                epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
                name="norm",
            )(x)

        if sp.detection_enable and bboxes is not None:
            # ROI path (video_model_builder.py:1258-1271): tokens back to a
            # [B, T, H, W, C] volume, temporal pool + ROIAlign head
            from .roi_head import ResNetRoIHead

            T2, H2, W2 = thw
            feat_map = x.reshape(B, T2, H2, W2, x.shape[-1])
            return ResNetRoIHead(
                num_classes=sp.num_classes,
                pool_size=((T2, 1, 1),),
                resolution=(sp.roi_resolution,),
                scale_factor=(sp.roi_scale_factor,),
                dropout_rate=sp.head_dropout,
                act_func=sp.head_act,
                aligned=sp.roi_aligned,
                dtype=self.dtype,
                name="head",
            )([feat_map], bboxes, train=train)

        if sp.use_spatial_maxpool_before_proj:
            # ONNX-safe whole-frame path (video_model_builder.py:1273-1303):
            # mean over T, resize to the ROI resolution, max over space
            T2, H2, W2 = thw
            fm = x.reshape(B, T2, H2, W2, x.shape[-1]).mean(axis=1)
            if H2 != sp.roi_resolution:
                fm = jax.image.resize(
                    fm, (B, sp.roi_resolution, sp.roi_resolution,
                         fm.shape[-1]),
                    method="bilinear",
                )
            feat = fm.max(axis=(1, 2))
        elif sp.cls_embed:
            feat = x[:, 0]
        else:
            feat = x.mean(axis=1)

        if sp.contra_enable:
            return ContrastiveProjectionHead(
                dim_out=sp.contra_embed_dim,
                use_mlp=sp.contra_use_mlp,
                dropout_rate=sp.head_dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="head",
            )(feat, deterministic=deterministic)

        if sp.use_multi_head:
            from .heads import TransformerMultiHead

            out = TransformerMultiHead(
                datasets=sp.multi_datasets,
                num_classes=sp.multi_num_classes,
                act_funcs=sp.multi_head_act,
                dropout_rate=sp.head_dropout,
                use_mlp=sp.multi_use_mlp,
                add_cross_proj=sp.multi_add_cross_proj,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="head",
            )(feat, dataset_name, run_cross_proj=run_cross_proj, train=train)
            if return_emb:
                # (preds, pooled representation) for the VICReg regularizer
                # (reference: video_model_builder.py:1325-1331)
                return out, feat
            return out

        return TransformerBasicHead(
            num_classes=sp.num_classes,
            dropout_rate=sp.head_dropout,
            act_func=sp.head_act,
            use_act_in_train=sp.use_head_act_in_train,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="head",
        )(feat, train=train)
