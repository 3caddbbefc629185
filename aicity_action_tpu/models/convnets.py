"""3-D conv video backbones: ResNet (C2D/I3D/Slow), SlowFast, X3D.

TPU-native re-design of `/root/reference/slowfast/models/video_model_builder.py`
(SlowFast 108-439, ResNet 440-647, X3D 648-793), `resnet_helper.py`,
`stem_helper.py`, `nonlocal_helper.py`, and `operators.py`:

- layout is channels-last NDHWC throughout (lane-dim = channels)
- BatchNorm: under jit with the batch sharded over the mesh's data axis, the
  batch-statistics reductions are *global* — the reference's
  ``NaiveSyncBatchNorm3d`` (hand-rolled NCCL all-gather autograd,
  batchnorm_helper.py:112-171) is simply the default here. SubBatchNorm
  (independent stats per batch split) is provided for parity.
- drop-connect / stochastic depth uses explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pooling import pool3d
from .common import DropPath, round_width

# number of residual blocks per stage (video_model_builder.py:34)
MODEL_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# per-arch temporal kernel basis for [stem, res2..res5]
# (video_model_builder.py:37-94)
TEMPORAL_KERNEL_BASIS = {
    "2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d_nopool": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "i3d_nopool": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
    "x3d": [[[5]], [[3]], [[3]], [[3]], [[3]]],
}

# post-stem pooling per arch (video_model_builder.py:96-107)
POOL1 = {
    "2d": [[1, 1, 1]],
    "c2d": [[2, 1, 1]],
    "c2d_nopool": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "i3d_nopool": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
    "x3d": [[1, 1, 1]],
}


def _t3(x):
    return tuple(int(v) for v in x)


class BatchNorm(nn.Module):
    """BN over (B, T, H, W); global-batch stats under sharded jit.

    torch momentum 0.1 == flax momentum 0.9 (ema keep-rate).
    ``final_gamma_zero`` supports ZERO_INIT_FINAL_BN.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    final_gamma_zero: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale_init = (
            nn.initializers.zeros if self.final_gamma_zero
            else nn.initializers.ones
        )
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            scale_init=scale_init,
            name="bn",
        )(x)


class SubBatchNorm(nn.Module):
    """BN with independent stats per batch split (reference:
    batchnorm_helper.py SubBatchNorm3d). Affine params are shared; running
    stats aggregate across splits at eval (aggregate_stats semantics are
    folded in by averaging at use time)."""

    num_splits: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    final_gamma_zero: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.final_gamma_zero
            else nn.initializers.ones,
            (C,),
        )
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.num_splits, C)))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.num_splits, C)))

        if train:
            B = x.shape[0]
            s = self.num_splits
            assert B % s == 0, (B, s)
            xs = x.reshape(s, B // s, *x.shape[1:])
            axes = tuple(range(1, xs.ndim - 1))
            mean = xs.mean(axis=axes)  # [s, C]
            var = xs.var(axis=axes)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
            shape = (s, 1) + (1,) * (xs.ndim - 3) + (C,)
            xn = (xs - mean.reshape(shape)) * jax.lax.rsqrt(
                var.reshape(shape) + self.epsilon
            )
            xn = xn.reshape(x.shape)
        else:
            # aggregated stats (reference aggregate_sub_bn_stats)
            mean = ra_mean.value.mean(axis=0)
            var = (
                ra_var.value
                + (ra_mean.value - mean[None]) ** 2
            ).mean(axis=0)
            xn = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return xn * scale + bias


def make_norm(cfg, final_gamma_zero: bool = False, dtype=jnp.float32):
    """Norm factory (reference batchnorm_helper.get_norm). ``sync_batchnorm``
    maps to plain BatchNorm — global stats come from the sharded jit."""
    kind = cfg.BN.NORM_TYPE
    if kind in ("batchnorm", "sync_batchnorm", "sync_batchnorm_apex"):
        return lambda name=None: BatchNorm(
            final_gamma_zero=final_gamma_zero, dtype=dtype, name=name)
    if kind == "sub_batchnorm":
        return lambda name=None: SubBatchNorm(
            num_splits=cfg.BN.NUM_SPLITS,
            final_gamma_zero=final_gamma_zero, dtype=dtype, name=name)
    raise NotImplementedError(f"Norm type {kind} is not supported")


def conv3d(features, kernel, stride, padding, *, groups=1, bias=False,
           dilation=(1, 1, 1), dtype=jnp.float32, name=None):
    k, s, p, d = _t3(kernel), _t3(stride), _t3(padding), _t3(dilation)
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=s,
        padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
        feature_group_count=groups,
        use_bias=bias,
        kernel_dilation=d,
        dtype=dtype,
        name=name,
    )


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(x)


class SE(nn.Module):
    """Squeeze-excitation (reference: operators.py SE)."""

    ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        dim_fc = round_width(C, self.ratio, min_width=8, divisor=8)
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = conv3d(dim_fc, (1, 1, 1), (1, 1, 1), (0, 0, 0), bias=True,
                   dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = conv3d(C, (1, 1, 1), (1, 1, 1), (0, 0, 0), bias=True,
                   dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


# ------------------------------------------------------------------ stems
class ResNetBasicStem(nn.Module):
    """conv(k=[t,7,7], s=[1,2,2]) → BN → ReLU → maxpool [1,3,3]/[1,2,2]."""

    dim_out: int
    kernel: tuple
    stride: tuple
    padding: tuple
    norm: callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_out, self.kernel, self.stride, self.padding,
                   dtype=self.dtype, name="conv")(x)
        x = self.norm(name="norm")(x, train=train)
        x = jax.nn.relu(x)
        return pool3d(x, "max", (1, 3, 3), (1, 2, 2), (0, 1, 1))


class X3DStem(nn.Module):
    """spatial 1xkxk conv → depthwise temporal kx1x1 conv → BN → ReLU."""

    dim_out: int
    kernel: tuple
    stride: tuple
    padding: tuple
    norm: callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = self.kernel, self.stride, self.padding
        x = conv3d(self.dim_out, (1, k[1], k[2]), (1, s[1], s[2]),
                   (0, p[1], p[2]), dtype=self.dtype, name="conv_xy")(x)
        x = conv3d(self.dim_out, (k[0], 1, 1), (s[0], 1, 1), (p[0], 0, 0),
                   groups=self.dim_out, dtype=self.dtype, name="conv")(x)
        x = self.norm(name="norm")(x, train=train)
        return jax.nn.relu(x)


# ------------------------------------------------------------- transforms
class BasicTransform(nn.Module):
    """Tx3x3 → BN → ReLU → 1x3x3 → BN(final) (resnet_helper.py BasicTransform)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    norm: callable
    final_norm: callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = self.temp_kernel_size
        x = conv3d(self.dim_out, (t, 3, 3), (1, self.stride, self.stride),
                   (t // 2, 1, 1), dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn")(x, train=train)
        x = jax.nn.relu(x)
        x = conv3d(self.dim_out, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                   dtype=self.dtype, name="b")(x)
        return self.final_norm(name="b_bn")(x, train=train)


class BottleneckTransform(nn.Module):
    """Tx1x1 → 1x3x3(groups) → 1x1x1, BN/ReLU between, final BN zero-init."""

    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    num_groups: int
    norm: callable
    final_norm: callable
    stride_1x1: bool = False
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1, str3 = ((self.stride, 1) if self.stride_1x1
                      else (1, self.stride))
        t = self.temp_kernel_size
        x = conv3d(self.dim_inner, (t, 1, 1), (1, str1, str1),
                   (t // 2, 0, 0), dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn")(x, train=train)
        x = jax.nn.relu(x)
        x = conv3d(self.dim_inner, (1, 3, 3), (1, str3, str3),
                   (0, self.dilation, self.dilation),
                   groups=self.num_groups,
                   dilation=(1, self.dilation, self.dilation),
                   dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn")(x, train=train)
        x = jax.nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   dtype=self.dtype, name="c")(x)
        return self.final_norm(name="c_bn")(x, train=train)


class X3DTransform(nn.Module):
    """1x1x1 → Tx3x3 channelwise (+SE every other block, Swish) → 1x1x1."""

    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    num_groups: int
    norm: callable
    final_norm: callable
    stride_1x1: bool = False
    dilation: int = 1
    se_ratio: float = 0.0625
    swish_inner: bool = True
    block_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1, str3 = ((self.stride, 1) if self.stride_1x1
                      else (1, self.stride))
        t = self.temp_kernel_size
        x = conv3d(self.dim_inner, (1, 1, 1), (1, str1, str1), (0, 0, 0),
                   dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn")(x, train=train)
        x = jax.nn.relu(x)
        x = conv3d(self.dim_inner, (t, 3, 3), (1, str3, str3),
                   (t // 2, self.dilation, self.dilation),
                   groups=self.num_groups,
                   dilation=(1, self.dilation, self.dilation),
                   dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn")(x, train=train)
        if self.se_ratio > 0.0 and (self.block_idx + 1) % 2:
            x = SE(self.se_ratio, dtype=self.dtype, name="se")(x)
        x = Swish()(x) if self.swish_inner else jax.nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   dtype=self.dtype, name="c")(x)
        return self.final_norm(name="c_bn")(x, train=train)


_TRANS = {
    "bottleneck_transform": BottleneckTransform,
    "basic_transform": BasicTransform,
    "x3d_transform": X3DTransform,
}


class Nonlocal(nn.Module):
    """Non-local block (reference: nonlocal_helper.py)."""

    dim_inner: int
    instantiation: str = "softmax"
    pool_size: Optional[tuple] = None
    norm: callable = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, H, W, C = x.shape
        theta = conv3d(self.dim_inner, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                       bias=True, dtype=self.dtype, name="conv_theta")(x)
        xp = x
        if self.pool_size is not None and any(s > 1 for s in self.pool_size):
            xp = pool3d(x, "max", self.pool_size, self.pool_size, (0, 0, 0))
        phi = conv3d(self.dim_inner, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                     bias=True, dtype=self.dtype, name="conv_phi")(xp)
        g = conv3d(self.dim_inner, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   bias=True, dtype=self.dtype, name="conv_g")(xp)

        theta = theta.reshape(B, -1, self.dim_inner)
        phi = phi.reshape(B, -1, self.dim_inner)
        g = g.reshape(B, -1, self.dim_inner)
        attn = jnp.einsum("bqc,bkc->bqk", theta, phi,
                          preferred_element_type=jnp.float32)
        if self.instantiation == "softmax":
            attn = jax.nn.softmax(attn * self.dim_inner ** -0.5, axis=-1)
        elif self.instantiation == "dot_product":
            attn = attn / attn.shape[-1]
        else:
            raise NotImplementedError(self.instantiation)
        out = jnp.einsum("bqk,bkc->bqc", attn.astype(self.dtype), g)
        out = out.reshape(B, T, H, W, self.dim_inner)
        out = conv3d(C, (1, 1, 1), (1, 1, 1), (0, 0, 0), bias=True,
                     dtype=self.dtype, name="conv_out")(out)
        out = self.norm(name="bn")(out, train=train)
        return x + out


class ResBlock(nn.Module):
    """Residual block with optional 1x1 shortcut (resnet_helper.py ResBlock)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    num_groups: int
    norm: callable
    final_norm: callable
    stride_1x1: bool = False
    dilation: int = 1
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        trans_cls = _TRANS[self.trans_func_name]
        kwargs = dict(
            dim_out=self.dim_out,
            dim_inner=self.dim_inner,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            num_groups=self.num_groups,
            norm=self.norm,
            final_norm=self.final_norm,
            stride_1x1=self.stride_1x1,
            dilation=self.dilation,
            dtype=self.dtype,
        )
        if self.trans_func_name == "basic_transform":
            kwargs = {k: v for k, v in kwargs.items()
                      if k not in ("dim_inner", "num_groups", "stride_1x1",
                                   "dilation")}
        if self.trans_func_name == "x3d_transform":
            kwargs["block_idx"] = self.block_idx

        f_x = trans_cls(name="branch2", **kwargs)(x, train=train)
        if self.drop_connect_rate > 0.0:
            f_x = DropPath(self.drop_connect_rate)(
                f_x, deterministic=not train)
        if self.dim_in != self.dim_out or self.stride != 1:
            sc = conv3d(self.dim_out, (1, 1, 1),
                        (1, self.stride, self.stride), (0, 0, 0),
                        dtype=self.dtype, name="branch1")(x)
            sc = self.norm(name="branch1_bn")(sc, train=train)
            x = sc + f_x
        else:
            x = x + f_x
        return jax.nn.relu(x)


class ResStage(nn.Module):
    """One multi-pathway residual stage (resnet_helper.py ResStage)."""

    dim_in: tuple
    dim_out: tuple
    dim_inner: tuple
    temp_kernel_sizes: tuple  # per pathway, cycled over blocks
    stride: tuple
    num_blocks: tuple
    num_groups: tuple
    num_block_temp_kernel: tuple
    nonlocal_inds: tuple
    nonlocal_group: tuple
    nonlocal_pool: tuple
    instantiation: str
    trans_func_name: str
    norm: callable
    final_norm: callable
    stride_1x1: bool = False
    dilation: tuple = (1,)
    drop_connect_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for p in range(len(self.num_blocks)):
            tks = (
                list(self.temp_kernel_sizes[p]) * self.num_blocks[p]
            )[: self.num_block_temp_kernel[p]] + [1] * (
                self.num_blocks[p] - self.num_block_temp_kernel[p]
            )
            x = inputs[p]
            for i in range(self.num_blocks[p]):
                x = ResBlock(
                    dim_in=self.dim_in[p] if i == 0 else self.dim_out[p],
                    dim_out=self.dim_out[p],
                    dim_inner=self.dim_inner[p],
                    temp_kernel_size=tks[i],
                    stride=self.stride[p] if i == 0 else 1,
                    trans_func_name=self.trans_func_name,
                    num_groups=self.num_groups[p],
                    norm=self.norm,
                    final_norm=self.final_norm,
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[p],
                    block_idx=i,
                    drop_connect_rate=self.drop_connect_rate,
                    dtype=self.dtype,
                    name=f"pathway{p}_res{i}",
                )(x, train=train)
                if i in self.nonlocal_inds[p]:
                    x = Nonlocal(
                        dim_inner=self.dim_out[p] // 2,
                        instantiation=self.instantiation,
                        pool_size=_t3(self.nonlocal_pool[p]),
                        norm=self.norm,
                        dtype=self.dtype,
                        name=f"pathway{p}_nonlocal{i}",
                    )(x, train=train)
            outs.append(x)
        return outs
