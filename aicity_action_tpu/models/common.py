"""Shared model building blocks (reference: slowfast/models/common.py)."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def exact_gelu(x: jax.Array) -> jax.Array:
    """erf-based GELU — matches torch.nn.GELU() default (not tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in));
# but the reference re-initializes all Linears with trunc_normal(std=0.02)
# and zero bias (video_model_builder.py:_init_weights). Use that.
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class Mlp(nn.Module):
    """Two-layer MLP with GELU (reference: common.py Mlp)."""

    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(
            self.hidden_features,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc1",
        )(x)
        x = exact_gelu(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.Dense(
            self.out_features,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc2",
        )(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


def drop_path(
    x: jax.Array,
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jax.Array:
    """Stochastic depth per sample (reference: common.py drop_path).

    Keeps the residual branch with probability ``1-rate`` and rescales by
    ``1/(1-rate)`` so the expectation is unchanged.
    """
    if deterministic or rate == 0.0:
        return x
    assert rng is not None
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class DropPath(nn.Module):
    """flax module wrapper around :func:`drop_path` using the 'droppath' rng."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("droppath")
        return drop_path(x, self.rate, rng, deterministic=False)


def round_width(width: float, multiplier: float, min_width: int = 1, divisor: int = 1) -> int:
    """Round channel width to a divisor multiple (reference: models/utils.py:round_width)."""
    if not multiplier:
        return int(width)
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


LayerNorm6 = lambda name=None, dtype=jnp.float32, param_dtype=jnp.float32: nn.LayerNorm(  # noqa: E731
    epsilon=1e-6, dtype=dtype, param_dtype=param_dtype, name=name
)


class FusedLayerNorm(nn.Module):
    """LayerNorm backed by the Pallas kernel on TPU (ops/pallas/layer_norm).

    Param names/shapes match ``nn.LayerNorm`` (``scale``/``bias`` of width
    ``C // groups``) so checkpoint conversion is unchanged. ``groups`` > 1
    normalizes per channel group with SHARED params — the reference's
    per-head ``nn.LayerNorm(head_dim)`` inside attention pooling
    (`attention.py:65,338`) applied without leaving the fused ``[B, L, h*d]``
    layout. Falls back to plain XLA math off-TPU (CPU tests) and for shapes
    the kernel does not tile.
    """

    epsilon: float = 1e-6
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas import flash_attention as _fa
        from ..ops.pallas.layer_norm import (
            fused_layer_norm,
            layer_norm_supported,
        )

        C = x.shape[-1]
        dg = C // self.groups
        scale = self.param("scale", nn.initializers.ones, (dg,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dg,),
                          self.param_dtype)
        x = x.astype(self.dtype)
        if (
            jax.default_backend() == "tpu"
            and not _fa.is_disabled()
            and layer_norm_supported(x.shape, self.groups)
        ):
            return fused_layer_norm(
                x, scale.astype(self.dtype), bias.astype(self.dtype),
                self.epsilon, self.groups,
            )
        # XLA fallback — identical math (f32 stats)
        xs = x.reshape(*x.shape[:-1], self.groups, dg).astype(jnp.float32)
        mu = xs.mean(axis=-1, keepdims=True)
        xc = xs - mu
        var = (xc * xc).mean(axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.reshape(x.shape).astype(self.dtype)
