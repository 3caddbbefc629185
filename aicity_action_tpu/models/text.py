"""CLIP text encoder (reference: slowfast/models/text_models.py).

Causal transformer over BPE token ids with EOT-token pooling
(``x[arange, text.argmax(-1)]`` — the EOT token has the highest id) and a
learned projection into the joint embedding space. QuickGELU matches CLIP.
Parameter layout mirrors torch ``nn.MultiheadAttention`` (fused in_proj +
out_proj) so CLIP-style checkpoints convert directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Mlp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CausalSelfAttention(nn.Module):
    """Multi-head self-attention with a causal mask; torch-MHA param layout."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, D = x.shape
        h = self.heads
        d = D // h
        in_proj_w = self.param(
            "in_proj_kernel",
            nn.initializers.normal(self.width ** -0.5),
            (D, 3 * D), self.param_dtype,
        )
        in_proj_b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * D,), self.param_dtype)
        qkv = x @ in_proj_w.astype(self.dtype) + in_proj_b.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, h, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        causal = jnp.tril(jnp.ones((L, L), bool))
        attn = jnp.where(causal[None, None], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(
            D, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(
                (self.width ** -0.5) * ((2 * 12) ** -0.5)),
            name="out_proj",
        )(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ln = lambda name: nn.LayerNorm(  # noqa: E731  (torch default eps)
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)
        x = x + CausalSelfAttention(
            width=self.width, heads=self.heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(ln("ln_1")(x))
        y = ln("ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="c_proj")(y)
        return x + y


class TextTransformer(nn.Module):
    """Token embedding + causal blocks + ln_final + EOT projection."""

    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    embed_dim: int = 512
    use_mlp: bool = False
    dropout_rate: float = 0.5
    act_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jax.Array, *, deterministic: bool = True):
        """``text``: int token ids ``[B, context_length]`` → ``[B, embed_dim]``."""
        tok = nn.Embed(
            self.vocab_size, self.width,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="token_embedding",
        )(text)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), self.param_dtype,
        )
        x = tok + pos.astype(self.dtype)

        block_cls = ResidualAttentionBlock
        if self.act_checkpoint:
            block_cls = nn.remat(ResidualAttentionBlock)
        for i in range(self.layers):
            x = block_cls(
                width=self.width, heads=self.heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"resblocks_{i}",
            )(x)

        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name="ln_final",
        )(x)

        # EOT pooling: the end-of-text token has the largest id
        eot = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]

        if self.use_mlp:
            return Mlp(
                hidden_features=2048, out_features=self.embed_dim,
                drop_rate=self.dropout_rate, dtype=self.dtype,
                param_dtype=self.param_dtype, name="text_projection",
            )(pooled, deterministic=deterministic)
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim), self.param_dtype,
        )
        return pooled @ proj.astype(self.dtype)
