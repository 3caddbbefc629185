"""ActionCLIP: dual video-text encoder for contrastive training.

Reference: video_model_builder.py:1341-1441. The video encoder is MViT with a
ContrastiveProjectionHead; the text encoder is the CLIP transformer. Returns
L2-normalized features and the exp'd learnable temperature.

MoCo momentum encoders: instead of deep-copied frozen submodules (the
reference's approach), the JAX-native design keeps ONE set of encoder
definitions and maintains the momentum weights as a second parameter pytree
EMA'd in the train step (engine/contrastive.py) — same math, no duplicate
module code, and the EMA update is one fused ``tree_map`` inside jit.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mvit import MViT, build_mvit_spec
from .text import TextTransformer


class ActionCLIP(nn.Module):
    video_spec: object  # MViTSpec with contra head enabled
    text_width: int
    text_layers: int
    text_heads: int
    context_length: int
    vocab_size: int
    embed_dim: int
    use_mlp: bool
    dropout_rate: float
    act_checkpoint: bool = False
    load_visual: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.load_visual:
            self.video_encoder = MViT(
                spec=self.video_spec, dtype=self.dtype,
                param_dtype=self.param_dtype)
        self.text_encoder = TextTransformer(
            width=self.text_width,
            layers=self.text_layers,
            heads=self.text_heads,
            context_length=self.context_length,
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            use_mlp=self.use_mlp,
            dropout_rate=self.dropout_rate,
            act_checkpoint=self.act_checkpoint,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        # learnable temperature, init ln(1/0.07) (reference line 1364)
        self.logit_scale = self.param(
            "logit_scale",
            lambda rng: jnp.asarray(math.log(1 / 0.07), self.param_dtype),
        )

    def __call__(self, frames, tokens, *, train: bool = False):
        v = self.encode_video(frames, train=train)
        t = self.encode_text(tokens, train=train)
        return v, t, jnp.exp(self.logit_scale)

    def encode_video(self, frames, *, train: bool = False):
        v = self.video_encoder(frames, train=train)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def encode_text(self, tokens, *, train: bool = False):
        t = self.text_encoder(tokens, deterministic=not train)
        return t / jnp.linalg.norm(t, axis=-1, keepdims=True)


def build_actionclip(cfg):
    from .build import compute_dtypes

    assert cfg.CONTRA.ENABLE, "set CONTRA.ENABLE for ActionCLIP"
    spec = build_mvit_spec(cfg)
    dtype, param_dtype = compute_dtypes(cfg)
    module = ActionCLIP(
        video_spec=spec,
        text_width=cfg.CONTRA.transformer_width,
        text_layers=cfg.CONTRA.transformer_layers,
        text_heads=cfg.CONTRA.transformer_heads,
        context_length=cfg.CONTRA.CONTEXT_LENGTH,
        vocab_size=cfg.CONTRA.vocab_size,
        embed_dim=cfg.CONTRA.embed_dim,
        use_mlp=cfg.CONTRA.use_MLP,
        dropout_rate=cfg.MODEL.DROPOUT_RATE,
        act_checkpoint=cfg.MODEL.ACT_CHECKPOINT,
        load_visual=cfg.MODEL.LOAD_VISUAL,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    frames = [jnp.zeros(
        (1, spec.num_frames, spec.crop_size, spec.crop_size,
         spec.in_channels), dtype)]
    tokens = jnp.zeros((1, cfg.CONTRA.CONTEXT_LENGTH), jnp.int32)
    return module, (frames, tokens)
