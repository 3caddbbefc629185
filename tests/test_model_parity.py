"""Full-model logit parity: JAX MViT vs a torch oracle composed from the
reference's own MultiScaleBlock implementation.

The oracle composes: torch Conv3d patch embed (+flatten, reference
stem_helper.py:308-338), separable pos embeds (video_model_builder.py:
1196-1223), the reference MultiScaleBlock stack, final LayerNorm, mean-pool,
and the linear+softmax head (head_helper.py:369-417). Weights are generated
in torch, exported with reference names (``blocks.{i}...``), converted via
utils/convert.py, and logits compared in float32 — the same path a real
.pyth checkpoint takes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.mvit import MViT, build_mvit_spec
from aicity_action_tpu.utils.convert import (
    convert_mvit_state_dict,
    merge_with_model_params,
)

from ref_oracle import load_reference_attention

torch = pytest.importorskip("torch")


def tiny_cfg(cls_embed=False, sep_pos=True, expand_front=True, q_pool_all=True):
    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.MODEL.DROPOUT_RATE = 0.0
    m = cfg.MVIT
    m.EMBED_DIM = 16
    m.DEPTH = 4
    m.NUM_HEADS = 1
    m.PATCH_KERNEL = (3, 7, 7)
    m.PATCH_STRIDE = (2, 4, 4)
    m.PATCH_PADDING = (1, 3, 3)
    m.DIM_MUL = [[1, 2.0], [3, 2.0]]
    m.HEAD_MUL = [[1, 2.0], [3, 2.0]]
    m.POOL_KVQ_KERNEL = [3, 3, 3]
    m.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    m.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2]]
    m.DROPPATH_RATE = 0.0
    m.DROPOUT_RATE = 0.0
    m.CLS_EMBED_ON = cls_embed
    m.SEP_POS_EMBED = sep_pos
    m.CHANNEL_EXPAND_FRONT = expand_front
    m.Q_POOL_ALL = q_pool_all
    m.Q_POOL_RESIDUAL = True
    m.MODE = "conv"
    return cfg


class TorchOracleMViT(torch.nn.Module):
    """Reference-faithful MViT assembled from the reference's own blocks."""

    def __init__(self, cfg, spec):
        super().__init__()
        ref = load_reference_attention()
        m = cfg.MVIT
        self.cls_embed = m.CLS_EMBED_ON
        self.sep_pos = m.SEP_POS_EMBED
        embed_dim = m.EMBED_DIM
        self.patch_proj = torch.nn.Conv3d(
            3, embed_dim, tuple(m.PATCH_KERNEL), tuple(m.PATCH_STRIDE),
            tuple(m.PATCH_PADDING),
        )
        pt = cfg.DATA.NUM_FRAMES // m.PATCH_STRIDE[0]
        ps = cfg.DATA.TRAIN_CROP_SIZE // m.PATCH_STRIDE[1]
        self.patch_dims = (pt, ps, ps)
        if self.cls_embed:
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, embed_dim) * 0.02)
        if self.sep_pos:
            self.pos_embed_spatial = torch.nn.Parameter(
                torch.randn(1, ps * ps, embed_dim) * 0.02)
            self.pos_embed_temporal = torch.nn.Parameter(
                torch.randn(1, pt, embed_dim) * 0.02)
            if self.cls_embed:
                self.pos_embed_class = torch.nn.Parameter(
                    torch.randn(1, 1, embed_dim) * 0.02)
        else:
            n = pt * ps * ps + (1 if self.cls_embed else 0)
            self.pos_embed = torch.nn.Parameter(torch.randn(1, n, embed_dim) * 0.02)

        norm_layer = lambda d: torch.nn.LayerNorm(d, eps=1e-6)  # noqa: E731
        self.blocks = torch.nn.ModuleList([
            ref.MultiScaleBlock(
                dim=b.dim, dim_out=b.dim_out, num_heads=b.num_heads,
                mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path=0.0,
                norm_layer=norm_layer,
                kernel_q=b.kernel_q, kernel_kv=b.kernel_kv,
                stride_q=b.stride_q, stride_kv=b.stride_kv,
                mode="conv", has_cls_embed=self.cls_embed,
                use_query_residual_pool=True,
                channel_expand_front=cfg.MVIT.CHANNEL_EXPAND_FRONT,
            )
            for b in spec.blocks
        ])
        final_dim = spec.blocks[-1].dim_out
        self.norm = torch.nn.LayerNorm(final_dim, eps=1e-6)
        self.head_proj = torch.nn.Linear(final_dim, cfg.MODEL.NUM_CLASSES)

    def forward(self, x):
        # x: [B, C, T, H, W]
        x = self.patch_proj(x).flatten(2).transpose(1, 2)
        B = x.shape[0]
        if self.cls_embed:
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        pt, ph, pw = self.patch_dims
        if self.sep_pos:
            pos = self.pos_embed_spatial.repeat(1, pt, 1) + \
                torch.repeat_interleave(self.pos_embed_temporal, ph * pw, dim=1)
            if self.cls_embed:
                pos = torch.cat([self.pos_embed_class, pos], dim=1)
        else:
            pos = self.pos_embed
        x = x + pos
        thw = list(self.patch_dims)
        for blk in self.blocks:
            x, thw = blk(x, thw)
        x = self.norm(x)
        x = x[:, 0] if self.cls_embed else x.mean(1)
        return torch.softmax(self.head_proj(x), dim=1)

    def reference_state_dict(self):
        """Export with the reference checkpoint's key names."""
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch_proj.weight
        sd["patch_embed.proj.bias"] = self.patch_proj.bias
        if self.cls_embed:
            sd["cls_token"] = self.cls_token
        if self.sep_pos:
            sd["pos_embed_spatial"] = self.pos_embed_spatial
            sd["pos_embed_temporal"] = self.pos_embed_temporal
            if self.cls_embed:
                sd["pos_embed_class"] = self.pos_embed_class
        else:
            sd["pos_embed"] = self.pos_embed
        for i, blk in enumerate(self.blocks):
            for k, v in blk.state_dict().items():
                sd[f"blocks.{i}.{k}"] = v
        sd["norm.weight"] = self.norm.weight
        sd["norm.bias"] = self.norm.bias
        sd["head.projection.weight"] = self.head_proj.weight
        sd["head.projection.bias"] = self.head_proj.bias
        return {k: v.detach() for k, v in sd.items()}


@pytest.mark.parametrize("cls_embed,sep_pos,expand_front", [
    (False, True, True),    # aicity flagship configuration
    (True, True, True),     # cls token on
    (False, False, True),   # joint pos embed
    (False, True, False),   # v1-style channel expansion (MLP)
])
def test_full_model_logit_parity(cls_embed, sep_pos, expand_front):
    cfg = tiny_cfg(cls_embed=cls_embed, sep_pos=sep_pos,
                   expand_front=expand_front)
    spec = build_mvit_spec(cfg)

    torch.manual_seed(0)
    oracle = TorchOracleMViT(cfg, spec).eval()

    x = np.random.RandomState(0).randn(
        2, 3, cfg.DATA.NUM_FRAMES, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_logits = oracle(torch.from_numpy(x)).numpy()

    model = MViT(spec=spec)
    init_params = model.init(
        {"params": jax.random.PRNGKey(0)},
        [jnp.zeros((1, cfg.DATA.NUM_FRAMES, 32, 32, 3))],
    )["params"]

    converted, skipped = convert_mvit_state_dict(oracle.reference_state_dict())
    assert not skipped, f"unconverted keys: {skipped}"
    params, loaded, mismatched, missing = merge_with_model_params(
        converted, init_params)
    assert not mismatched, mismatched
    assert not missing, f"model params not covered by checkpoint: {missing}"

    # channels-last input
    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    out = model.apply({"params": params}, [x_j])
    np.testing.assert_allclose(np.asarray(out), ref_logits, atol=2e-5, rtol=1e-4)


def test_flagship_schedule_dims():
    """The 16x4 flagship schedule must produce the published dims/heads."""
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
    spec = build_mvit_spec(cfg)
    dims = [(b.dim, b.dim_out, b.num_heads) for b in spec.blocks]
    assert dims[0] == (96, 96, 1)
    assert dims[1] == (96, 192, 2)
    assert dims[3] == (192, 384, 4)
    assert dims[14] == (384, 768, 8)
    assert dims[15] == (768, 768, 8)
    # kv stride decays (1,8,8) -> (1,1,1) as q pools
    assert spec.blocks[0].stride_kv == (1, 8, 8)
    assert spec.blocks[2].stride_kv == (1, 4, 4)
    assert spec.blocks[14].stride_kv == (1, 1, 1)
    # q_pool_all: every block has a conv q-pool
    assert all(b.kernel_q == (3, 3, 3) for b in spec.blocks)
