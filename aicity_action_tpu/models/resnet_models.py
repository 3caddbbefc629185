"""Top-level conv video models: ResNet (C2D/I3D/Slow), SlowFast, X3D.

Reference: video_model_builder.py (SlowFast 108-439, ResNet 440-647,
X3D 648-793) and head_helper.py (ResNetBasicHead 139-228, X3DHead 229-368).
Inputs are lists of channels-last pathway tensors ``[B, T, H, W, C]``.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pooling import pool3d
from .common import round_width, trunc_normal_init
from .convnets import (
    MODEL_STAGE_DEPTH,
    POOL1,
    TEMPORAL_KERNEL_BASIS,
    ResNetBasicStem,
    ResStage,
    X3DStem,
    conv3d,
    make_norm,
)
from .heads import head_activation


class ResNetBasicHead(nn.Module):
    """AvgPool per pathway → concat → dropout → linear; eval applies the
    activation and means over THW (head_helper.py:139-228)."""

    num_classes: int
    pool_size: tuple  # per pathway; None = global avg pool
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array], *, train: bool = False):
        pooled = []
        for p, x in enumerate(inputs):
            ps = self.pool_size[p]
            if ps is None:
                x = x.mean(axis=(1, 2, 3), keepdims=True)
            else:
                x = pool3d(x, "avg", ps, (1, 1, 1), (0, 0, 0))
            pooled.append(x)
        x = jnp.concatenate(pooled, axis=-1)  # [B, t, h, w, sum(C)]
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="projection")(x)
        if not train:
            x = head_activation(
                x.reshape(-1, x.shape[-1]), self.act_func
            ).reshape(x.shape)
            x = x.mean(axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)


class X3DHead(nn.Module):
    """conv5 → BN → ReLU → avgpool → lin5 → ReLU → dropout → linear
    (head_helper.py:229-368)."""

    dim_inner: int
    dim_out: int
    num_classes: int
    pool_size: tuple | None
    norm: callable
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        x = inputs[0]
        x = conv3d(self.dim_inner, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   dtype=self.dtype, name="conv_5")(x)
        x = self.norm(name="conv_5_bn")(x, train=train)
        x = jax.nn.relu(x)
        if self.pool_size is None:
            x = x.mean(axis=(1, 2, 3), keepdims=True)
        else:
            x = pool3d(x, "avg", self.pool_size, (1, 1, 1), (0, 0, 0))
        x = conv3d(self.dim_out, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   dtype=self.dtype, name="lin_5")(x)
        if self.bn_lin5_on:
            x = self.norm(name="lin_5_bn")(x, train=train)
        x = jax.nn.relu(x)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="projection")(x)
        if not train:
            x = head_activation(
                x.reshape(-1, x.shape[-1]), self.act_func
            ).reshape(x.shape)
            x = x.mean(axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)


class FuseFastToSlow(nn.Module):
    """Fast→Slow lateral fusion (video_model_builder.py:108-166)."""

    dim_in_fast: int
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_s, x_f = x
        fuse = conv3d(
            self.dim_in_fast * self.fusion_conv_channel_ratio,
            (self.fusion_kernel, 1, 1), (self.alpha, 1, 1),
            (self.fusion_kernel // 2, 0, 0),
            dtype=self.dtype, name="conv_f2s",
        )(x_f)
        fuse = self.norm(name="bn")(fuse, train=train)
        fuse = jax.nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


def _stage_kwargs(cfg, idx, norm, final_norm, dtype):
    return dict(
        nonlocal_inds=tuple(tuple(i) for i in cfg.NONLOCAL.LOCATION[idx]),
        nonlocal_group=tuple(cfg.NONLOCAL.GROUP[idx]),
        nonlocal_pool=tuple(tuple(p) for p in cfg.NONLOCAL.POOL[idx]),
        instantiation=cfg.NONLOCAL.INSTANTIATION,
        trans_func_name=cfg.RESNET.TRANS_FUNC,
        stride_1x1=cfg.RESNET.STRIDE_1X1,
        dilation=tuple(cfg.RESNET.SPATIAL_DILATIONS[idx]),
        norm=norm,
        final_norm=final_norm,
        dtype=dtype,
    )


class ResNet(nn.Module):
    """Single-pathway 3-D ResNet (C2D / I3D / Slow)."""

    cfg_frozen: dict  # plain dict snapshot of the CfgNode
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bboxes=None, *, train: bool = False):
        from ..config.node import CfgNode

        cfg = CfgNode(self.cfg_frozen)
        pool_size = POOL1[cfg.MODEL.ARCH]
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        ng = cfg.RESNET.NUM_GROUPS
        wpg = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = ng * wpg
        tk = TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH]
        norm = make_norm(cfg, dtype=self.dtype)
        final_norm = make_norm(
            cfg, final_gamma_zero=cfg.RESNET.ZERO_INIT_FINAL_BN,
            dtype=self.dtype)

        y = ResNetBasicStem(
            dim_out=wpg, kernel=(tk[0][0][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][0][0] // 2, 3, 3), norm=norm, dtype=self.dtype,
            name="s1_pathway0_stem",
        )(x[0], train=train)

        dims = [wpg, wpg * 4, wpg * 8, wpg * 16, wpg * 32]
        inners = [dim_inner, dim_inner * 2, dim_inner * 4, dim_inner * 8]
        depths = [d2, d3, d4, d5]
        xs = [y]
        for si in range(4):
            xs = ResStage(
                dim_in=(dims[si],),
                dim_out=(dims[si + 1],),
                dim_inner=(inners[si],),
                temp_kernel_sizes=(tuple(tk[si + 1][0]),),
                stride=(cfg.RESNET.SPATIAL_STRIDES[si][0],),
                num_blocks=(depths[si],),
                num_groups=(ng,),
                num_block_temp_kernel=(cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si][0],),
                name=f"s{si + 2}",
                **_stage_kwargs(cfg, si, norm, final_norm, self.dtype),
            )(xs, train=train)
            if si == 0:
                xs = [pool3d(xs[0], "max", pool_size[0], pool_size[0],
                             (0, 0, 0))]

        if cfg.DETECTION.ENABLE:
            from .roi_head import ResNetRoIHead

            head = ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=((cfg.DATA.NUM_FRAMES // pool_size[0][0], 1, 1),),
                resolution=(cfg.DETECTION.ROI_XFORM_RESOLUTION,),
                scale_factor=(cfg.DETECTION.SPATIAL_SCALE_FACTOR,),
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                dtype=self.dtype,
                name="head",
            )
            return head(xs, bboxes, train=train)
        head = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=(
                (cfg.DATA.NUM_FRAMES // pool_size[0][0],
                 cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][1],
                 cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][2]),
            ),
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )
        return head(xs, train=train)


class SlowFast(nn.Module):
    """Two-pathway SlowFast network."""

    cfg_frozen: dict
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bboxes=None, *, train: bool = False):
        from ..config.node import CfgNode

        cfg = CfgNode(self.cfg_frozen)
        pool_size = POOL1["slowfast"]
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        ng = cfg.RESNET.NUM_GROUPS
        wpg = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = ng * wpg
        beta = cfg.SLOWFAST.BETA_INV
        fcr = cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
        out_dim_ratio = beta // fcr
        alpha = cfg.SLOWFAST.ALPHA
        fk = cfg.SLOWFAST.FUSION_KERNEL_SZ
        tk = TEMPORAL_KERNEL_BASIS["slowfast"]
        norm = make_norm(cfg, dtype=self.dtype)
        final_norm = make_norm(
            cfg, final_gamma_zero=cfg.RESNET.ZERO_INIT_FINAL_BN,
            dtype=self.dtype)

        slow = ResNetBasicStem(
            dim_out=wpg, kernel=(tk[0][0][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][0][0] // 2, 3, 3), norm=norm, dtype=self.dtype,
            name="s1_pathway0_stem",
        )(x[0], train=train)
        fast = ResNetBasicStem(
            dim_out=wpg // beta, kernel=(tk[0][1][0], 7, 7), stride=(1, 2, 2),
            padding=(tk[0][1][0] // 2, 3, 3), norm=norm, dtype=self.dtype,
            name="s1_pathway1_stem",
        )(x[1], train=train)
        xs = FuseFastToSlow(wpg // beta, fcr, fk, alpha, norm,
                            dtype=self.dtype, name="s1_fuse")(
            [slow, fast], train=train)

        stage_dims = [wpg, wpg * 4, wpg * 8, wpg * 16, wpg * 32]
        inners = [dim_inner, dim_inner * 2, dim_inner * 4, dim_inner * 8]
        depths = [d2, d3, d4, d5]
        for si in range(4):
            din_s = stage_dims[si] + stage_dims[si] // out_dim_ratio
            xs = ResStage(
                dim_in=(din_s, stage_dims[si] // beta),
                dim_out=(stage_dims[si + 1], stage_dims[si + 1] // beta),
                dim_inner=(inners[si], inners[si] // beta),
                temp_kernel_sizes=(tuple(tk[si + 1][0]), tuple(tk[si + 1][1])),
                stride=(cfg.RESNET.SPATIAL_STRIDES[si][0],) * 2,
                num_blocks=(depths[si],) * 2,
                num_groups=(ng,) * 2,
                num_block_temp_kernel=tuple(
                    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si]) * (
                        2 if len(cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[si]) == 1
                        else 1),
                name=f"s{si + 2}",
                **{**_stage_kwargs(cfg, si, norm, final_norm, self.dtype),
                   "nonlocal_inds": tuple(
                       tuple(i) for i in cfg.NONLOCAL.LOCATION[si]) * (
                           2 if len(cfg.NONLOCAL.LOCATION[si]) == 1 else 1),
                   "nonlocal_group": tuple(cfg.NONLOCAL.GROUP[si]) * (
                       2 if len(cfg.NONLOCAL.GROUP[si]) == 1 else 1),
                   "nonlocal_pool": tuple(
                       tuple(p) for p in cfg.NONLOCAL.POOL[si]),
                   "dilation": (cfg.RESNET.SPATIAL_DILATIONS[si][0],) * 2},
            )(xs, train=train)
            if si == 0:
                xs = [
                    pool3d(xs[p], "max", pool_size[p], pool_size[p], (0, 0, 0))
                    for p in range(2)
                ]
            if si < 3:
                xs = FuseFastToSlow(
                    stage_dims[si + 1] // beta, fcr, fk, alpha, norm,
                    dtype=self.dtype, name=f"s{si + 2}_fuse",
                )(xs, train=train)

        if cfg.DETECTION.ENABLE:
            from .roi_head import ResNetRoIHead

            head = ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=(
                    (cfg.DATA.NUM_FRAMES // alpha // pool_size[0][0], 1, 1),
                    (cfg.DATA.NUM_FRAMES // pool_size[1][0], 1, 1),
                ),
                resolution=(cfg.DETECTION.ROI_XFORM_RESOLUTION,) * 2,
                scale_factor=(cfg.DETECTION.SPATIAL_SCALE_FACTOR,) * 2,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                dtype=self.dtype,
                name="head",
            )
            return head(xs, bboxes, train=train)
        head = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=(
                (cfg.DATA.NUM_FRAMES // alpha // pool_size[0][0],
                 cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][1],
                 cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][2]),
                (cfg.DATA.NUM_FRAMES // pool_size[1][0],
                 cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[1][1],
                 cfg.DATA.TRAIN_CROP_SIZE // 32 // pool_size[1][2]),
            ),
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            dtype=self.dtype,
            name="head",
        )
        return head(xs, train=train)


class X3D(nn.Module):
    """X3D with width/depth expansion."""

    cfg_frozen: dict
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from ..config.node import CfgNode

        cfg = CfgNode(self.cfg_frozen)
        norm = make_norm(cfg, dtype=self.dtype)
        final_norm = make_norm(
            cfg, final_gamma_zero=cfg.RESNET.ZERO_INIT_FINAL_BN,
            dtype=self.dtype)
        tk = TEMPORAL_KERNEL_BASIS["x3d"]
        w_mul, d_mul = cfg.X3D.WIDTH_FACTOR, cfg.X3D.DEPTH_FACTOR

        dim_c1 = cfg.X3D.DIM_C1
        exp = 2.0
        dim_res2 = (round_width(dim_c1, exp, divisor=8)
                    if cfg.X3D.SCALE_RES2 else dim_c1)
        dim_res3 = round_width(dim_res2, exp, divisor=8)
        dim_res4 = round_width(dim_res3, exp, divisor=8)
        dim_res5 = round_width(dim_res4, exp, divisor=8)
        block_basis = [
            (1, dim_res2, 2), (2, dim_res3, 2),
            (5, dim_res4, 2), (3, dim_res5, 2),
        ]
        dim_res1 = round_width(dim_c1, w_mul)

        y = X3DStem(
            dim_out=dim_res1, kernel=(tk[0][0][0], 3, 3), stride=(1, 2, 2),
            padding=(tk[0][0][0] // 2, 1, 1), norm=norm, dtype=self.dtype,
            name="s1_pathway0_stem",
        )(x[0], train=train)

        xs = [y]
        dim_in = dim_res1
        dim_out = dim_in
        dim_inner = dim_in
        for stage, (rep, w, s) in enumerate(block_basis):
            dim_out = round_width(w, w_mul)
            dim_inner = int(cfg.X3D.BOTTLENECK_FACTOR * dim_out)
            n_rep = int(math.ceil(d_mul * rep)) if d_mul else rep
            xs = ResStage(
                dim_in=(dim_in,),
                dim_out=(dim_out,),
                dim_inner=(dim_inner,),
                temp_kernel_sizes=(tuple(tk[1][0]),),
                stride=(s,),
                num_blocks=(n_rep,),
                num_groups=(dim_inner if cfg.X3D.CHANNELWISE_3x3x3 else
                            cfg.RESNET.NUM_GROUPS,),
                num_block_temp_kernel=(n_rep,),
                drop_connect_rate=cfg.MODEL.DROPCONNECT_RATE
                * (stage + 2) / (len(block_basis) + 1),
                name=f"s{stage + 2}",
                **_stage_kwargs(cfg, 0, norm, final_norm, self.dtype),
            )(xs, train=train)
            dim_in = dim_out

        spat_sz = int(math.ceil(cfg.DATA.TRAIN_CROP_SIZE / 32.0))
        head = X3DHead(
            dim_inner=dim_inner,
            dim_out=cfg.X3D.DIM_C5,
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=(cfg.DATA.NUM_FRAMES, spat_sz, spat_sz),
            norm=norm,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            bn_lin5_on=cfg.X3D.BN_LIN5,
            dtype=self.dtype,
            name="head",
        )
        return head(xs, train=train)
