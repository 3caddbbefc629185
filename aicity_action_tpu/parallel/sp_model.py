"""Full-model sequence parallelism for MViT.

Generalizes ``parallel/sp.py``'s single-block demo into a capability: the
WHOLE flagship forward runs with one token-grid axis — H rows
(``shard_axis="h"``) or T frames (``shard_axis="t"``) — sharded over a mesh
axis: h > 1 heads, cls tokens, the real block schedule (q-pooling,
adaptive kv strides, channel expansion both front and back), and the
classification head. The axis choice matters: the flagship 448 config
H-shards only 2-way (H=112 vs the stage-1 kv stride 8) but T-shards up to
8-way through ALL 16 blocks (its temporal pooling strides are 1
everywhere, so T=8 stays intact and every shard keeps whole pooling
windows).

Decomposition per block (see parallel/sp.py's module docstring for why MViT
needs no ring attention):

- LN / qkv / MLP / projections: token-local.
- q/kv pooling + the skip max-pool: ``kh//2``-row halo exchanges
  (``sp.sp_pool_volume``).
- attention: local q rows against the ALL-GATHERED pooled K/V (tiny after
  the (1, s, s) kv strides); a cls token is computed redundantly on every
  shard (it needs global K/V anyway) and bypasses pooling, mirroring the
  dense ``attention_pool`` semantics (reference attention.py:12-83).

Blocks run sharded while the shard geometry stays aligned
(:func:`plan_sp_blocks`); the first block whose strides would split a
pooling window across shards triggers ONE all-gather, and the (tiny) tail
runs dense on every shard. At 448 with sp=2 that hand-off happens at block
14 — the 100k-token blocks where memory actually matters all run sharded.

The math mirrors ``models/mvit.py`` (same f32 LayerNorm stats, erf-GELU,
f32 attention accumulation); parity is enforced by
``tests/test_sp_full_model.py`` against ``MViT.apply`` on the same params.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .sp import sp_pool_volume


def _pooled(size: int, k: int, s: int) -> int:
    return (size + 2 * (k // 2) - k) // s + 1


def _axis_comp(shard_axis: str) -> int:
    """(T, H, W)-tuple component index of the sharded grid axis."""
    assert shard_axis in ("t", "h"), shard_axis
    return 0 if shard_axis == "t" else 1


def _strides_for(bs, comp: int):
    """(stride_q, stride_kv, kernel_q, kernel_kv, skip_kernel) of one
    BlockSpec along grid-axis component ``comp`` (0=T, 1=H), with inactive
    pooling normalized to 1."""

    def active(kernel, stride):
        return len(kernel) > 0 and not (
            np.prod(kernel) == 1 and np.prod(stride) == 1)

    sq = bs.stride_q[comp] if active(bs.kernel_q, bs.stride_q) else 1
    skv = bs.stride_kv[comp] if active(bs.kernel_kv, bs.stride_kv) else 1
    kq = bs.kernel_q[comp] if active(bs.kernel_q, bs.stride_q) else 1
    kkv = bs.kernel_kv[comp] if active(bs.kernel_kv, bs.stride_kv) else 1
    k_skip = sq + 1 if sq > 1 else 1
    return sq, skv, kq, kkv, k_skip


def plan_sp_blocks(spec, n_sp: int, shard_axis: str = "h") -> int:
    """Number of leading blocks that can run sharded over ``n_sp`` shards
    of the grid's ``shard_axis`` ("h" rows or "t" frames): every pooling
    op needs the local extent divisible by its stride (shard boundaries on
    window boundaries) and halos no larger than a neighbor shard.

    The flagship 448 config is H-shardable 2-way (H=112 trips the
    kv-stride-8 alignment at 4-way) but T-shardable up to 8-way through
    ALL blocks — its temporal pooling strides are 1 everywhere.
    """
    comp = _axis_comp(shard_axis)
    E = spec.patch_dims[comp]
    n = 0
    for bs in spec.blocks:
        if E % n_sp:
            break
        El = E // n_sp
        sq, skv, kq, kkv, k_skip = _strides_for(bs, comp)
        if any(k % 2 == 0 for k in (kq, kkv, k_skip)):
            break
        if El % sq or El % skv:
            break
        if max(kq, kkv, k_skip) // 2 > El:
            break
        n += 1
        E = El // sq * n_sp
    return n


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _group_ln(x, scale, bias, groups, eps=1e-5):
    """Per-head LayerNorm with shared [d]-wide params, in the fused
    [..., h*d] channel layout (models/common.FusedLayerNorm semantics)."""
    d = x.shape[-1] // groups
    xg = x.reshape(*x.shape[:-1], groups, d)
    out = _ln(xg, scale, bias, eps)
    return out.reshape(x.shape)


def _gelu(x):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + lax.erf(xf * (2.0 ** -0.5)))
    return y.astype(x.dtype)


def _dense(x, p, dtype):
    y = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype))
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _sp_block(xv, cls_tok, bp, bs, thw, *, mode, qkv_bias,
              q_pool_residual, channel_expand_front,
              axis_name, n_sp, dtype, shard_axis="h", droppath=None):
    """One MultiScaleBlock on a volume ``xv`` whose ``shard_axis`` ("h" →
    ``[B, T, H_local, W, C]``, "t" → ``[B, T_local, H, W, C]``) is
    mesh-sharded (+ replicated ``cls_tok [B, 1, C]`` or None).
    ``axis_name=None`` runs the identical math dense (n_sp must be 1).
    Returns (new_xv, new_cls, new_thw). Mirrors models/mvit.py
    MultiScaleBlock/MultiScaleAttention (reference attention.py:86-446).

    ``droppath``: optional PRE-SCALED stochastic-depth masks
    ``(sm_attn [B], sm_mlp [B])`` (each entry ``bernoulli(keep)/keep``,
    i.e. 0 or 1/keep — reference common.py drop_path). The caller owns
    the rng so pipeline stages can draw per-(block, global-sample) masks
    that are invariant to microbatching (parallel/pp.py).
    """
    comp = _axis_comp(shard_axis)
    g_ax = 1 + comp  # array axis of the sharded grid dim in [B,T,H,W,C]
    # unpacked extents are LOCAL (the sharded one is extent / n_sp)
    B, T, Hl, W, Cin = xv.shape
    expand = channel_expand_front and bs.dim != bs.dim_out
    dim_att = bs.dim_out if expand else bs.dim
    h = bs.num_heads
    d = dim_att // h
    scale = d ** -0.5
    ap = bp["attn"]

    def tok(v):  # volume -> tokens [B, L_local, C]
        return v.reshape(B, -1, v.shape[-1])

    def vol(t, thw_):  # tokens -> volume
        T_, H_, W_ = thw_
        return t.reshape(B, T_, H_, W_, t.shape[-1])

    # ---- norm1 + fused qkv (token-local)
    n1s, n1b = bp["norm1"]["scale"], bp["norm1"]["bias"]
    qkv_w = ap["qkv"]["kernel"].astype(dtype)
    qkv_b = ap["qkv"].get("bias")
    qkv_b = qkv_b.astype(dtype) if (qkv_bias and qkv_b is not None) else None

    def qkv_of(t):
        tn = _ln(t.astype(dtype), n1s, n1b, 1e-6)
        outs = []
        for i in range(3):
            o = jnp.dot(tn, qkv_w[:, i * dim_att:(i + 1) * dim_att])
            if qkv_b is not None:
                o = o + qkv_b[i * dim_att:(i + 1) * dim_att]
            outs.append(o)
        return outs

    q, k, v = (vol(t, (T, Hl, W)) for t in qkv_of(tok(xv)))
    if cls_tok is not None:
        cq, ck, cv = qkv_of(cls_tok)

    # ---- pooling (+ per-head group-LN in conv mode)
    def active(kernel, stride):
        return len(kernel) > 0 and not (
            np.prod(kernel) == 1 and np.prod(stride) == 1)

    def pool(t, name, kernel, stride):
        w = None
        if mode == "conv":
            w = jnp.tile(ap[f"pool_{name}"].astype(dtype), (1, 1, 1, 1, h))
        p = sp_pool_volume(t, axis_name, mode=mode, kernel=kernel,
                           stride=stride, conv_weights=w, shard_axis=g_ax)
        return p

    do_q = active(bs.kernel_q, bs.stride_q)
    do_kv = active(bs.kernel_kv, bs.stride_kv)
    thw_q = thw
    if do_q:
        q = pool(q, "q", bs.kernel_q, bs.stride_q)
        thw_q = (_pooled(thw[0], bs.kernel_q[0], bs.stride_q[0]),
                 _pooled(thw[1], bs.kernel_q[1], bs.stride_q[1]),
                 _pooled(thw[2], bs.kernel_q[2], bs.stride_q[2]))
    if do_kv:
        k = pool(k, "k", bs.kernel_kv, bs.stride_kv)
        v = pool(v, "v", bs.kernel_kv, bs.stride_kv)
    if mode == "conv":
        # pool -> re-attach cls -> LN (attention_pool order); the group-LN
        # is per-token so cls and grid normalize independently anyway
        if do_q:
            q = _group_ln(q, ap["norm_q"]["scale"], ap["norm_q"]["bias"], h)
            if cls_tok is not None:
                cq = _group_ln(cq, ap["norm_q"]["scale"],
                               ap["norm_q"]["bias"], h)
        if do_kv:
            k = _group_ln(k, ap["norm_k"]["scale"], ap["norm_k"]["bias"], h)
            v = _group_ln(v, ap["norm_v"]["scale"], ap["norm_v"]["bias"], h)
            if cls_tok is not None:
                ck = _group_ln(ck, ap["norm_k"]["scale"],
                               ap["norm_k"]["bias"], h)
                cv = _group_ln(cv, ap["norm_v"]["scale"],
                               ap["norm_v"]["bias"], h)

    # ---- attention: local q rows vs global pooled K/V
    if axis_name is not None:
        k_all = lax.all_gather(k, axis_name, axis=g_ax, tiled=True)
        v_all = lax.all_gather(v, axis_name, axis=g_ax, tiled=True)
    else:
        k_all, v_all = k, v
    qf = tok(q)
    kf = k_all.reshape(B, -1, dim_att)
    vf = v_all.reshape(B, -1, dim_att)
    if cls_tok is not None:
        qf = jnp.concatenate([cq, qf], axis=1)
        kf = jnp.concatenate([ck, kf], axis=1)
        vf = jnp.concatenate([cv, vf], axis=1)
    Lq, Lk = qf.shape[1], kf.shape[1]
    q4 = qf.reshape(B, Lq, h, d)
    k4 = kf.reshape(B, Lk, h, d)
    v4 = vf.reshape(B, Lk, h, d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v4,
                     preferred_element_type=jnp.float32).astype(dtype)
    out = out.reshape(B, Lq, dim_att)
    if q_pool_residual:
        out = out + qf
    out = _dense(out, ap["proj"], dtype)
    cls_att = out[:, :1] if cls_tok is not None else None
    grid_att = out[:, 1:] if cls_tok is not None else out

    # ---- skip path (+ channel expansion)
    x_skip = xv
    cls_skip = cls_tok
    if expand:
        x_skip = _dense(x_skip, bp["proj_max_pool"], dtype)
        if cls_skip is not None:
            cls_skip = _dense(cls_skip, bp["proj_max_pool"], dtype)
    kernel_skip = tuple(s + 1 if s > 1 else s for s in bs.stride_q)
    if len(kernel_skip) > 0 and np.prod(kernel_skip) > 1:
        x_skip = sp_pool_volume(x_skip, axis_name, mode="max",
                                kernel=kernel_skip, stride=bs.stride_q,
                                shard_axis=g_ax)
    sm_attn = sm_mlp = None
    if droppath is not None:
        sm_attn = droppath[0].astype(dtype)[:, None, None]
        sm_mlp = droppath[1].astype(dtype)[:, None, None]
        grid_att = grid_att * sm_attn
        if cls_att is not None:
            cls_att = cls_att * sm_attn
    x_res = tok(x_skip) + grid_att
    cls_res = (cls_skip + cls_att) if cls_tok is not None else None

    # ---- MLP (token-local) + residual (projected from the NORMED input
    # when the channel change happens in the MLP — non-expand-front)
    n2s, n2b = bp["norm2"]["scale"], bp["norm2"]["bias"]

    def mlp_of(t):
        tn = _ln(t.astype(dtype), n2s, n2b, 1e-6)
        hdn = _gelu(_dense(tn, bp["mlp"]["fc1"], dtype))
        return _dense(hdn, bp["mlp"]["fc2"], dtype), tn

    mlp_out, x_norm = mlp_of(x_res)
    if sm_mlp is not None:
        mlp_out = mlp_out * sm_mlp
    if dim_att != bs.dim_out:
        x_res = _dense(x_norm, bp["proj"], dtype)
        if cls_res is not None:
            c_mlp, c_norm = mlp_of(cls_res)
            if sm_mlp is not None:
                c_mlp = c_mlp * sm_mlp
            cls_res = _dense(c_norm, bp["proj"], dtype) + c_mlp
    elif cls_res is not None:
        c_mlp, _ = mlp_of(cls_res)
        if sm_mlp is not None:
            c_mlp = c_mlp * sm_mlp
        cls_res = cls_res + c_mlp
    x_out = x_res + mlp_out

    loc = tuple(e // n_sp if (axis_name is not None and i == comp) else e
                for i, e in enumerate(thw_q))
    return vol(x_out, loc), cls_res, thw_q


def dense_embed(params, spec, x, dtype=jnp.float32):
    """Patch embed + positional embeddings, dense (no sharding): input
    ``[B, T, S, S, 3]`` → ``(xv [B, T', H', W', C], cls_tok [B, 1, C] |
    None)``. Shared by the sequence-parallel forward (which slices the
    result per shard) and the pipeline-parallel stage-0 executor.
    Mirrors models/mvit.py PatchEmbed + pos-embed broadcast
    (reference stem_helper.py:308-338, video_model_builder.py:1196-1223)."""
    sp = spec
    B = x.shape[0]
    pe = params["patch_embed"]
    s, p = sp.patch_stride, sp.patch_padding
    xv = lax.conv_general_dilated(
        x.astype(dtype), pe["kernel"].astype(dtype), window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1]), (p[2], p[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + pe["bias"].astype(dtype)
    T, H, W = xv.shape[1], xv.shape[2], xv.shape[3]

    if sp.sep_pos_embed:
        pos = (params["pos_embed_spatial"].reshape(1, 1, H, W, sp.embed_dim)
               + params["pos_embed_temporal"].reshape(1, T, 1, 1,
                                                      sp.embed_dim))
    else:
        n_cls = 1 if sp.cls_embed else 0
        pos = params["pos_embed"][:, n_cls:].reshape(1, T, H, W,
                                                     sp.embed_dim)
    cls_tok = None
    if sp.cls_embed:
        cls_tok = jnp.tile(params["cls_token"].astype(dtype), (B, 1, 1))
        cls_pos = (params["pos_embed_class"] if sp.sep_pos_embed
                   else params["pos_embed"][:, :1])
        cls_tok = cls_tok + cls_pos.astype(dtype)
    return xv + pos.astype(dtype), cls_tok


def sp_forward(params, spec, x, *, axis_name: str | None,
               n_sp: int, dtype=jnp.float32, shard_axis: str = "h"):
    """Full MViT forward with the token grid's ``shard_axis`` ("h" rows or
    "t" frames) sharded over ``axis_name``.

    Runs INSIDE ``shard_map`` (or with ``axis_name=None`` as the dense
    pure-function reference). ``x``: the full (replicated) input
    ``[B, T, S, S, 3]``. Returns logits ``[B, num_classes]`` (replicated —
    every shard computes the identical head output).
    """
    comp = _axis_comp(shard_axis)
    g_ax = 1 + comp
    sp = spec
    B = x.shape[0]

    # patch embed: computed dense (it is ~3% of model FLOPs; replicating
    # it avoids a 3-row input halo), then each shard slices its H rows
    xv, cls_tok = dense_embed(params, spec, x, dtype)
    T, H, W = xv.shape[1], xv.shape[2], xv.shape[3]

    # plan_sp_blocks returns 0 when the sharded extent % n_sp != 0 (or no
    # block geometry is shard-aligned); in that case run fully dense —
    # never slice, or the i==n_shard gather would reconstruct the wrong
    # extent.
    n_shard = (plan_sp_blocks(sp, n_sp, shard_axis)
               if axis_name is not None else 0)
    if n_shard > 0:
        El = (T, H, W)[comp] // n_sp
        r = lax.axis_index(axis_name)
        xv = lax.dynamic_slice_in_dim(xv, r * El, El, axis=g_ax)

    thw = (T, H, W)
    blk_kw = dict(mode=sp.mode, qkv_bias=sp.qkv_bias,
                  q_pool_residual=sp.q_pool_residual,
                  channel_expand_front=sp.channel_expand_front,
                  dtype=dtype, shard_axis=shard_axis)
    for i, bs in enumerate(sp.blocks):
        if n_shard > 0 and i == n_shard:
            # geometry no longer shard-aligned: gather once, finish dense
            xv = lax.all_gather(xv, axis_name, axis=g_ax, tiled=True)
        sharded = axis_name is not None and i < n_shard
        xv, cls_tok, thw = _sp_block(
            xv, cls_tok, params[f"blocks_{i}"], bs, thw,
            axis_name=axis_name if sharded else None,
            n_sp=n_sp if sharded else 1, **blk_kw)

    tokens = xv.reshape(B, -1, xv.shape[-1])
    still_sharded = axis_name is not None and n_shard == len(sp.blocks)
    if sp.cls_embed:
        feat_pre = cls_tok[:, 0]
        if not sp.no_norm_before_avg:
            feat_pre = _ln(feat_pre, params["norm"]["scale"],
                           params["norm"]["bias"], 1e-6)
        feat = feat_pre
    else:
        if not sp.no_norm_before_avg:
            tokens = _ln(tokens, params["norm"]["scale"],
                         params["norm"]["bias"], 1e-6)
        if still_sharded:
            # global mean over the sharded token axis
            local_sum = tokens.sum(axis=1)
            total = lax.psum(local_sum, axis_name)
            n_tok = lax.psum(tokens.shape[1], axis_name)
            feat = total / n_tok
        else:
            feat = tokens.mean(axis=1)

    head = params["head"]
    logits = _dense(feat, head["projection"], dtype)
    return logits


def sp_apply(params, spec, x, mesh, *, axis_name: str = "sp",
             dtype=jnp.float32, shard_axis: str = "h"):
    """Run the sequence-parallel forward on a mesh: ``sp_apply(params,
    spec, x, mesh)`` == ``MViT(spec).apply({"params": params}, x)`` (eval
    mode, no head activation), with the big early blocks' activations
    sharded ``1/n_sp`` per device along the grid's ``shard_axis`` ("h"
    rows, or "t" frames — the flagship 448 config T-shards up to 8-way
    through all 16 blocks, vs 2-way on H)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    if any(getattr(b, "moe", False) for b in spec.blocks):
        # MoE routing uses per-sample capacity over the FULL token set;
        # token-sharded execution would route over local tokens only and
        # diverge. Scale MoE models with dp x ep (parallel/ep.py) instead.
        raise NotImplementedError(
            "sequence parallelism does not support MoE blocks")
    n_sp = int(mesh.shape[axis_name])

    def fn(params_, x_):
        return sp_forward(params_, spec, x_, axis_name=axis_name,
                          n_sp=n_sp, dtype=dtype, shard_axis=shard_axis)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_rep=False,
    )(params, x)
