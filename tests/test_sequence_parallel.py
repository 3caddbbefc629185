"""Sequence-parallel pooled attention vs dense computation (8-dev CPU mesh).

The reference has no sequence parallelism (SURVEY §5.7); parallel/sp.py is
the beyond-parity scaling path: tokens sharded along H, halo exchanges for
the pool convs, all-gather of the tiny pooled K/V. These tests pin exact
equivalence with the unsharded math, including gradients through the
collectives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aicity_action_tpu.parallel import sp

try:
    from jax.experimental.shard_map import shard_map
except ImportError:  # newer jax
    from jax.sharding import shard_map


def _mesh():
    devs = np.asarray(jax.devices()[:8])
    return Mesh(devs, ("seq",))


def _dense_pool(x, w, s):
    return lax.conv_general_dilated(
        x, w, (1, s, s), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1])


def test_halo_pool_matches_dense():
    rs = np.random.RandomState(0)
    B, T, H, W, C = 2, 2, 32, 8, 8
    x = jnp.asarray(rs.randn(B, T, H, W, C), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 1, C), jnp.float32)
    mesh = _mesh()
    for s in (1, 2, 4):
        want = _dense_pool(x, w, s)

        f = shard_map(
            lambda xl, w: sp.sp_depthwise_pool(xl, w, s, "seq"),
            mesh=mesh,
            in_specs=(P(None, None, "seq"), P()),
            out_specs=P(None, None, "seq"),
        )
        got = f(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shard_axis", [1, 2])
@pytest.mark.parametrize("mode,kernel,stride", [
    ("conv", (3, 5, 5), (1, 2, 2)),   # halo 2 on H, 1 on T
    ("conv", (5, 3, 3), (1, 1, 1)),   # halo 2 on T
    ("max", (3, 3, 3), (2, 2, 2)),
    ("avg", (3, 3, 3), (1, 1, 1)),
])
def test_sp_pool_volume_axes_and_halos(shard_axis, mode, kernel, stride):
    """sp_pool_volume must match the dense op for BOTH shard axes (H rows,
    T frames), halos wider than 1, and all three pooling modes (conv zero
    pad, max -inf pad, avg count-include-pad)."""
    from aicity_action_tpu.ops.pooling import depthwise_conv3d, pool3d

    rs = np.random.RandomState(1)
    B, T, H, W, C = 2, 8, 16, 8, 8
    x = jnp.asarray(rs.randn(B, T, H, W, C), jnp.float32)
    w = (jnp.asarray(rs.randn(*kernel, 1, C), jnp.float32)
         if mode == "conv" else None)
    pad = tuple(k // 2 for k in kernel)
    if mode == "conv":
        want = depthwise_conv3d(x, w, stride, pad)
    else:
        want = pool3d(x, mode, kernel, stride, pad)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    spec = [None, None, None]
    spec[shard_axis - 1] = "seq"
    f = shard_map(
        lambda xl: sp.sp_pool_volume(
            xl, "seq", mode=mode, kernel=kernel, stride=stride,
            conv_weights=w, shard_axis=shard_axis),
        mesh=mesh,
        in_specs=(P(None, *spec),),
        out_specs=P(None, *spec),
    )
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def _params(rs, C):
    def r(*shape):
        return jnp.asarray(rs.randn(*shape) * 0.1, jnp.float32)

    return {
        "ln_scale": jnp.ones((C,), jnp.float32), "ln_bias": r(C),
        "qkv_w": r(C, 3 * C), "qkv_b": r(3 * C),
        "pool_q_w": r(3, 3, 3, 1, C), "pool_k_w": r(3, 3, 3, 1, C),
        "pool_v_w": r(3, 3, 3, 1, C),
        "norm_q_scale": jnp.ones((C,)), "norm_q_bias": r(C),
        "norm_k_scale": jnp.ones((C,)), "norm_k_bias": r(C),
        "norm_v_scale": jnp.ones((C,)), "norm_v_bias": r(C),
        "proj_w": r(C, C), "proj_b": r(C),
    }


def _dense_block(x, params, stride_q, stride_kv):
    B, T, H, W, C = x.shape

    def _ln(t, scale, bias, eps):
        tf = t.astype(jnp.float32)
        mu = tf.mean(-1, keepdims=True)
        var = ((tf - mu) ** 2).mean(-1, keepdims=True)
        return (tf - mu) * lax.rsqrt(var + eps) * scale + bias

    xn = _ln(x, params["ln_scale"], params["ln_bias"], 1e-6)
    qkv = jnp.dot(xn, params["qkv_w"]) + params["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _ln(_dense_pool(q, params["pool_q_w"], stride_q),
            params["norm_q_scale"], params["norm_q_bias"], 1e-5)
    k = _ln(_dense_pool(k, params["pool_k_w"], stride_kv),
            params["norm_k_scale"], params["norm_k_bias"], 1e-5)
    v = _ln(_dense_pool(v, params["pool_v_w"], stride_kv),
            params["norm_v_scale"], params["norm_v_bias"], 1e-5)
    Hq, Wq = q.shape[2], q.shape[3]
    qf = q.reshape(B, -1, C)
    kf = k.reshape(B, -1, C)
    vf = v.reshape(B, -1, C)
    s = jnp.einsum("bqd,bkd->bqk", qf, kf) * C ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", p, vf) + qf
    out = jnp.dot(out, params["proj_w"]) + params["proj_b"]
    return out.reshape(B, T, Hq, Wq, C)


def test_sp_pooled_attention_matches_dense():
    rs = np.random.RandomState(1)
    B, T, H, W, C = 2, 2, 32, 8, 8
    x = jnp.asarray(rs.randn(B, T, H, W, C), jnp.float32)
    params = _params(rs, C)
    mesh = _mesh()
    stride_q, stride_kv = 1, 4

    want = _dense_block(x, params, stride_q, stride_kv)

    f = shard_map(
        lambda xl, p: sp.sp_pooled_attention(
            xl, (T, H // 8, W), p, axis_name="seq",
            stride_q=stride_q, stride_kv=stride_kv),
        mesh=mesh,
        in_specs=(P(None, None, "seq"), P()),
        out_specs=P(None, None, "seq"),
    )
    got = jax.jit(f)(x, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_sp_gradients_flow_through_collectives():
    rs = np.random.RandomState(2)
    B, T, H, W, C = 1, 2, 32, 8, 8
    x = jnp.asarray(rs.randn(B, T, H, W, C), jnp.float32)
    params = _params(rs, C)
    mesh = _mesh()

    def loss_sp(x, p):
        f = shard_map(
            lambda xl, pp: sp.sp_pooled_attention(
                xl, (T, H // 8, W), pp, axis_name="seq",
                stride_q=1, stride_kv=4),
            mesh=mesh,
            in_specs=(P(None, None, "seq"), P()),
            out_specs=P(None, None, "seq"),
        )
        return (f(x, p) ** 2).sum()

    def loss_dense(x, p):
        return (_dense_block(x, p, 1, 4).astype(jnp.float32) ** 2).sum()

    g_sp = jax.grad(loss_sp, argnums=(0, 1))(x, params)
    g_dn = jax.grad(loss_dense, argnums=(0, 1))(x, params)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_dn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
