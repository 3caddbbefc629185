"""Numerical parity of the JAX MViT blocks vs the reference torch implementation.

The reference `slowfast/models/attention.py` is loaded standalone (see
ref_oracle.py) and used as the golden oracle: random weights are generated in
torch, converted to the flax layout, and outputs compared in float32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aicity_action_tpu.ops.pooling import attention_pool
from aicity_action_tpu.models.mvit import BlockSpec, MultiScaleAttention, MultiScaleBlock

from ref_oracle import load_reference_attention, torch_to_numpy

torch = pytest.importorskip("torch")

ATOL = 2e-5
RTOL = 1e-5


def _close(a, b, atol=ATOL, rtol=RTOL, msg=""):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape, msg)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)


# --------------------------------------------------------------- op-level
class TestAttentionPool:
    def _run(self, mode, has_cls, B=2, N=2, T=4, H=8, W=8, d=16):
        ref = load_reference_attention()
        rng = np.random.RandomState(0)
        L = T * H * W + (1 if has_cls else 0)
        x = rng.randn(B, N, L, d).astype(np.float32)

        kernel, stride = (3, 3, 3), (1, 2, 2)
        pad = tuple(k // 2 for k in kernel)

        if mode == "conv":
            tpool = torch.nn.Conv3d(d, d, kernel, stride=stride,
                                    padding=pad, groups=d, bias=False)
            w = torch_to_numpy(tpool.weight)  # [d, 1, kT, kH, kW]
            conv_w = jnp.asarray(w.transpose(2, 3, 4, 1, 0))
        elif mode == "max":
            tpool = torch.nn.MaxPool3d(kernel, stride, pad, ceil_mode=False)
            conv_w = None
        else:
            tpool = torch.nn.AvgPool3d(kernel, stride, pad, ceil_mode=False)
            conv_w = None

        with torch.no_grad():
            ref_out, ref_thw = ref.attention_pool(
                torch.from_numpy(x), tpool, [T, H, W], has_cls_embed=has_cls
            )

        out, thw = attention_pool(
            jnp.asarray(x), (T, H, W), mode=mode, kernel=kernel,
            stride=stride, conv_weights=conv_w, has_cls=has_cls,
        )
        assert tuple(thw) == tuple(ref_thw)
        _close(out, torch_to_numpy(ref_out), msg=f"attention_pool {mode}")

    @pytest.mark.parametrize("mode", ["conv", "max", "avg"])
    @pytest.mark.parametrize("has_cls", [False, True])
    def test_modes(self, mode, has_cls):
        self._run(mode, has_cls)

    def test_3d_input_rank(self):
        """Rank-3 input [B, L, d] must round-trip through the rank-4 path."""
        ref = load_reference_attention()
        rng = np.random.RandomState(1)
        T, H, W, d = 2, 4, 4, 8
        x = rng.randn(3, T * H * W, d).astype(np.float32)
        tpool = torch.nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1))
        with torch.no_grad():
            ref_out, _ = ref.attention_pool(
                torch.from_numpy(x), tpool, [T, H, W], has_cls_embed=False
            )
        out, _ = attention_pool(
            jnp.asarray(x), (T, H, W), mode="max", kernel=(1, 3, 3),
            stride=(1, 2, 2), has_cls=False,
        )
        assert out.ndim == 3
        _close(out, torch_to_numpy(ref_out))


# ------------------------------------------------------- weight conversion
def _convert_attention_weights(tattn, prefix=""):
    """Map reference MultiScaleAttention state_dict → flax param dict."""
    sd = {k: torch_to_numpy(v) for k, v in tattn.state_dict().items()}
    p = {}
    p["qkv"] = {"kernel": sd["qkv.weight"].T}
    if "qkv.bias" in sd:
        p["qkv"]["bias"] = sd["qkv.bias"]
    p["proj"] = {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]}
    for name in ("q", "k", "v"):
        wk = f"pool_{name}.weight"
        if wk in sd:
            p[f"pool_{name}"] = sd[wk].transpose(2, 3, 4, 1, 0)
            p[f"norm_{name}"] = {
                "scale": sd[f"norm_{name}.weight"],
                "bias": sd[f"norm_{name}.bias"],
            }
    return p


def _convert_block_weights(tblock):
    sd = {k: torch_to_numpy(v) for k, v in tblock.state_dict().items()}
    p = {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": _convert_attention_weights(tblock.attn),
        "mlp": {
            "fc1": {"kernel": sd["mlp.fc1.weight"].T, "bias": sd["mlp.fc1.bias"]},
            "fc2": {"kernel": sd["mlp.fc2.weight"].T, "bias": sd["mlp.fc2.bias"]},
        },
    }
    if "proj_max_pool.weight" in sd:
        p["proj_max_pool"] = {
            "kernel": sd["proj_max_pool.weight"].T,
            "bias": sd["proj_max_pool.bias"],
        }
    if "proj.weight" in sd:
        p["proj"] = {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]}
    return p


# ------------------------------------------------------------ module-level
class TestMultiScaleAttention:
    @pytest.mark.parametrize("mode", ["conv", "max"])
    @pytest.mark.parametrize("q_residual", [False, True])
    def test_vs_reference(self, mode, q_residual):
        ref = load_reference_attention()
        torch.manual_seed(0)
        B, T, H, W = 2, 4, 8, 8
        dim, heads = 32, 2
        L = T * H * W
        kernel, stride_q, stride_kv = (3, 3, 3), (1, 2, 2), (1, 4, 4)

        tattn = ref.MultiScaleAttention(
            dim, num_heads=heads, qkv_bias=True,
            kernel_q=kernel, kernel_kv=kernel,
            stride_q=stride_q, stride_kv=stride_kv,
            has_cls_embed=False, mode=mode,
            use_query_residual_pool=q_residual,
        ).eval()

        x = np.random.RandomState(0).randn(B, L, dim).astype(np.float32)
        with torch.no_grad():
            ref_out, ref_thw = tattn(torch.from_numpy(x), [T, H, W])

        jattn = MultiScaleAttention(
            dim=dim, dim_out=dim, num_heads=heads,
            kernel_q=kernel, kernel_kv=kernel,
            stride_q=stride_q, stride_kv=stride_kv,
            mode=mode, qkv_bias=True, has_cls=False,
            q_pool_residual=q_residual,
        )
        params = _convert_attention_weights(tattn)
        out, thw = jattn.apply({"params": params}, jnp.asarray(x), (T, H, W))
        assert tuple(thw) == tuple(ref_thw)
        _close(out, torch_to_numpy(ref_out), msg=f"attn {mode} qres={q_residual}")

    def test_expand_channel(self):
        """MViT-v2 channel-expand-front: qkv projects dim -> 3*dim_out."""
        ref = load_reference_attention()
        torch.manual_seed(1)
        B, T, H, W = 1, 2, 8, 8
        dim, dim_out, heads = 32, 64, 2
        tattn = ref.MultiScaleAttention(
            dim, num_heads=heads, qkv_bias=True,
            kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=(1, 2, 2), stride_kv=(1, 2, 2),
            has_cls_embed=False, mode="conv",
            use_query_residual_pool=True,
            expand_channel=True, expand_to_dim=dim_out,
        ).eval()
        x = np.random.RandomState(2).randn(B, T * H * W, dim).astype(np.float32)
        with torch.no_grad():
            ref_out, _ = tattn(torch.from_numpy(x), [T, H, W])
        jattn = MultiScaleAttention(
            dim=dim, dim_out=dim_out, num_heads=heads,
            kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
            stride_q=(1, 2, 2), stride_kv=(1, 2, 2),
            mode="conv", qkv_bias=True, has_cls=False,
            q_pool_residual=True,
        )
        params = _convert_attention_weights(tattn)
        out, _ = jattn.apply({"params": params}, jnp.asarray(x), (T, H, W))
        _close(out, torch_to_numpy(ref_out), msg="expand_channel")


class TestMultiScaleBlock:
    def _compare(self, dim, dim_out, heads, stride_q, channel_expand_front,
                 has_cls=False, T=4, H=8, W=8, B=2):
        ref = load_reference_attention()
        torch.manual_seed(3)
        kernel = (3, 3, 3)
        tblock = ref.MultiScaleBlock(
            dim=dim, dim_out=dim_out, num_heads=heads, mlp_ratio=4.0,
            qkv_bias=True, drop_rate=0.0, drop_path=0.0,
            kernel_q=kernel, kernel_kv=kernel,
            stride_q=stride_q, stride_kv=(1, 2, 2),
            mode="conv", has_cls_embed=has_cls,
            use_query_residual_pool=True,
            channel_expand_front=channel_expand_front,
        ).eval()

        L = T * H * W + (1 if has_cls else 0)
        x = np.random.RandomState(4).randn(B, L, dim).astype(np.float32)
        with torch.no_grad():
            ref_out, ref_thw = tblock(torch.from_numpy(x), [T, H, W])

        spec = BlockSpec(
            dim=dim, dim_out=dim_out, num_heads=heads,
            kernel_q=kernel, kernel_kv=kernel,
            stride_q=stride_q, stride_kv=(1, 2, 2), drop_path=0.0,
        )
        jblock = MultiScaleBlock(
            spec=spec, mode="conv", qkv_bias=True, has_cls=has_cls,
            q_pool_residual=True, channel_expand_front=channel_expand_front,
            mlp_ratio=4.0,
        )
        params = _convert_block_weights(tblock)
        out, thw = jblock.apply({"params": params}, jnp.asarray(x), (T, H, W))
        assert tuple(thw) == tuple(ref_thw)
        _close(out, torch_to_numpy(ref_out), atol=5e-5,
               msg=f"block {dim}->{dim_out} expand={channel_expand_front}")

    def test_same_dim(self):
        self._compare(32, 32, 2, (1, 2, 2), channel_expand_front=True)

    def test_expand_front(self):
        """v2 block: channel expansion happens in the attention."""
        self._compare(32, 64, 2, (1, 2, 2), channel_expand_front=True)

    def test_expand_mlp_v1(self):
        """v1 block: channel expansion happens in the MLP + residual proj."""
        self._compare(32, 64, 2, (1, 2, 2), channel_expand_front=False)

    def test_no_q_pool_stride(self):
        """stride_q=(1,1,1) with kernel: conv-pool q but identity skip."""
        self._compare(32, 32, 2, (1, 1, 1), channel_expand_front=True)

    def test_with_cls_token(self):
        self._compare(32, 32, 2, (1, 2, 2), channel_expand_front=True,
                      has_cls=True)
