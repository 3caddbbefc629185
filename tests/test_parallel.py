"""Mesh/sharding tests on the virtual 8-device CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from aicity_action_tpu.parallel.tp import mvit_param_shardings


def test_make_mesh_default_data_axis():
    cfg = get_cfg()
    mesh = make_mesh(cfg)
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == 8


def test_make_mesh_2d():
    cfg = get_cfg()
    cfg.TPU.MESH_SHAPE = [4, 2]
    cfg.TPU.MESH_AXES = ["data", "model"]
    mesh = make_mesh(cfg)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_shard_batch_places_on_data_axis():
    cfg = get_cfg()
    mesh = make_mesh(cfg)
    batch = {"inputs": [np.ones((8, 4, 8, 8, 3), np.float32)],
             "labels": np.arange(8)}
    dev = shard_batch(mesh, batch)
    sh = dev["inputs"][0].sharding
    assert sh.spec == P("data")


def test_tp_param_sharding_rules():
    cfg = get_cfg()
    cfg.TPU.MESH_SHAPE = [4, 2]
    cfg.TPU.MESH_AXES = ["data", "model"]
    mesh = make_mesh(cfg)
    params = {
        "blocks_0": {
            "attn": {
                "qkv": {"kernel": jnp.ones((32, 96)), "bias": jnp.ones(96)},
                "proj": {"kernel": jnp.ones((32, 32)),
                         "bias": jnp.ones(32)},
            },
            "mlp": {
                "fc1": {"kernel": jnp.ones((32, 128))},
                "fc2": {"kernel": jnp.ones((128, 32))},
            },
            "norm1": {"scale": jnp.ones(32)},
        },
    }
    sh = mvit_param_shardings(mesh, params)
    b = sh["blocks_0"]
    assert b["attn"]["qkv"]["kernel"].spec == P(None, "model")  # column
    assert b["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert b["attn"]["proj"]["kernel"].spec == P("model", None)  # row
    assert b["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert b["attn"]["qkv"]["bias"].spec == P()  # replicated
    assert b["norm1"]["scale"].spec == P()

    # sharded matmul chain still computes correctly under jit
    x = jnp.ones((8, 32))
    p = jax.device_put(params, sh)

    @jax.jit
    def f(p, x):
        h = x @ p["blocks_0"]["mlp"]["fc1"]["kernel"]
        return h @ p["blocks_0"]["mlp"]["fc2"]["kernel"]

    with mesh:
        out = f(p, jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), 32 * 128, rtol=1e-5)
