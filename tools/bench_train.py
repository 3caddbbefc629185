#!/usr/bin/env python3
"""Training-throughput benchmark: MViT-v2-B 16x4 @ 224, fused train step
(bf16 + remat + mixup), sequential donated steps.

NOTE: do NOT benchmark whole train steps chained inside lax.fori_loop —
the loop-carried state copies mis-measure by ~100x.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np, optax
from aicity_action_tpu.config import get_cfg, assert_and_infer_cfg
from aicity_action_tpu.models.build import build_model
from aicity_action_tpu.engine.steps import TrainState, make_train_step
from aicity_action_tpu.solver.optimizer import construct_optimizer
from aicity_action_tpu.data.mixup import build_mixup_from_cfg

cfg = get_cfg()
cfg.merge_from_file("/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
cfg.DATA.TRAIN_CROP_SIZE = 224; cfg.DATA.TEST_CROP_SIZE = 224
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
cfg.MODEL.ACT_CHECKPOINT = True
cfg.MIXUP.ENABLE = True
cfg = assert_and_infer_cfg(cfg)
module, params = build_model(cfg)
tx, _ = construct_optimizer(cfg, params, steps_per_epoch=100)
state = TrainState.create(params, tx)
step = jax.jit(make_train_step(module, tx, cfg.MODEL.LOSS_FUNC,
               mixup_fn=build_mixup_from_cfg(cfg),
               num_classes=cfg.MODEL.NUM_CLASSES), donate_argnums=0)
B = 8
batch = {
    "inputs": [jnp.asarray(np.random.RandomState(0).randn(B, 16, 224, 224, 3), jnp.bfloat16)],
    "labels": jnp.asarray(np.arange(B) % 18),
}
rng = jax.random.PRNGKey(0)
s = state
for _ in range(2):
    s, m, _ = step(s, batch, rng)
_ = np.asarray(m["loss"])
t0 = time.time()
N = 20
for _ in range(N):
    s, m, _ = step(s, batch, rng)
_ = np.asarray(m["loss"])
dt = (time.time() - t0) / N
print(f"train step @224 bs8 (direct): {dt*1000:.1f} ms -> {B/dt:.2f} clips/s/chip")
