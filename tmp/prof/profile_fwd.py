import sys, time, os
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.build import build_model

cfg = get_cfg()
cfg.merge_from_file("/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
cfg.DATA.TRAIN_CROP_SIZE = 448
cfg.DATA.TEST_CROP_SIZE = 448
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
module, params = build_model(cfg)

BATCH = 4
def chain(p, x):
    def body(i, x):
        preds = module.apply({"params": p}, [x])
        return x * (1 + 1e-3 * preds.mean().astype(x.dtype))
    return jax.lax.fori_loop(0, 3, body, x)

f = jax.jit(chain)
x = jnp.asarray(np.random.RandomState(0).randn(BATCH, 16, 448, 448, 3), jnp.bfloat16)
r = f(params, x); _ = np.asarray(r.ravel()[0])
print("warm", flush=True)
t0 = time.time(); r = f(params, x); _ = np.asarray(r.ravel()[0])
print("per-iter ms:", (time.time()-t0)/3*1000, flush=True)
with jax.profiler.trace("/root/repo/tmp/prof/trace_fwd448"):
    r = f(params, x); _ = np.asarray(r.ravel()[0])
print("profile done", flush=True)
