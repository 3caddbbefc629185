import numpy as np, jax, jax.numpy as jnp, sys, time
sys.path.insert(0, '/root/repo')
from aicity_action_tpu.config import get_cfg
from aicity_action_tpu.models.build import build_model
from aicity_action_tpu.ops.pallas import flash_attention as fa

# MViT-v1-ish K400 config: cls token ON, 224 crop
cfg = get_cfg()
cfg.merge_from_file("/root/reference/configs/Aicity/MVITV2_FULL_B_16x4_CONV_448.yaml")
cfg.DATA.TRAIN_CROP_SIZE = 224
cfg.DATA.TEST_CROP_SIZE = 224
cfg.MVIT.CLS_EMBED_ON = True
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
module, params = build_model(cfg)
x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 224, 224, 3), jnp.bfloat16)

f_flash = jax.jit(lambda p, x: module.apply({"params": p}, [x]))
out_flash = np.asarray(f_flash(params, x), np.float32)
print("flash path done", flush=True)

with fa.disabled():
    f_xla = jax.jit(lambda p, x: module.apply({"params": p}, [x]))
    out_xla = np.asarray(f_xla(params, x), np.float32)
print("xla path done", flush=True)
d = np.abs(out_flash - out_xla).max()
print("cls flash-vs-xla max diff:", d, flush=True)
assert d < 0.02, d  # bf16 end-to-end tolerance

# throughput of the cls config (bs8)
x8 = jnp.asarray(np.random.RandomState(1).randn(8, 16, 224, 224, 3), jnp.bfloat16)
def chain(p, x):
    def body(i, x):
        preds = module.apply({"params": p}, [x])
        return x * (1 + 1e-3 * preds.mean().astype(x.dtype))
    return jax.lax.fori_loop(0, 10, body, x)
fc = jax.jit(chain)
r = fc(params, x8); _ = np.asarray(r.ravel()[0])
t0=time.time(); r = fc(params, x8); _ = np.asarray(r.ravel()[0])
dt = (time.time()-t0)/10
print(f"cls 224 bs8: {8/dt:.1f} clips/s", flush=True)
