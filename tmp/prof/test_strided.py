import numpy as np, jax, jax.numpy as jnp, functools, sys
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A: ref strided load via pl.Slice(start, size, stride)
def kern_a(x_ref, o_ref):
    v = x_ref[0, :, pl.Slice(1, 16, 4), :]   # [8, 16, 128] strided along sublane-ish dim
    o_ref[0] = v

def kern_b(x_ref, o_ref):
    v = x_ref[0]                      # [8, 66, 128]
    s = jax.lax.slice(v, (0, 1, 0), (8, 65, 128), (1, 4, 1))
    o_ref[0] = s

x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 66, 128), jnp.float32)
for name, kern in [("ref pl.Slice", kern_a), ("value lax.slice", kern_b)]:
    try:
        out = pl.pallas_call(
            kern, grid=(2,),
            in_specs=[pl.BlockSpec((1, 8, 66, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 16, 128), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 8, 16, 128), x.dtype),
        )(x)
        want = np.asarray(x)[:, :, 1:65:4, :]
        ok = np.allclose(np.asarray(out), want)
        print(f"{name}: COMPILES, correct={ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)
