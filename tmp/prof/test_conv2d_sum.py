import numpy as np, jax, jax.numpy as jnp, time, sys
from jax import lax

def conv3d_dw(x, w, s):
    return lax.conv_general_dilated(x, w, (1, s, s), [(1,1),(1,1),(1,1)],
        dimension_numbers=("NDHWC","DHWIO","NDHWC"), feature_group_count=x.shape[-1])

def conv2d_sum(x, w, s):
    # x [B,T,H,W,C]; w [3,3,3,1,C] -> sum of 3 time-shifted 2D depthwise convs
    B,T,H,W,C = x.shape
    xp = jnp.pad(x, ((0,0),(1,1),(0,0),(0,0),(0,0)))
    x2 = xp.reshape(B*(T+2), H, W, C)
    outs = 0
    for a in range(3):
        xa = xp[:, a:a+T].reshape(B*T, H, W, C)
        o = lax.conv_general_dilated(xa, w[a], (s, s), [(1,1),(1,1)],
            dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=C)
        outs = outs + o
    Ho = o.shape[1]
    return outs.reshape(B, T, Ho, Ho, C)

rs = np.random.RandomState(0)
for (H, C, s) in [(112, 96, 1), (112, 192, 2), (28, 384, 1)]:
    x = jnp.asarray(rs.randn(4, 8, H, H, C), jnp.bfloat16)
    w = jnp.asarray(rs.randn(3,3,3,1,C)*0.1, jnp.bfloat16)
    a = conv3d_dw(x, w, s)
    b = conv2d_sum(x, w, s)
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
    for name, fn in [("conv3d", conv3d_dw), ("conv2dsum", conv2d_sum)]:
        f = jax.jit(lambda x: jax.lax.fori_loop(0, 10, lambda i, y: y*(1+1e-6*fn(y, w, s).mean().astype(y.dtype)), x))
        r = f(x); _ = np.asarray(r.ravel()[0])
        t0=time.time(); r = f(x); _ = np.asarray(r.ravel()[0])
        print(f"H{H} C{C} s{s} {name}: {(time.time()-t0)/10*1000:.2f} ms (diff {d:.4f})", flush=True)
