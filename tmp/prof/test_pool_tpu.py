import numpy as np, jax, jax.numpy as jnp, sys, time
sys.path.insert(0, '/root/repo')
from aicity_action_tpu.ops.pallas import pool_ln as pln

rs = np.random.RandomState(0)
# the real 448-crop shapes: (G, T, H, W, C, s, groups)
cases = [
    (4, 8, 112, 112, 96, 1, 1),   # block0 q
    (4, 8, 112, 112, 96, 8, 1),   # block0 kv
    (4, 8, 112, 112, 192, 2, 2),  # block1 q
    (4, 8, 112, 112, 192, 4, 2),  # block1 kv
    (4, 8, 56, 56, 384, 2, 4),    # block3 q
    (4, 8, 28, 28, 384, 1, 4),    # blocks 4-13 q
    (4, 8, 28, 28, 768, 2, 8),    # block14 q (expand front -> 768)
    (4, 8, 14, 14, 768, 1, 8),    # block15
]
for (G,T,H,W,C,s,groups) in cases:
    x = jnp.asarray(rs.randn(G,T,H,W,C), jnp.bfloat16)
    w = jnp.asarray(rs.randn(3,3,3,C)*0.1, jnp.bfloat16)
    dg = C//groups
    gm = jnp.asarray(rs.randn(dg), jnp.bfloat16)
    bt = jnp.asarray(rs.randn(dg), jnp.bfloat16)
    ok = pln.fused_pool_supported((T,H,W), C, (1,s,s), (3,3,3), groups, 2)
    print(f"G{G} {H}x{W} C{C} s{s} g{groups}: supported={ok}", flush=True)
    if not ok: continue
    f = jax.jit(lambda x, w, gm, bt: pln.fused_pool_conv_ln(x, w, gm, bt, s, groups, 1e-5))
    got = f(x, w, gm, bt)
    want = pln._ref_pool_conv_ln(x.astype(jnp.float32), w.astype(jnp.float32),
                                 gm.astype(jnp.float32), bt.astype(jnp.float32), s, groups, 1e-5)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
    # timing: chained loop
    def chain(x):
        def body(i, x):
            o = pln.fused_pool_conv_ln(x[..., :C], w, gm, bt, s, groups, 1e-5)
            return x * (1 + 1e-6*o.astype(x.dtype).mean())
        return jax.lax.fori_loop(0, 10, body, x)
    fc = jax.jit(chain)
    r = fc(x); _ = np.asarray(r.ravel()[0])
    t0 = time.time(); r = fc(x); _ = np.asarray(r.ravel()[0])
    dt = (time.time()-t0)/10*1000
    print(f"   maxdiff={d:.4f}  {dt:.3f} ms/call", flush=True)
# max pool case
x = jnp.asarray(rs.randn(4,8,112,112,192), jnp.bfloat16)
f = jax.jit(lambda x: pln.fused_max_pool(x, 1, 2))
got = f(x)
want = pln._ref_max_pool(x, 1, 2)
d = np.abs(np.asarray(got, np.float32)-np.asarray(want, np.float32)).max()
print("maxpool diff", d, flush=True)
