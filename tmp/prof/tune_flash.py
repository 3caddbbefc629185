import numpy as np, jax, jax.numpy as jnp, sys, time, functools
sys.path.insert(0, '/root/repo')
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make_kernel(scale_folded, skip_rescale_single):
    def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, k_chunk):
        q = q_ref[0].astype(jnp.float32)
        if scale_folded:
            q = q * scale
        Lk = k_ref.shape[1]
        num_k = Lk // k_chunk
        TQ, d = q.shape
        if skip_rescale_single and num_k == 1:
            k = k_ref[0].astype(jnp.float32)
            v = v_ref[0].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if not scale_folded:
                s = s * scale
            m = s.max(axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = p.sum(axis=-1, keepdims=True)
            acc = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            o_ref[0] = (acc / l).astype(o_ref.dtype)
            return
        def body(j, carry):
            m, l, acc = carry
            k = k_ref[0, pl.ds(j * k_chunk, k_chunk), :].astype(jnp.float32)
            v = v_ref[0, pl.ds(j * k_chunk, k_chunk), :].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if not scale_folded:
                s = s * scale
            m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + p.sum(axis=-1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new
        m0 = jnp.full((TQ, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((TQ, 1), jnp.float32)
        acc0 = jnp.zeros((TQ, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)
    return _flash_kernel

def run(q, k, v, scale, q_tile, k_chunk, scale_folded, skip1):
    G, Lq, d = q.shape
    Lk = k.shape[1]
    kern = functools.partial(make_kernel(scale_folded, skip1), scale=scale, k_chunk=k_chunk)
    return pl.pallas_call(
        kern, grid=(G, Lq // q_tile),
        in_specs=[pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, Lk, d), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(flops=4*G*Lq*Lk*d, bytes_accessed=2*(G*Lq*d*2+2*G*Lk*d), transcendentals=G*Lq*Lk),
    )(q, k, v)

rs = np.random.RandomState(0)
shapes = [
    ("b0", 4, 100352, 1568, 96),
    ("b1", 8, 25088, 6272, 96),
    ("b2", 16, 6272, 6272, 96),   # attn.327-like
]
for name, G, Lq, Lk, d in shapes:
    q = jnp.asarray(rs.randn(G, Lq, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(G, Lk, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(G, Lk, d), jnp.bfloat16)
    scale = d ** -0.5
    flops = 4*G*Lq*Lk*d
    for (qt, kc, sf, sk) in [(512, 1568, False, False),
                             (512, 1568, True, True),
                             (1024, 1568, True, True),
                             (512, min(Lk, 3136), True, True)]:
        if Lq % qt or Lk % kc: continue
        def chain(q, k, v):
            def body(i, q):
                o = run(q, k, v, scale, qt, kc, sf, sk)
                return q * (1 + 1e-6 * o.mean().astype(q.dtype))
            return jax.lax.fori_loop(0, 5, body, q)
        f = jax.jit(chain)
        r = f(q, k, v); _ = np.asarray(r.ravel()[0])
        t0 = time.time(); r = f(q, k, v); _ = np.asarray(r.ravel()[0])
        dt = (time.time()-t0)/5
        print(f"{name} qt={qt} kc={kc} fold={sf} skip1={sk}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)
