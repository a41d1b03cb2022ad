"""Chained-timing measurement of achievable HBM bandwidth and small-matmul
throughput on the tunneled device."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(os.environ.get("PROF_K", 20))
FLOOR = 0.043

key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (192000, 512))             # 393 MB
P = jax.random.uniform(key, (512, 128))
small = jax.random.uniform(key, (192000, 2, 8, 8, 2, 2))


def timeit(name, fn, arg, bytes_per_rep):
    @jax.jit
    def chained(a):
        def body(i, carry):
            eps, acc = carry
            s = jnp.sum(fn(a + eps))
            return (s * 1e-30, acc + s)
        return jax.lax.fori_loop(0, K, body,
                                 (jnp.float32(0.0), jnp.float32(0.0)))[1]

    _ = float(np.asarray(chained(arg)))
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(np.asarray(chained(arg)))
    dt = ((time.perf_counter() - t0) / 3 - FLOOR) / K
    print(f"{name:34s} {dt*1e3:8.2f} ms   {bytes_per_rep/dt/1e9:7.0f} GB/s")


timeit("elementwise x*2+1 [192k,512]", lambda x: x * 2 + 1, x, 2 * 393e6)
timeit("reduce sum(x) [192k,512]", lambda x: x, x, 393e6)
timeit("matmul [192k,512]@[512,128]", lambda x: x @ P, x, 393e6 + 98e6)
timeit("einsum zmrapu->zmapu (r-sum)",
       lambda s: s.sum(axis=1), small, 2 * 393e6 / 2)
timeit("transpose-read [192k,512].T sum0",
       lambda x: x.T @ jnp.ones((192000,), x.dtype), x, 393e6)
