"""Measure per-call floor, elementwise HBM rate, and matmul peak on device."""
import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (192000, 512))            # 393 MB
a = jax.random.uniform(key, (8192, 8192))             # 268 MB
b = jax.random.uniform(key, (8192, 8192))


def timeit(name, fn, *args, reps=10, work=None):
    @jax.jit
    def reduced(*ar):
        return jnp.sum(fn(*ar))
    _ = float(np.asarray(reduced(*args)))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(np.asarray(reduced(*args)))
    dt = (time.perf_counter() - t0) / reps
    extra = ""
    if work:
        extra = f"   ({work(dt)})"
    print(f"{name:28s} {dt*1e3:8.2f} ms{extra}")


timeit("scalar round-trip", lambda: jnp.float32(1.0), reps=20)
timeit("elementwise 393MB (x*2+1)", lambda x: x * 2 + 1, x,
       work=lambda dt: f"{2*393e6/dt/1e9:.0f} GB/s")
timeit("sum-reduce 393MB", lambda x: x, x,
       work=lambda dt: f"{393e6/dt/1e9:.0f} GB/s")
timeit("matmul 8192^3 f32", lambda a, b: a @ b, a, b,
       work=lambda dt: f"{2*8192**3/dt/1e12:.1f} TFLOP/s")
timeit("matmul 8192^3 bf16",
       lambda a, b: (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16)), a, b,
       work=lambda dt: f"{2*8192**3/dt/1e12:.1f} TFLOP/s")
