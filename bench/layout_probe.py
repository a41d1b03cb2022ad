"""Micro-benchmark: contraction cost in split-axis vs flattened-minor layout."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, M = 1000, 192
ZM = B * M
key = jax.random.PRNGKey(0)
share = jax.random.uniform(key, (B, M, 2, 8, 8, 2, 2))   # [z,m,r,a,p,t,u]
PB = jax.random.uniform(key, (B, M, 2, 8, 8, 2))         # [z,m,r,a,p,u]
T1 = jax.random.uniform(key, (B, M, 2, 8, 2, 2))         # [z,m,r,a,u,t]
froot = jax.random.uniform(key, (B, M, 2, 2))            # [z,m,r,t]

share_f = share.reshape(ZM, 512)
# flattened broadcast helpers in (r,a,p,t,u) order
PB_bc = jnp.broadcast_to(PB[:, :, :, :, :, None, :],
                         (B, M, 2, 8, 8, 2, 2)).reshape(ZM, 512)
T1_bc = jnp.broadcast_to(
    T1.transpose(0, 1, 2, 3, 5, 4)[:, :, :, :, None, :, :],
    (B, M, 2, 8, 8, 2, 2)).reshape(ZM, 512)
fr_bc = jnp.broadcast_to(froot[:, :, :, None, None, :, None],
                         (B, M, 2, 8, 8, 2, 2)).reshape(ZM, 512)
# projection matrix [512, 2*8*8]: sum over (t, u) keeping (r, a, p)
P = np.zeros((512, 128), dtype=np.float32)
idx = np.arange(512)
r = idx >> 8; a = (idx >> 5) & 7; p = (idx >> 2) & 7
P[idx, (r << 6) | (a << 3) | p] = 1.0
Pj = jnp.asarray(P)


@jax.jit
def split_axis(share, PB, T1, froot):
    return jnp.einsum("zmrt,zmrapu,zmraptu,zmraut->zmrap",
                      froot, PB, share, T1)


@jax.jit
def flat(share_f, PB_bc, T1_bc, fr_bc):
    prod = share_f * PB_bc * T1_bc * fr_bc
    return prod @ Pj


K = 20
def timeit(name, fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            eps, acc = carry
            pert = [x + eps.astype(x.dtype) for x in a]
            return (jnp.sum(fn(*pert)) * 1e-30,
                    acc + jnp.sum(fn(*pert)))
        import jax as _j
        return _j.lax.fori_loop(0, K, body,
                                (jnp.float32(0.0), jnp.float32(0.0)))[1]
    _ = float(np.asarray(chained(*args)))
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(np.asarray(chained(*args)))
    dt = ((time.perf_counter() - t0) / 3 - 0.043) / K
    print(f"{name:30s} {dt*1e3:8.2f} ms")


a1 = split_axis(share, PB, T1, froot)
a2 = flat(share_f, PB_bc, T1_bc, fr_bc).reshape(B, M, 2, 8, 8)
print("max diff:", float(jnp.max(jnp.abs(a1 - a2))))
timeit("split-axis einsum", split_axis, share, PB, T1, froot)
timeit("flattened-minor matmul", flat, share_f, PB_bc, T1_bc, fr_bc)
