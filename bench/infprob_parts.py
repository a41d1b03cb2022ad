"""Sub-profile infprob_stats and haplo_stats internals (chained timing)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.hmm.emission import assemble_e_all, build_blocks
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.hmm.forward_backward import combined_loglik, forward_backward
from cnf2freq_tpu.hmm import probes as pr
from cnf2freq_tpu.utils import simulate_f2

K = int(os.environ.get("PROF_K", 20))
FLOOR = 0.043
B, M = 1000, 192

ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50), seed=7)
for ind in ped.inds[1:]:
    ped.fixtrees(ind.n)
ped.count_descendants()
fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=np.float32)
dists = np.diff(ped.markerposes).astype(np.float32)
cfg = ModelConfig()
params = RuntimeParams()
fbj = fb.map(jnp.asarray)
dj = jnp.asarray(dists)

# precompute inputs once on device
@jax.jit
def prelude(fb, d):
    blocks = build_blocks(fb, cfg, dtype=fb.ms.dtype)
    e = assemble_e_all(blocks, cfg)
    fbres = forward_backward(e, d, cfg, params)
    total = combined_loglik(fbres, fb.shiftignore)
    W = pr.posterior_weight(fbres, total, fb.shiftignore)
    V = [pr._valid_paths(fb.flag2ignore, k).astype(W.dtype) for k in range(2)]
    PB = [blocks.pb[k] * V[k][:, None, None, None, :, None] for k in range(2)]
    t01 = pr.side_collapse(PB, pr._w_bits(W, cfg))
    return blocks.froot, PB[0], PB[1], t01[0], t01[1], W


froot, PB0, PB1, T1, T0, W = [jnp.asarray(np.asarray(x))
                              for x in prelude(fbj, dj)]
dtype = W.dtype
shares_host = {}


def timeit(name, fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, carry):
            eps, acc = carry
            pert = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            leaves = jax.tree_util.tree_leaves(fn(*pert))
            s = sum(jnp.sum(y).astype(jnp.float32) for y in leaves)
            return (s * 1e-30, acc + s)
        return jax.lax.fori_loop(0, K, body,
                                 (jnp.float32(0.0), jnp.float32(0.0)))[1]

    _ = float(np.asarray(chained(*args)))
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(np.asarray(chained(*args)))
    dt = ((time.perf_counter() - t0) / 3 - FLOOR) / K
    print(f"{name:34s} {dt*1e3:8.2f} ms")


def shares_fn(fb):
    out = []
    for side in range(2):
        us = [pr._share_blocks(fb, cfg, side, mv, False, dtype)
              for mv in (1, 2)]
        den = us[0] + us[1]
        for i, mv in enumerate((1, 2)):
            sh = jnp.where(den > 0, us[i] / jnp.where(den > 0, den, 1.0),
                           0.0)
            if side == 1:
                sh = sh[:, :, ::-1]
            out.append(sh)
    return out


sh = [jnp.asarray(np.asarray(x)) for x in jax.jit(shares_fn)(fbj)]


def x_einsums(froot, PB0, T1, s01, s02):
    outs = []
    for shx in (s01, s02):
        X0 = jnp.einsum("zmrt,zmrapu,zmraptu,zmraut->zmrap",
                        froot, PB0, shx, T1)
        outs.append(X0)
    return outs


def pair_fn(froot, PB0, PB1, s01, s02, s11, s12, W):
    Wr = pr._w_bits(W, cfg)
    P0 = jnp.stack([jnp.einsum("zmrapu,zmraptu->zmraut", PB0, s)
                    for s in (s01, s02)], axis=2)
    P1 = jnp.stack([jnp.einsum("zmrbqv,zmrbqtv->zmrbvt", PB1, s)
                    for s in (s11, s12)], axis=2)
    return jnp.einsum("zmrt,zmiraut,zmjrbvt,zmbavut->zmij",
                      froot, P0, P1, Wr)


def side_collapse_fn(PB0, PB1, W):
    return pr.side_collapse([PB0, PB1], pr._w_bits(W, cfg))


def haplo_y(froot, PB0, T1):
    return jnp.einsum("zmrt,zmrapu,zmraut->zmapu", froot, PB0, T1)


timeit("shares (4 tensors)", shares_fn, fbj)
timeit("X einsums side0 (2 mv)", x_einsums, froot, PB0, T1, sh[0], sh[1])
timeit("pair einsum", pair_fn, froot, PB0, PB1, sh[0], sh[1], sh[2], sh[3], W)
timeit("side_collapse", side_collapse_fn, PB0, PB1, W)
timeit("haplo Y einsum", haplo_y, froot, PB0, T1)
