"""Break the chromosome scan into stages and time each on the device.

Usage: python bench/profile_parts.py [B] [M]
"""
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
from cnf2freq_tpu.hmm.probes import (_valid_paths, _w_bits, haplo_stats,
                                     infprob_stats, posterior_weight,
                                     side_collapse, turn_weights_fast)
from cnf2freq_tpu.utils import simulate_f2

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 192

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


K = int(os.environ.get("PROF_K", 10))
FLOOR = 0.043   # measured per-dispatch tunnel latency (floor_probe.py)


def timeit(name, fn, *args):
    # chain K data-dependent reps inside one jit call to amortize the
    # ~43ms axon dispatch floor; reduce to a scalar and read it back
    # (block_until_ready under-reports on the tunnel)
    @jax.jit
    def chained(*a):
        def body(i, carry):
            eps, acc = carry
            pert = jax.tree_util.tree_map(
                lambda x: x + eps.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            leaves = jax.tree_util.tree_leaves(fn(*pert))
            s = sum(jnp.sum(x).astype(jnp.float32) for x in leaves)
            return (s * 1e-30, acc + s)

        return jax.lax.fori_loop(
            0, K, body, (jnp.float32(0.0), jnp.float32(0.0)))[1]

    _ = float(np.asarray(chained(*args)))
    t0 = time.perf_counter()
    for _ in range(3):
        s = float(np.asarray(chained(*args)))
    dt = ((time.perf_counter() - t0) / 3 - FLOOR) / K
    print(f"{name:30s} {dt*1e3:8.2f} ms")


@jax.jit
def stage_emission(fb):
    blocks = build_blocks(fb, cfg, dtype=fb.ms.dtype)
    return assemble_e_all(blocks, cfg)


@jax.jit
def stage_fb(fb, d):
    e = stage_emission(fb)
    return forward_backward(e, d, cfg, params)


@jax.jit
def stage_posterior(fb, d):
    fbres = stage_fb(fb, d)
    total = combined_loglik(fbres, fb.shiftignore)
    return posterior_weight(fbres, total, fb.shiftignore)


@jax.jit
def stage_collapse(fb, d):
    blocks = build_blocks(fb, cfg, dtype=fb.ms.dtype)
    W = stage_posterior(fb, d)
    V = [_valid_paths(fb.flag2ignore, k).astype(W.dtype) for k in range(2)]
    PBm = [blocks.pb[k] * V[k][:, None, None, None, :, None] for k in range(2)]
    return side_collapse(PBm, _w_bits(W, cfg))


@jax.jit
def stage_haplo(fb, d):
    blocks = build_blocks(fb, cfg, dtype=fb.ms.dtype)
    W = stage_posterior(fb, d)
    t01 = stage_collapse(fb, d)
    return haplo_stats(W, blocks, fb, cfg, t01=t01)


@jax.jit
def stage_inf(fb, d):
    blocks = build_blocks(fb, cfg, dtype=fb.ms.dtype)
    W = stage_posterior(fb, d)
    t01 = stage_collapse(fb, d)
    return infprob_stats(W, blocks, fb, cfg, t01=t01)


@jax.jit
def stage_turn(fb, d):
    fbres = stage_fb(fb, d)
    return turn_weights_fast(fbres, fb, cfg)


from cnf2freq_tpu.engine import chromosome_scan


@jax.jit
def full(fb, d):
    return chromosome_scan(fb, d, cfg, params)


timeit("emission", stage_emission, fbj)
timeit("emission+fb", stage_fb, fbj, dj)
timeit("+posterior W", stage_posterior, fbj, dj)
timeit("+side collapse", stage_collapse, fbj, dj)
timeit("+haplo stats", stage_haplo, fbj, dj)
timeit("+infprob stats", stage_inf, fbj, dj)
timeit("fb+turn weights", stage_turn, fbj, dj)
timeit("FULL scan", full, fbj, dj)
