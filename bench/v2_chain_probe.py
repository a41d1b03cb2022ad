"""Chained v2 iterations with prep_slots hoisted vs included."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.ops import scan_v2 as v2
from cnf2freq_tpu.utils import simulate_f2

B = int(os.environ.get("BENCH_B", 1000))
M = int(os.environ.get("BENCH_M", 192))
K = int(os.environ.get("BENCH_K", 10))

ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50),
                  seed=7)
for ind in ped.inds[1:]:
    ped.fixtrees(ind.n)
ped.count_descendants()
fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=np.float32)
dists = jnp.asarray(np.diff(ped.markerposes).astype(np.float32))
cfg = ModelConfig()
params = RuntimeParams()
fbj = fb.map(jnp.asarray)
desc = jnp.asarray(fb.descendants.astype(np.float32))


def chain(body, inputs):
    @jax.jit
    def run(*args):
        def step(i, carry):
            eps, acc = carry
            s = body(eps, *args)
            return (s * 1e-30, acc + s)
        return jax.lax.fori_loop(0, K, step,
                                 (jnp.float32(0.0), jnp.float32(0.0)))[1]
    _ = float(np.asarray(run(*inputs)))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(np.asarray(run(*inputs)))
    return (time.perf_counter() - t0) / (3 * K)


def body_full(eps, fbj, d):
    st = v2.prep_slots(fbj, jnp.float32)
    R = st.nb * 1024
    e = v2.emission_tiles(st, M, cfg, jnp.float32)
    fb2 = v2.fb_scan_v2(e.reshape(M, 512, R), d + eps, cfg, params)
    total = v2.combined_loglik_v2(fb2, st.sh)
    b12, acc, pair = v2.stats_from_v2(st, fb2, total, M, B, cfg,
                                      jnp.float32)
    tw = v2.turn_weights_v2(fb2, st.sh, desc, cfg, B)
    return total.sum() + b12.sum() + acc.sum() + pair.sum() + tw.sum()


st0 = jax.jit(lambda f: v2.prep_slots(f, jnp.float32))(fbj)


def body_hoisted(eps, st, d):
    R = st.nb * 1024
    e = v2.emission_tiles(st, M, cfg, jnp.float32)
    fb2 = v2.fb_scan_v2(e.reshape(M, 512, R), d + eps, cfg, params)
    total = v2.combined_loglik_v2(fb2, st.sh)
    b12, acc, pair = v2.stats_from_v2(st, fb2, total, M, B, cfg,
                                      jnp.float32)
    tw = v2.turn_weights_v2(fb2, st.sh, desc, cfg, B)
    return total.sum() + b12.sum() + acc.sum() + pair.sum() + tw.sum()


t_full = chain(body_full, (fbj, dists))
t_hoist = chain(body_hoisted, (st0, dists))
print(f"full (prep inside): {t_full*1000:.1f} ms/iter")
print(f"prep hoisted:       {t_hoist*1000:.1f} ms/iter")
