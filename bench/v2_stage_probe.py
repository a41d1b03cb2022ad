"""Per-stage cost inside a chained device loop (honest axon timing:
each stage body re-runs K times with a data dependency, so nothing
hoists; stage time = chained time minus the empty-loop floor)."""
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

st = jax.jit(lambda f: v2.prep_slots(f, jnp.float32))(fbj)
R = st.nb * 1024
e0 = v2.emission_tiles(st, M, cfg, jnp.float32)
fb20 = v2.fb_scan_v2(e0.reshape(M, 512, R), dists, cfg, params)
total0 = v2.combined_loglik_v2(fb20, st.sh)


def chain(body, *inputs):
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
    return (time.perf_counter() - t0) / (3 * K) * 1000


floor = chain(lambda eps: eps + 1.0)

import dataclasses

t_prep = chain(lambda eps, f: sum(
    x.sum() for x in v2.prep_slots(
        dataclasses.replace(f, hw=f.hw + eps), jnp.float32)[:3]
    ).astype(jnp.float32), fbj)

t_em = chain(lambda eps, s: v2.emission_tiles(
    s._replace(hw=s.hw + eps), M, cfg, jnp.float32).sum(), st)

t_fb = chain(lambda eps, e, d: sum(
    x.sum() for x in v2.fb_scan_v2(e.reshape(M, 512, R), d + eps, cfg,
                                   params)[:3]), e0, dists)

t_stats = chain(lambda eps, s, f2, t: sum(
    x.sum() for x in v2.stats_from_v2(
        s, f2._replace(fw_pre=f2.fw_pre + eps), t, M, B, cfg,
        jnp.float32)), st, fb20, total0)

t_turn = chain(lambda eps, f2, s: v2.turn_weights_v2(
    f2._replace(fw_post=f2.fw_post + eps), s.sh, desc, cfg, B).sum(),
    fb20, st)

print(f"loop floor:      {floor:.2f} ms")
print(f"prep_slots:      {t_prep - floor:.2f} ms")
print(f"emission_tiles:  {t_em - floor:.2f} ms")
print(f"fb_scan_v2:      {t_fb - floor:.2f} ms")
print(f"stats_from_v2:   {t_stats - floor:.2f} ms")
print(f"turn_weights_v2: {t_turn - floor:.2f} ms")
