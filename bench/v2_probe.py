"""Stage-by-stage timing of the v2 scan path on the live backend."""
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
dtype = np.float32

ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50),
                  seed=7)
for ind in ped.inds[1:]:
    ped.fixtrees(ind.n)
ped.count_descendants()
fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=dtype)
dists = jnp.asarray(np.diff(ped.markerposes).astype(dtype))
cfg = ModelConfig()
params = RuntimeParams()
fbj = fb.map(jnp.asarray)


def timed(name, fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    out = jax.tree.map(lambda x: x.block_until_ready()
                       if hasattr(x, "block_until_ready") else x, out)
    t1 = time.perf_counter()
    for _ in range(3):
        out = fn(*args, **kw)
        out = jax.tree.map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    t2 = time.perf_counter()
    print(f"{name}: compile+first {t1-t0:.2f}s, steady {(t2-t1)/3*1000:.1f}ms",
          flush=True)
    return out


st = timed("prep_slots", jax.jit(lambda f: v2.prep_slots(f, jnp.float32)),
           fbj)
R = st.nb * 1024
e = timed("emission_tiles", v2.emission_tiles, st, M, cfg, jnp.float32)
e_flat = e.reshape(M, 512, R)
scan_j = jax.jit(lambda e_, d: v2.fb_scan_v2(e_, d, cfg, params))
fb2 = timed("fb_scan_v2", scan_j, e_flat, dists)
tot_j = jax.jit(lambda f, s: v2.combined_loglik_v2(f, s))
total = timed("loglik", tot_j, fb2, st.sh)
stats_j = jax.jit(lambda s_, f_, t_: v2.stats_from_v2(s_, f_, t_, M, B,
                                                      cfg, jnp.float32))
timed("stats_from_v2", stats_j, st, fb2, total)
turn_j = jax.jit(lambda f_, s_, d_: v2.turn_weights_v2(f_, s_, d_, cfg, B))
timed("turn_weights_v2", turn_j, fb2, st.sh,
      jnp.asarray(fb.descendants.astype(dtype)))
