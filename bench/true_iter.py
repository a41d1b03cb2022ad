"""True per-iteration scan cost: K data-dependent chained scans in one
jit call amortize the ~43 ms tunnel dispatch floor."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.engine import chromosome_scan
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.utils import simulate_f2

B = int(os.environ.get("BENCH_B", 1000))
M = int(os.environ.get("BENCH_M", 192))
K = int(os.environ.get("BENCH_K", 10))

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


@jax.jit
def chained(fb, d):
    def body(i, carry):
        eps, acc = carry
        out = chromosome_scan(fb, d + eps, cfg, params)
        s = out.total.sum() + out.inf_accum.sum() + out.haplo_b12.sum() \
            + out.turn_weight.sum() + out.pair.sum()
        # data dependency: next rep's dists perturbed by this rep's result
        return (s * 1e-30, acc + s)

    return jax.lax.fori_loop(0, K, body, (jnp.float32(0.0),
                                          jnp.float32(0.0)))[1]


_ = float(np.asarray(chained(fbj, dj)))
t0 = time.perf_counter()
s = float(np.asarray(chained(fbj, dj)))
dt = (time.perf_counter() - t0 - 0.043) / K
print(f"true per-scan: {dt*1e3:.1f} ms  -> {B*M/dt:,.0f} ind-markers/s")
