"""Forced-sync itemization of the resident iterate at B=1000, M=192:
each stage's dispatch+compute+readback cost measured in isolation, for
the docs/PERFORMANCE.md budget table."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.utils import simulate_f2
from cnf2freq_tpu.utils.tracing import Tracer

B = int(os.environ.get("BENCH_B", 1000))
M = int(os.environ.get("BENCH_M", 192))


class SyncTracer(Tracer):
    """Drain the device queue at every span exit (host readback of a
    fresh op — block_until_ready under-reports on the tunnel), so span
    totals are true per-stage costs instead of first-readback pileups."""

    import contextlib

    @contextlib.contextmanager
    def span(self, name):
        import jax.numpy as jnp
        with super().span(name):
            try:
                yield
            finally:
                float(np.asarray(jnp.zeros(()) + 1))


ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50),
                  seed=7)
drv = Driver(ped, dtype=np.float32)
t0 = time.perf_counter()
drv.preprocess()
print(f"preprocess: {time.perf_counter()-t0:.2f}s", flush=True)
drv.iterate(early=True)
drv.iterate(early=False)
drv.tracer = SyncTracer(sink=None)
t0 = time.perf_counter()
N = 3
for _ in range(N):
    drv.iterate(early=False)
dt = (time.perf_counter() - t0) / N
print(f"steady (sync-traced): {dt:.3f}s/iter", flush=True)
print(drv.tracer.report())
