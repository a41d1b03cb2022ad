"""Wall-clock of full Driver.iterate at production scale, with span report.

Separates device scan time from host orchestration (gather, scatter,
flip solve, updates) to show where a real iteration goes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.utils import simulate_f2
from cnf2freq_tpu.utils.tracing import Tracer

B = int(os.environ.get("BENCH_B", 1000))
M = int(os.environ.get("BENCH_M", 192))
ITERS = int(os.environ.get("BENCH_ITERS", 3))

ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50),
                  seed=7)
drv = Driver(ped, dtype=np.float32)
drv.tracer = Tracer(sink=None)
t0 = time.perf_counter()
drv.preprocess()
t1 = time.perf_counter()
print(f"preprocess: {t1-t0:.2f}s", flush=True)

drv.iterate(early=True)   # compile + first
drv.iterate(early=False)  # compile the non-early stages too
t2 = time.perf_counter()
print(f"first iterates (compile): {t2-t1:.2f}s", flush=True)
drv.tracer = Tracer(sink=None)   # steady-state spans only
for i in range(ITERS):
    drv.iterate(early=False)
t3 = time.perf_counter()
print(f"steady iterate: {(t3-t2)/ITERS:.3f}s per iteration", flush=True)
print(drv.tracer.report())
