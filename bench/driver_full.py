#!/usr/bin/env python
"""Full-driver benchmark: steady-state Driver.iterate on a
multi-chromosome cohort, plus a memory-scaling datapoint with the
auto-chunked batch streaming.

Complements bench.py (single-chromosome device-scan throughput) with
the production-shaped numbers the round-1 verdict asked for: a measured
full-driver rate on a multi-chromosome cohort and a large-cohort
streaming run bounded by hbm_budget_bytes.

Run on the TPU host:  python bench/driver_full.py
Emits JSON lines; exits nonzero on failure.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(B, M, n_chrom, iters, hbm_budget=None, label=""):
    import jax

    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.utils import simulate_f2

    ped = simulate_f2(n_f2=B, n_markers=M, n_chromosomes=n_chrom,
                      n_founder_pairs=max(1, B // 50),
                      missing_rate=0.2, error_rate=0.02, seed=5)
    drv = Driver(ped, dtype=np.float32)
    if hbm_budget is not None:
        drv.hbm_budget_bytes = hbm_budget
    t0 = time.perf_counter()
    drv.preprocess()
    t_pre = time.perf_counter() - t0
    drv.iterate(early=True)         # compile + first pass
    t0 = time.perf_counter()
    drv.iterate(early=False)        # compile the full pass
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    drv.iterate(early=False)
    t_steady = time.perf_counter() - t0
    rate = B * M * n_chrom / t_steady
    chunk = drv._chunk_size(len(ped.dous), M)
    rec = {"bench": "driver_full", "label": label, "B": B, "M": M,
           "chromosomes": n_chrom,
           "steady_s_per_iteration": round(t_steady, 3),
           "first_s": round(t_first, 1),
           "preprocess_s": round(t_pre, 1),
           "ind_markers_per_s": round(rate, 1),
           "chunk_size": chunk,
           "chunks": -(-len(ped.dous) // chunk),
           "device": str(jax.devices()[0])}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    # production-shaped: 1k individuals x 5 chromosomes x 192 markers
    run(1000, 192, 5, 2, label="multi-chromosome")
    # memory-scaling: 8k individuals streamed through a 4 GiB budget
    # (forces several chunks; validates bounded-HBM streaming at scale)
    run(8192, 192, 1, 2, hbm_budget=4 * 1024 ** 3, label="streamed-8k")
    return 0


if __name__ == "__main__":
    sys.exit(main())
