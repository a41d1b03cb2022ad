#!/usr/bin/env python
"""Measure the ACTUAL reference binary's per-iteration (doit) throughput.

Builds the in-container reference (refbaseline/build_ref.py) if needed,
generates a PlantImpute-format F2 cohort, times `--count 1` (load +
postmarkerdata only — the reference main loop runs no doit on iteration
0) and `--count 1+N`, and reports

    rate = dous * markers * N / (t(count=1+N) - t(count=1))

in analysis-individual-markers/s.  Writes bench/ref_rate.json, which
bench.py prefers over the cpu_baseline.cc stand-in as the vs_baseline
denominator (VERDICT round-1 item 3).

Usage: python bench/ref_baseline.py [n_f2] [n_markers] [N] [threads]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def run_ref(mapf, pedf, genf, count, workdir, threads):
    from cnf2freq_tpu.utils.refparity import REF_BINARY, REFBUILD
    env = dict(os.environ)
    env["OMP_NUM_THREADS"] = str(threads)
    env["OMP_STACKSIZE"] = "128M"
    env["PATH"] = REFBUILD + os.pathsep + env.get("PATH", "")
    t0 = time.perf_counter()
    subprocess.run(
        [REF_BINARY, "--mapfile", mapf, "--pedfile", pedf,
         "--genfile", genf, "--output", os.path.join(workdir, "out.txt"),
         "--count", str(count), "--tmppath", workdir],
        env=env, check=True, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    return time.perf_counter() - t0


def main():
    n_f2 = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    n_markers = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from cnf2freq_tpu.utils import refparity as rp
    from cnf2freq_tpu.utils.simulate import simulate_plantimpute_files
    if not rp.have_reference():
        rp.build_reference()

    work = tempfile.mkdtemp(prefix="refbench_")
    mapf, pedf, genf, _ = simulate_plantimpute_files(
        work, n_f2=n_f2, n_markers=n_markers, spacing_cm=1.0,
        missing_rate=0.3, error_rate=0.02, seed=11)

    t_setup = run_ref(mapf, pedf, genf, 1, work, threads)
    t_full = run_ref(mapf, pedf, genf, 1 + N, work, threads)
    per_doit = (t_full - t_setup) / N
    rate = n_f2 * n_markers / per_doit
    out = {
        "ind_markers_per_s": round(rate, 1),
        "seconds_per_doit": round(per_doit, 2),
        "setup_seconds": round(t_setup, 2),
        "n_f2": n_f2, "n_markers": n_markers, "doits": N,
        "omp_threads": threads,
        "binary": "refbaseline (g++ -O2 -ffast-math -fopenmp, "
                  "demo.sh:6 flags)",
    }
    with open(os.path.join(HERE, "ref_rate.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
