#!/usr/bin/env python
"""Benchmark: one full per-iteration chromosome scan on the accelerator vs
the reference's single-core CPU cost structure.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the per-iteration compute of a 1000-individual F2
chromosome scan (BASELINE.json config): emissions, forward-backward over
all shift modes, posterior update statistics (haplotype + genotype), turn
likelihoods.  The baseline denominator is bench/cpu_baseline.cc — a fresh
single-core implementation of the reference's per-iteration algorithm
(per-probe emission recursions, dense 64x64 transitions), timed on this
host.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

B = int(os.environ.get("BENCH_B", 1000))
M = int(os.environ.get("BENCH_M", 192))
REPS = int(os.environ.get("BENCH_REPS", 5))


def reference_rate():
    """(rate, source): the measured ACTUAL reference binary's doit rate
    (bench/ref_baseline.py -> bench/ref_rate.json) when available."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "bench", "ref_rate.json")
    try:
        with open(path) as f:
            d = json.load(f)
        return float(d["ind_markers_per_s"]), d
    except Exception:
        return None, None


def cpu_baseline_rate() -> float:
    """individual*markers/s of the reference-equivalent single-core CPU
    implementation (measured, small workload, linear extrapolation)."""
    here = os.path.dirname(os.path.abspath(__file__))
    binpath = os.path.join(here, "bench", "cpu_baseline")
    src = os.path.join(here, "bench", "cpu_baseline.cc")
    try:
        if not os.path.exists(binpath) or \
                os.path.getmtime(binpath) < os.path.getmtime(src):
            subprocess.run(["g++", "-O3", "-march=native", "-ffast-math",
                            "-o", binpath, src], check=True,
                           capture_output=True)
        out = subprocess.run([binpath, "4", "128"], check=True,
                             capture_output=True, text=True,
                             timeout=300).stdout
        return float(json.loads(out)["ind_markers_per_s"])
    except Exception as e:  # toolchain unavailable: recorded fallback
        print(f"# cpu baseline unavailable ({e}); using recorded rate",
              file=sys.stderr)
        return 1400.0


def _check_tunnel():
    """Fail fast when the axon TPU tunnel is dead: jax backend init
    would otherwise hang forever (observed during an infra outage).
    Probe = one trivial device op in a timeout-bounded subprocess (the
    claim releases when it exits, so the main process can proceed)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "jnp.ones(2).sum().block_until_ready()"],
            timeout=180, check=True, capture_output=True)
    except subprocess.TimeoutExpired:
        print("# axon tunnel unresponsive (device probe timed out); "
              "refusing to hang", file=sys.stderr)
        sys.exit(3)
    except subprocess.CalledProcessError as e:
        print(f"# device probe failed: {e.stderr.decode()[-300:]}",
              file=sys.stderr)
        sys.exit(3)


def main():
    _check_tunnel()
    import jax
    import jax.numpy as jnp

    from cnf2freq_tpu.config import ModelConfig, RuntimeParams
    from cnf2freq_tpu.engine import chromosome_scan
    from cnf2freq_tpu.hmm.family import gather_family
    from cnf2freq_tpu.utils import simulate_f2

    dtype = np.float32
    ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50),
                      seed=7)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=dtype)
    dists = np.diff(ped.markerposes).astype(dtype)

    cfg = ModelConfig()
    params = RuntimeParams()

    # K chained scans per jit call: one outer iteration of a production
    # run scans every chromosome back-to-back with no host sync, so the
    # per-dispatch tunnel latency (~43 ms on the axon tunnel, measured in
    # bench/floor_probe.py) amortizes exactly like this in real use.  A
    # data dependency between reps prevents XLA from CSE-merging them.
    K = int(os.environ.get("BENCH_K", 10))

    @jax.jit
    def chained(batch, d):
        def body(i, carry):
            eps, acc = carry
            out = chromosome_scan(batch, d + eps, cfg, params)
            s = out.total.sum() + out.inf_accum.sum() \
                + out.haplo_b12.sum() + out.turn_weight.sum() \
                + out.pair.sum()
            return (s * 1e-30, acc + s)

        import jax.numpy as jnp_
        return jax.lax.fori_loop(
            0, K, body, (jnp_.float32(0.0), jnp_.float32(0.0)))[1]

    fbj = fb.map(jnp.asarray)
    dj = jnp.asarray(dists)
    # explicit host readback: block_until_ready alone under-reports on
    # the tunneled axon platform
    _ = float(np.asarray(chained(fbj, dj)))   # compile + warm
    t0 = time.perf_counter()
    sink = 0.0
    for _ in range(REPS):
        sink += float(np.asarray(chained(fbj, dj)))
    dt = (time.perf_counter() - t0) / (REPS * K)

    rate = B * M / dt
    standin = cpu_baseline_rate()
    refrate, refinfo = reference_rate()
    base = refrate if refrate else standin

    # full end-to-end Driver.iterate (scan + coherence + flips +
    # capped-GD updates + host orchestration) — the resident
    # device-state path; steady state after compile
    from cnf2freq_tpu.driver import Driver
    ped2 = simulate_f2(n_f2=B, n_markers=M,
                       n_founder_pairs=max(1, B // 50), seed=7)
    drv = Driver(ped2, dtype=np.float32)
    drv.preprocess()
    drv.iterate(early=True)
    drv.iterate(early=False)      # compile the non-early stages
    t0 = time.perf_counter()
    full_iters = int(os.environ.get("BENCH_FULL_ITERS", 3))
    for _ in range(full_iters):
        drv.iterate(early=False)
    full_dt = (time.perf_counter() - t0) / full_iters
    full_rate = B * M / full_dt

    result = {
        "metric": "F2 full-iteration throughput (complete Driver."
                  "iterate: scan+coherence+flips+updates, 1k-individual"
                  " workload)",
        "value": round(full_rate, 1),
        "unit": "individual-markers/s",
        "vs_baseline": round(full_rate / base, 1),
        "detail": {
            "B": B, "M": M,
            "full_iteration_seconds": round(full_dt, 4),
            "scan_only_seconds": round(dt, 4),
            "scan_only_ind_markers_per_s": round(rate, 1),
            "scan_only_vs_baseline": round(rate / base, 1),
            "baseline_source": ("measured reference binary "
                                "(bench/ref_rate.json)" if refrate
                                else "cpu_baseline.cc stand-in"),
            "reference_ind_markers_per_s": refrate,
            "cpu_standin_ind_markers_per_s": round(standin, 1),
            "device": str(jax.devices()[0]),
            "dtype": "float32",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
