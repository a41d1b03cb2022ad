#!/usr/bin/env python
"""Benchmark: per-iteration throughput of the TPU framework vs the
reference binary's measured single-core doit rate.

Prints JSON result lines INCREMENTALLY (each a complete
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N} object,
flushed immediately; the LAST line printed is the round's result):

  1. scan-only throughput, as soon as the chained chromosome scan is
     timed — a cold-compile run that later hits its timeout has still
     produced a parsable result;
  2. the headline metric — one complete Driver.iterate (scan +
     coherence + phase flips + capped-GD updates) at the BASELINE
     workload — re-printed after EVERY timed iteration, upgrading the
     measurement while budget remains.

Wall-clock budget: BENCH_BUDGET_S (default 2700 s).  Stages check the
remaining budget before starting and shrink or skip themselves rather
than dying mid-flight with nothing printed (the round-4 failure mode:
rc=124, parsed: null).

The baseline denominator is the measured reference binary's doit rate
at this exact workload (bench/ref_rate.json, bench/ref_baseline.py);
fallback: bench/cpu_baseline.cc stand-in.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

B = int(os.environ.get("BENCH_B", 1000))
M = int(os.environ.get("BENCH_M", 192))
REPS = int(os.environ.get("BENCH_REPS", 3))
BUDGET = float(os.environ.get("BENCH_BUDGET_S", 2700))
_T0 = time.time()


def remaining() -> float:
    return BUDGET - (time.time() - _T0)


def emit(result: dict):
    print(json.dumps(result), flush=True)


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


def scan_stage(base, detail_common):
    """Chained chromosome-scan throughput; returns (rate, seconds)."""
    import jax
    import jax.numpy as jnp

    from cnf2freq_tpu.config import ModelConfig, RuntimeParams
    from cnf2freq_tpu.engine import chromosome_scan
    from cnf2freq_tpu.hmm.family import gather_family
    from cnf2freq_tpu.utils import simulate_f2

    import numpy as np

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

        return jax.lax.fori_loop(
            0, K, body, (jnp.float32(0.0), jnp.float32(0.0)))[1]

    fbj = fb.map(jnp.asarray)
    dj = jnp.asarray(dists)
    # explicit host readback: block_until_ready alone under-reports on
    # the tunneled axon platform
    _ = float(np.asarray(chained(fbj, dj)))   # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        _ = float(np.asarray(chained(fbj, dj)))
    dt = (time.perf_counter() - t0) / (REPS * K)
    rate = B * M / dt

    emit({
        "metric": "F2 chromosome-scan throughput (fwd-bwd + posterior "
                  "stats, 1k-individual workload; scan stage only)",
        "value": round(rate, 1),
        "unit": "individual-markers/s",
        "vs_baseline": round(rate / base, 1),
        "detail": dict(detail_common, stage="scan_only",
                       scan_only_seconds=round(dt, 4)),
    })
    return rate, dt


def full_stage(base, scan_rate, scan_dt, detail_common):
    """The headline metric: full end-to-end Driver.iterate (scan +
    coherence + flips + capped-GD updates + host orchestration) — the
    resident device-state path; steady state after compile.  Emits an
    upgraded result line after every timed iteration."""
    import numpy as np

    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.utils import simulate_f2

    ped = simulate_f2(n_f2=B, n_markers=M,
                      n_founder_pairs=max(1, B // 50), seed=7)
    drv = Driver(ped, dtype=np.float32)
    drv.preprocess()
    drv.iterate(early=True)
    drv.iterate(early=False)      # compile the non-early stages
    full_iters = int(os.environ.get("BENCH_FULL_ITERS", 5))
    times = []
    for _ in range(full_iters):
        if times and remaining() < 3 * max(times):
            break
        t0 = time.perf_counter()
        drv.iterate(early=False)
        times.append(time.perf_counter() - t0)
        full_dt = float(np.median(times))
        full_rate = B * M / full_dt
        emit({
            "metric": "F2 full-iteration throughput (complete Driver."
                      "iterate: scan+coherence+flips+updates, "
                      "1k-individual workload)",
            "value": round(full_rate, 1),
            "unit": "individual-markers/s",
            "vs_baseline": round(full_rate / base, 1),
            "detail": dict(
                detail_common,
                stage="full_iteration",
                full_iteration_seconds=round(full_dt, 4),
                full_iterations_timed=len(times),
                scan_only_seconds=round(scan_dt, 4),
                scan_only_ind_markers_per_s=round(scan_rate, 1),
                scan_only_vs_baseline=round(scan_rate / base, 1)),
        })


def main():
    _check_tunnel()
    import jax

    refrate, refinfo = reference_rate()
    base = refrate if refrate else cpu_baseline_rate()
    detail_common = {
        "B": B, "M": M,
        "baseline_source": ("measured reference binary "
                            "(bench/ref_rate.json)" if refrate
                            else "cpu_baseline.cc stand-in"),
        "reference_ind_markers_per_s": refrate,
        "device": str(jax.devices()[0]),
        "dtype": "float32",
    }

    scan_rate, scan_dt = scan_stage(base, detail_common)

    # the full stage needs preprocess (~200 s at B=1000) + per-stage
    # compiles (minutes cold, seconds behind the persistent cache) —
    # only start it with a believable budget left
    if remaining() < float(os.environ.get("BENCH_FULL_MIN_S", 300)):
        print("# budget exhausted after scan stage; scan-only result "
              "stands", file=sys.stderr)
        return
    full_stage(base, scan_rate, scan_dt, detail_common)


if __name__ == "__main__":
    main()
