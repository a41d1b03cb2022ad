"""Extended-state-space parity against RECOMPILED reference binaries.

Round-3 verdict gap #2: SELFING / RELSKEWSTATES iterations were pinned
only to the golden spec, which itself had been validated against the
compiled reference for the *default* build — a shared misreading of the
extended emission semantics could pass every test.  Here the reference
is recompiled with the actual settings blocks
(refbaseline/build_ref.py patch_settings; settings.h:14-16, 21-23) and
its REFTRACE instrumentation replayed:

* PRB — every per-(marker, state, path, shift) posterior probe of the
  doit scan loop (cnF2freq.cpp:5543 + instrumentation),
* ACC/INF — the per-individual haplobase/haplocount/infprobs
  accumulators entering the parameter-update phase
  (cnF2freq.cpp:5875-5903),
* the initial dump block (postmarkerdata preprocessing state).

compared against the golden full-iteration spec (golden/doit.py) on the
same cohort — the same spec the tensorized engine_ext is pinned to at
1e-10 (tests/test_engine_ext.py), closing the chain
engine_ext == golden == compiled C++.

Variant binaries build once into .refbuild_selfing/ and
.refbuild_relskewstates/ (~1 min each); tests skip when the base
.refbuild oracle is absent.
"""

import numpy as np
import pytest

from cnf2freq_tpu.config import ModelConfig
from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.golden.doit import GoldenDoit
from cnf2freq_tpu.io.alpha import load_plantimpute
from cnf2freq_tpu.utils import refparity as rp
from cnf2freq_tpu.utils.simulate import (simulate_plantimpute_files,
                                         simulate_plantimpute_selfed_files)

pytestmark = pytest.mark.skipif(
    not rp.have_reference(),
    reason="instrumented reference binary not built (.refbuild)")


def _ensure_variant(variant):
    if not rp.have_variant(variant):
        rp.build_variant(variant)
    return rp.variant_binary(variant)


def _compare_traces(ped, cfg, traces, probe_atol=1e-9, acc_atol=1e-9):
    """GoldenDoit scan vs the binary's REFTRACE of its single doit."""
    gd = GoldenDoit(ped)
    gd.eng.correction_inference = cfg.correction_inference
    acc = gd.scan(collect_probes=True)

    # probes: every PRB entry must match the golden probe, and vice
    # versa for probes above the print threshold
    prb = traces["prb"]
    assert prb, "no PRB probes traced"
    checked = 0
    for (n, m, g, flag2, s), val in prb.items():
        want = acc.probes.get((n, m, g, flag2, s), 0.0)
        assert abs(val - want) < probe_atol, \
            (n, m, g, flag2, s, val, want)
        checked += 1
    assert checked > 50
    extra = {k: v for k, v in acc.probes.items()
             if k not in prb and v > 1e-7}
    assert not extra, f"golden probes the binary never made: " \
        f"{list(extra)[:5]}"

    # accumulators entering the update phase
    for (i, m), (hb, hc, _ns) in traces["acc"].items():
        ghb = acc.haplobase.get(i, np.zeros(ped.num_markers))[m]
        ghc = acc.haplocount.get(i, np.zeros(ped.num_markers))[m]
        assert abs(hb - ghb) < acc_atol, (i, m, hb, ghb)
        assert abs(hc - ghc) < acc_atol, (i, m, hc, ghc)
    for (i, m, side, mv), v in traces["inf"].items():
        tab = acc.infprobs.get(i)
        gv = tab[m][side].get(mv, 0.0) if tab else 0.0
        assert abs(v - gv) < acc_atol, (i, m, side, mv, v, gv)
    n_acc = len(traces["acc"])
    n_inf = len(traces["inf"])
    assert n_acc > 10 and n_inf > 10, (n_acc, n_inf)


def test_selfing_binary_parity(tmp_path):
    binary = _ensure_variant("selfing")
    work = str(tmp_path)
    mapf, pedf, genf, _ = simulate_plantimpute_selfed_files(
        work, n_lines=6, n_markers=8, generations=4, seed=1)
    M = 9
    iters, traces = rp.run_reference_traced(
        mapf, pedf, genf, 2, work, M, binary=binary)

    cfg = ModelConfig(selfing=True)
    ped = load_plantimpute(mapf, pedf, genf, config=cfg)
    drv = Driver(ped, dtype=np.float64)
    drv.mask_mode = "reference"
    drv.adaptive_relhaplo = False
    drv.preprocess()

    # initial block: postmarkerdata preprocessing state parity
    dev = rp.compare(iters[0], rp.state_from_pedigree(ped))
    assert dev["genotype_mismatches"] == 0, dev
    assert dev["markersure"] < 1e-9, dev

    _compare_traces(ped, cfg, traces)


def test_relskewstates_binary_parity(tmp_path):
    """RELSKEWSTATES vs the recompiled binary: the 128-state EMISSION
    layer (coherence bit pinning the root interpretation, no root
    collapse, member-scoped ignoreflag2) is pinned EXACTLY via the
    REFTRACE11 per-state emission trace and the preprocessing state.

    The TRANSITION layer: round 4 read ``iter == tofind``
    (cnF2freq.cpp:2343-2346) as "relscore fires only at a probe's lock
    interval".  Round 5's replay corrected that: ``iter`` is the
    INTRA-interval segment index (the ``for iter <= (int)tofind`` loop,
    cnF2freq.cpp:2255-2265), so on every ordinary interval tofind==0
    and ``iter == tofind`` is TRUE — the reference applies the
    relhaplo-weighted coherence factor on EVERY whole interval, exactly
    the persistent-state semantics this framework's redesign
    (models/relskew_states.py) uses; it is skipped only on the
    pre-lock segment of a probe-split interval (a sub-interval
    refinement that cannot occur for marker-locked fb probes).  A
    full probe-trace replay (PRB vs GoldenDoit, bench-level experiment
    in docs/ROUND5_NOTES.md) still shows structural deviations in the
    128-state probe posteriors (~2x families of ratios) that neither
    the persistent nor a free-mixing golden transition reproduces —
    the remaining delta is in the reference's 128-state probe
    normalisation, documented as an open corner; emissions and
    preprocessing remain pinned exactly below."""
    binary = _ensure_variant("relskewstates")
    work = str(tmp_path)
    # seed chosen for a tie-free variance profile: the lockhaplos
    # anchor (argmax of variances) is reproduced exactly, aligning the
    # initial haploweights the emissions depend on
    mapf, pedf, genf, _ = simulate_plantimpute_files(
        work, n_f2=8, n_markers=10, seed=1, genotyped_f1=2,
        error_rate=0.05, missing_rate=0.15)
    M = 11
    iters, traces = rp.run_reference_traced(
        mapf, pedf, genf, 2, work, M, binary=binary,
        trace_env={"REFTRACE11": "1"})

    cfg = ModelConfig(relskewstates=True)
    ped = load_plantimpute(mapf, pedf, genf, config=cfg)
    drv = Driver(ped, dtype=np.float64)
    drv.mask_mode = "reference"
    drv.adaptive_relhaplo = False
    drv.preprocess()

    # initial block: full preprocessing parity incl. the variance-driven
    # phase anchors
    dev = rp.compare(iters[0], rp.state_from_pedigree(ped))
    assert dev["genotype_mismatches"] == 0, dev
    assert dev["markersure"] < 1e-9, dev
    assert dev["haploweight"] < 1e-9, dev

    # per-(ind, marker, state, shift) emission parity over the full
    # 128-state extended space
    from cnf2freq_tpu.golden.engine import GoldenEngine
    eng = GoldenEngine(ped)
    eng.correction_inference = cfg.correction_inference
    emi = {}
    with open(work + "/ref_stderr.log") as f:
        for line in f:
            p = line.split()
            if p and p[0] == "EMI":
                emi[(int(p[1]), int(p[2]), int(p[3]), int(p[4]))] = \
                    float(p[5])
    assert len(emi) > 10000
    cache = {}
    for (n, m, g, s), v in emi.items():
        ind = ped.by_id(n)
        if ind is None:
            continue
        key = (n, m, s)
        if key not in cache:
            cache[key] = eng.emission(ind, m, s, -1)
        want = cache[key][g]
        assert abs(v - want) < 1e-9 * max(1.0, v, want), \
            (n, m, g, s, v, want)
