"""Mask-impute-compare harness (the readqtlmas-style experiment,
cnF2freq.cpp:2517-2748) on a synthetic F2 cohort."""

import numpy as np

from cnf2freq_tpu.config import UNKNOWN
from cnf2freq_tpu.utils import (mask_markers, run_experiment,
                                score_recovery, simulate_f2)


def test_mask_and_score_roundtrip():
    ped = simulate_f2(n_f2=6, n_markers=20, missing_rate=0.0,
                      error_rate=0.0, seed=1)
    res = mask_markers(ped, every=5, phase=2)
    assert res.masked, "something must be masked"
    for n, m in res.masked:
        assert m % 5 == 2
        ind = ped.by_id(n)
        assert int(ind.markerdata[m, 0]) == UNKNOWN
    # restore truth manually -> perfect score
    for (n, m), (a, b) in res.truth.items():
        ped.by_id(n).markerdata[m] = (a, b)
        ped.by_id(n).markersure[m] = (0.0, 0.0)
    s = score_recovery(ped, res)
    assert s["call_rate"] == 1.0 and s["accuracy"] == 1.0


def test_imputation_recovers_masked_markers():
    ped = simulate_f2(n_f2=8, n_markers=24, marker_spacing_cm=2.0,
                      missing_rate=0.0, error_rate=0.0, seed=3)
    out = run_experiment(ped, every=8, iterations=4)
    assert out["total"] >= 8
    # dense flanking data on an error-free F2 cross: most held-out sites
    # should be recovered correctly.  Without priors at held-out sites
    # (the reference's masking blanks them, cnF2freq.cpp:7563-7564) the
    # markersure equilibrium sits above the strict 0.2 call threshold,
    # so recovery is judged at majority confidence (measured: 96%)
    assert out["majority_call_rate"] > 0.9, out
    assert out["majority_accuracy"] > 0.85, out
