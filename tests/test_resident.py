"""Device-resident fast path (resident.py) pinned against the classic
host-accumulator path: same scans, same update kernels, f64 adds in the
same order — the two must agree to float-identity on CPU."""

import numpy as np
import pytest

from cnf2freq_tpu.config import ModelConfig
from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.utils import simulate_f2
from cnf2freq_tpu.utils.simulate import simulate_selfed


def _run(ped_fn, resident, iters=3, **drv_kw):
    ped = ped_fn()
    drv = Driver(ped, dtype=np.float64, **drv_kw)
    drv.resident = resident
    drv.preprocess()
    infos = [drv.iterate(early=(i == 0)) for i in range(iters)]
    state = dict(
        infos=infos,
        hw=np.stack([ped.by_id(n).haploweight for n in ped.dous]),
        md=np.stack([ped.by_id(n).markerdata for n in ped.dous]),
        ms=np.stack([ped.by_id(n).markersure for n in ped.dous]),
        pair=np.stack([drv.pair_tables[n] for n in ped.dous]),
    )
    if ped.by_id(ped.dous[0]).relhaplo is not None:
        state["rh"] = np.stack([ped.by_id(n).relhaplo for n in ped.dous])
    return state


def _compare(a, b, tol):
    assert a["infos"] == b["infos"]
    for k in a:
        if k == "infos":
            continue
        np.testing.assert_allclose(a[k], b[k], atol=tol, rtol=0,
                                   err_msg=k)


def test_resident_matches_classic_f2():
    def mk():
        return simulate_f2(n_f2=24, n_markers=24, n_founder_pairs=2,
                           seed=3)
    # identical adds in identical order: expect float equality
    _compare(_run(mk, False), _run(mk, True), tol=1e-13)


def test_resident_matches_classic_multichrom():
    def mk():
        return simulate_f2(n_f2=16, n_markers=12, n_founder_pairs=2,
                           seed=11, n_chromosomes=2)
    _compare(_run(mk, False), _run(mk, True), tol=1e-13)


def test_resident_matches_classic_selfing():
    def mk():
        return simulate_selfed(n_lines=8, n_markers=12, generations=4,
                               seed=5)
    # extended space: in-scan coherence scatter uses segment-sum whose
    # f64 summation order differs from the host np.add.at loop
    _compare(_run(mk, False), _run(mk, True), tol=1e-9)


def test_resident_flip_mirror():
    """A run whose winners include actual flips must keep the device
    haplobase mirror consistent (hb inversion about hc)."""
    ped = simulate_f2(n_f2=24, n_markers=24, n_founder_pairs=2, seed=3)
    drv = Driver(ped, dtype=np.float64)
    drv.resident = True
    drv.preprocess()
    infos = [drv.iterate(early=(i == 0)) for i in range(4)]
    assert any(i["inverted"] for i in infos), \
        "fixture no longer exercises the flip path"


def test_resident_pair_tables_lazy():
    ped = simulate_f2(n_f2=12, n_markers=12, seed=1)
    drv = Driver(ped, dtype=np.float64)
    drv.resident = True
    drv.preprocess()
    drv.iterate(early=True)
    assert drv._pair_pending        # device-pending before access
    tab = drv.pair_tables[ped.dous[0]]
    assert not drv._pair_pending    # flushed by the read
    assert tab.shape == (ped.num_markers, 2, 2)
    s = tab.sum(axis=(1, 2))
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
