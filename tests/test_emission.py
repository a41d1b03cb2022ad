"""Tensorized emission vs the golden scalar engine, on the demo data and
on randomized pedigrees."""

import numpy as np
import pytest

from cnf2freq_tpu import ModelConfig, Pedigree
from cnf2freq_tpu.golden import GoldenEngine
from cnf2freq_tpu.hmm import emission_all, gather_family


def golden_e_all(eng, ind, markers):
    """[M, NS, S] to match the state-minor emission layout."""
    cfg = eng.cfg
    out = np.zeros((len(markers), cfg.numshifts, cfg.numtypes))
    for mi, m in enumerate(markers):
        for s in range(cfg.numshifts):
            out[mi, s, :] = eng.emission(ind, m, s)
    return out


def test_demo_emission_all(demo_pedigree):
    ped = demo_pedigree
    eng = GoldenEngine(ped)
    # run fixtrees for everyone first (postmarkerdata order) so founder
    # flags are set as in the reference before the scan
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1)
    e = np.asarray(emission_all(fb, ped.config))
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        gold = golden_e_all(eng, ind, range(ped.num_markers))
        np.testing.assert_allclose(e[b], gold, rtol=1e-12, atol=1e-15,
                                   err_msg=f"individual {ind.name}")


def random_pedigree(rng, with_errors=True, missing=()):
    """Three-generation family with randomized genotypes/weights.

    missing: subset of {'gp00','gp01','gp10','gp11','par0','par1'} to drop.
    """
    ped = Pedigree(ModelConfig())
    M = 5
    ped.markerposes = np.linspace(0, 40, M)
    ped.chromstarts = [0, M]
    names = ["gp00", "gp01", "gp10", "gp11", "par0", "par1", "kid"]
    by = {nm: ped.getind(nm) for nm in names if nm not in missing}
    ped.freeze()
    if "par0" in by:
        by["par0"].pars = (by["gp00"].n if "gp00" in by else 0,
                           by["gp01"].n if "gp01" in by else 0)
    if "par1" in by:
        by["par1"].pars = (by["gp10"].n if "gp10" in by else 0,
                           by["gp11"].n if "gp11" in by else 0)
    by["kid"].pars = (by["par0"].n if "par0" in by else 0,
                      by["par1"].n if "par1" in by else 0)
    for nm, ind in by.items():
        ind.empty = False
        ind.markerdata[:] = rng.integers(0, 3, size=(M, 2))  # 0=unknown,1,2
        if with_errors:
            ind.markersure[:] = np.where(ind.markerdata > 0,
                                         rng.uniform(0, 0.3, size=(M, 2)),
                                         0.0)
        ind.haploweight[:] = rng.uniform(0.05, 0.95, size=M)
    ped.dous = [by["kid"].n]
    return ped, by


@pytest.mark.parametrize("missing", [
    (), ("gp00",), ("gp10", "gp11"), ("par1",), ("par0", "par1"),
    ("gp00", "gp01", "gp10", "gp11")])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_families(seed, missing):
    rng = np.random.default_rng(seed * 100 + len(missing))
    ped, by = random_pedigree(rng, missing=missing)
    eng = GoldenEngine(ped)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1)
    e = np.asarray(emission_all(fb, ped.config))
    gold = golden_e_all(eng, by["kid"], range(ped.num_markers))
    np.testing.assert_allclose(e[0], gold, rtol=1e-12, atol=1e-15)


def test_correction_inference_mode(demo_pedigree):
    ped = demo_pedigree
    eng = GoldenEngine(ped)
    eng.correction_inference = True
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    fb = gather_family(ped, ped.dous, 0, 5)
    e = np.asarray(emission_all(fb, ped.config, ci=True))
    for b, n in enumerate(ped.dous):
        gold = golden_e_all(eng, ped.by_id(n), range(6))
        np.testing.assert_allclose(e[b], gold, rtol=1e-12, atol=1e-15)
