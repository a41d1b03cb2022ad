"""RELSKEWSTATES model family vs golden (coherence state bit,
settings.h:16; trackpossible pinning cnF2freq.cpp:1148-1154; relscore
transitions cnF2freq.cpp:2343-2362)."""

import numpy as np
import pytest

from cnf2freq_tpu import ModelConfig, Pedigree
from cnf2freq_tpu.config import MINFACTOR, RuntimeParams
from cnf2freq_tpu.golden import GoldenEngine
from cnf2freq_tpu.hmm import gather_family
from cnf2freq_tpu.models.relskew_states import (
    relstate_emission, relstate_forward_backward, relstate_scan)

CFG = ModelConfig(relskewstates=True)


def rel_pedigree(seed=0, M=6):
    rng = np.random.default_rng(seed)
    ped = Pedigree(CFG)
    ped.markerposes = np.linspace(0.0, 50.0, M)
    ped.chromstarts = [0, M]
    names = ["gp00", "gp01", "gp10", "gp11", "par0", "par1", "kid"]
    by = {nm: ped.getind(nm) for nm in names}
    ped.freeze()
    by["par0"].pars = (by["gp00"].n, by["gp01"].n)
    by["par1"].pars = (by["gp10"].n, by["gp11"].n)
    by["kid"].pars = (by["par0"].n, by["par1"].n)
    for nm, ind in by.items():
        ind.empty = False
        ind.markerdata[:] = rng.integers(0, 3, size=(M, 2))
        ind.markersure[:] = np.where(
            ind.markerdata == 0, 0.0, rng.uniform(0.0, 0.3, size=(M, 2)))
        ind.haploweight[:] = rng.uniform(0.05, 0.95, size=M)
        ind.relhaplo[:] = rng.uniform(0.1, 0.9, size=M)
    by["kid"].gen = 2
    ped.dous = [by["kid"].n]
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    return ped, by["kid"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_relstate_fb_matches_golden(seed):
    import jax.numpy as jnp
    ped, kid = rel_pedigree(seed)
    cfg, params = ped.config, RuntimeParams()
    M = ped.num_markers
    eng = GoldenEngine(ped)
    gold = {s: eng.fwbw(kid, 0, M - 1, s) for s in range(cfg.numshifts)}

    fb = gather_family(ped, ped.dous, 0, M - 1)
    dists = jnp.asarray(np.diff(ped.markerposes))
    relh = kid.relhaplo[None, :M - 1]
    e = relstate_emission(fb, cfg)
    fbres = relstate_forward_backward(e, dists, relh, cfg, params)
    S2 = 2 * cfg.numtypes
    for s in range(cfg.numshifts):
        got = np.asarray(fbres.fw_post_f[0, -1, s])
        want = gold[s]["fw_post_f"][-1]
        if want <= MINFACTOR:
            assert got <= MINFACTOR / 2
            continue
        np.testing.assert_allclose(got, want, rtol=1e-9,
                                   err_msg=f"shift {s}")
        for m in range(M):
            np.testing.assert_allclose(
                np.asarray(fbres.fw_post[0, m, :, s]),
                gold[s]["fw_post"][m], rtol=1e-9, atol=1e-12,
                err_msg=f"shift {s} marker {m}")


def test_relstate_coherent_limit():
    """relhaplo == 1 everywhere: the coherence bit cannot switch, so the
    chromosome-wide posterior of the bit stays constant and the total
    likelihood equals the base model restricted to coherent paths."""
    import jax.numpy as jnp
    ped, kid = rel_pedigree(seed=5)
    M = ped.num_markers
    kid.relhaplo[:] = 1.0
    fb = gather_family(ped, ped.dous, 0, M - 1)
    dists = jnp.asarray(np.diff(ped.markerposes))
    relh = kid.relhaplo[None, :M - 1]
    total, post, p1 = relstate_scan(fb, dists, relh, ped.config,
                                    RuntimeParams())
    p1 = np.asarray(p1)[0]
    assert np.all(np.abs(p1 - p1[0]) < 1e-9), \
        "coherence-bit posterior must be constant when relhaplo == 1"
