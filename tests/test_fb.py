"""Forward-backward sweeps vs the golden engine."""

import numpy as np
import pytest

from cnf2freq_tpu.config import RuntimeParams
from cnf2freq_tpu.golden import GoldenEngine
from cnf2freq_tpu.hmm import emission_all, gather_family
from cnf2freq_tpu.hmm.forward_backward import (combined_loglik,
                                               forward_backward,
                                               state_posterior)
from cnf2freq_tpu.hmm.transition import (apply_transition, interval_recomb,
                                         transition_eigenvalues,
                                         transition_matrix)


def test_hadamard_transition_equals_dense(demo_pedigree):
    cfg = demo_pedigree.config
    params = RuntimeParams()
    dists = np.array([10.0, 3.3, 25.0])
    r = interval_recomb(cfg, params, dists)
    lam = transition_eigenvalues(cfg, r)
    rng = np.random.default_rng(0)
    p = rng.random((2, 8, 64))        # [batch, shift, state] (state minor)
    for i in range(len(dists)):
        dense = np.asarray(transition_matrix(cfg, np.asarray(r)[i]))
        expect = np.einsum("gh,bsh->bsg", dense, p)
        got = np.asarray(apply_transition(p, np.asarray(lam)[i][None, :]))
        np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-14)
        # transition matches the golden per-state implementation too
        eng = GoldenEngine(demo_pedigree)
        gold = eng.transition(p[0, 0, :], float(dists[i]))
        np.testing.assert_allclose(np.asarray(expect)[0, 0, :], gold,
                                   rtol=1e-12)


@pytest.fixture(scope="module")
def demo_fb(demo_pedigree):
    ped = demo_pedigree
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    fbatch = gather_family(ped, ped.dous, 0, ped.num_markers - 1)
    e = emission_all(fbatch, ped.config)
    dists = np.diff(ped.markerposes)
    return forward_backward(e, dists, ped.config, RuntimeParams()), fbatch


def test_fb_matches_golden(demo_pedigree, demo_fb):
    ped = demo_pedigree
    eng = GoldenEngine(ped)
    fb, _ = demo_fb
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        for s in range(8):
            gold = eng.fwbw(ind, 0, 17, s)
            np.testing.assert_allclose(np.asarray(fb.fw_pre)[b, :, s, :],
                                       gold["fw_pre"], rtol=1e-10,
                                       atol=1e-300)
            np.testing.assert_allclose(np.asarray(fb.fw_post)[b, :, s, :],
                                       gold["fw_post"], rtol=1e-10,
                                       atol=1e-300)
            np.testing.assert_allclose(np.asarray(fb.bw)[b, :, s, :],
                                       gold["bw"], rtol=1e-10, atol=1e-300)
            np.testing.assert_allclose(np.asarray(fb.fw_pre_f)[b, :, s],
                                       gold["fw_pre_f"], rtol=1e-10)
            np.testing.assert_allclose(np.asarray(fb.bw_f)[b, :, s],
                                       gold["bw_f"], rtol=1e-10)


def test_posterior_sums_to_one(demo_pedigree, demo_fb):
    fb, fbatch = demo_fb
    total = combined_loglik(fb, fbatch.shiftignore)
    post = np.asarray(state_posterior(fb, total, fbatch.shiftignore))
    sums = post.sum(axis=(2, 3))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-9)
