"""Model invariants over randomized inputs — properties any correct
pedigree-HMM must satisfy, independent of golden fixtures."""
import jax.numpy as jnp
import numpy as np
import pytest

from cnf2freq_tpu.config import MINFACTOR, ModelConfig, RuntimeParams
from cnf2freq_tpu.hmm.emission import assemble_e_all, build_blocks
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.hmm.forward_backward import (combined_loglik,
                                               forward_backward,
                                               state_posterior)
from cnf2freq_tpu.utils import simulate_f2


def _setup(seed, B=5, M=8, **kw):
    ped = simulate_f2(n_f2=B, n_markers=M, seed=seed, **kw)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1)
    dists = jnp.asarray(np.diff(ped.markerposes))
    return ped, fb.map(jnp.asarray), dists


@pytest.mark.parametrize("seed", [0, 11, 23])
def test_posterior_normalises_at_every_marker(seed):
    ped, fbj, dists = _setup(seed, missing_rate=0.2, error_rate=0.05)
    cfg, params = ModelConfig(), RuntimeParams()
    e = assemble_e_all(build_blocks(fbj, cfg), cfg)
    fbres = forward_backward(e, dists, cfg, params)
    total = combined_loglik(fbres, fbj.shiftignore)
    post = np.asarray(state_posterior(fbres, total, fbj.shiftignore))
    sums = post.sum(axis=(2, 3))                       # [B, M]
    np.testing.assert_allclose(sums, 1.0, atol=1e-9)


@pytest.mark.parametrize("seed", [3, 17])
def test_loglik_is_marker_invariant(seed):
    """fw_pre[m] . E[m] . bw[m] recovers the same total at EVERY marker
    (the fb-combine identity the probe machinery relies on)."""
    ped, fbj, dists = _setup(seed, missing_rate=0.1)
    cfg, params = ModelConfig(), RuntimeParams()
    e = assemble_e_all(build_blocks(fbj, cfg), cfg)
    fbres = forward_backward(e, dists, cfg, params)
    allowed = (np.arange(cfg.numshifts)[None, :] &
               np.asarray(fbj.shiftignore)[:, None]) == 0
    fw, bw = np.asarray(fbres.fw_pre), np.asarray(fbres.bw)
    ff, bf = np.asarray(fbres.fw_pre_f), np.asarray(fbres.bw_f)
    en = np.asarray(e)
    B, M = fw.shape[:2]
    ref = None
    for m in range(M):
        dot = (fw[:, m] * en[:, m] * bw[:, m]).sum(axis=-1)   # [B, NS]
        lg = np.where(allowed & (dot > 0),
                      np.log(np.maximum(dot, 1e-300)) + ff[:, m] +
                      bf[:, m], MINFACTOR)
        mx = lg.max(axis=1)
        tot = mx + np.log(np.exp(lg - mx[:, None]).sum(axis=1))
        if ref is None:
            ref = tot
        else:
            np.testing.assert_allclose(tot, ref, rtol=1e-9,
                                       err_msg=f"marker {m}")


@pytest.mark.parametrize("seed", [5, 29])
def test_allele_relabel_symmetry(seed):
    """Swapping allele labels 1<->2 everywhere is a pure relabeling:
    every total log-likelihood is invariant."""
    cfg, params = ModelConfig(), RuntimeParams()
    totals = []
    for _ in range(2):
        ped, fbj, dists = _setup(seed, missing_rate=0.1, error_rate=0.02)
        if totals:   # second copy: relabel
            md = np.asarray(fbj.md)
            swapped = np.where(md == 1, 2, np.where(md == 2, 1, md))
            import dataclasses
            fbj = dataclasses.replace(fbj, md=jnp.asarray(swapped))
        e = assemble_e_all(build_blocks(fbj, cfg), cfg)
        fbres = forward_backward(e, dists, cfg, params)
        totals.append(np.asarray(combined_loglik(fbres, fbj.shiftignore)))
    np.testing.assert_allclose(totals[0], totals[1], rtol=1e-9)
