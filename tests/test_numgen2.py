"""numgen==2 model families via embedding.

A two-generation analysis unit (focal + parents, no grandparents) is a
numgen==3 family whose grandparent slots are vacant: the emission
recursion reduces exactly to the 3-slot model and the extra state bits
decouple.  This validates the embedded engine against an independent
hand-built 4-state HMM (the reference's "F2 no haplotyping" block,
settings.h:60-73)."""

import numpy as np
import pytest

from cnf2freq_tpu.config import ModelConfig, RuntimeParams, UNKNOWN
from cnf2freq_tpu.hmm import emission_all, gather_family
from cnf2freq_tpu.hmm.forward_backward import forward_backward
from cnf2freq_tpu.pedigree import Pedigree


def two_gen_family(seed=0, M=6):
    rng = np.random.default_rng(seed)
    ped = Pedigree(ModelConfig())
    ped.markerposes = np.arange(M) * 10.0
    ped.chromstarts = [0, M]
    dad = ped.getind("dad")
    mom = ped.getind("mom")
    kid = ped.getind("kid")
    ped.freeze()
    for ind in (dad, mom, kid):
        ind.empty = False
        ind.markerdata[:] = rng.integers(1, 3, size=(M, 2))
        ind.markersure[:] = 0.0
        ind.haploweight[:] = 0.5
    kid.pars = (dad.n, mom.n)
    kid.gen = 2
    ped.dous = [kid.n]
    return ped, dad, mom, kid


def hand_hmm_4state(ped, dad, mom, kid, M):
    """Independent 4-state forward pass: state = (which dad strand, which
    mom strand) is transmitted; emission = the kid's unordered genotype is
    producible from the transmitted pair (phase-free, zero error)."""
    def emis(m):
        e = np.zeros(4)
        kd = set()
        a, b = kid.markerdata[m]
        kd = {(a, b), (b, a)}
        for s in range(4):
            da = dad.markerdata[m][s & 1]
            mo = mom.markerdata[m][(s >> 1) & 1]
            e[s] = 1.0 if (da, mo) in kd else 0.0
        return e

    p = np.full(4, 0.25)
    loglik = 0.0
    for m in range(M):
        p = p * emis(m)
        s = p.sum()
        if s == 0:
            return -np.inf, None
        loglik += np.log(s)
        p /= s
        if m + 1 < M:
            d = ped.markerposes[m + 1] - ped.markerposes[m]
            r = 0.5 * (1 - np.exp(-d / 50.0))
            q = np.zeros(4)
            for frm in range(4):
                for to in range(4):
                    x = frm ^ to
                    w = (r if x & 1 else 1 - r) * (r if x & 2 else 1 - r)
                    q[to] += p[frm] * w
            p = q
    return loglik, p


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_embedding_matches_hand_hmm(seed):
    M = 6
    ped, dad, mom, kid = two_gen_family(seed, M)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    gold_ll, gold_p = hand_hmm_4state(ped, dad, mom, kid, M)

    fb = gather_family(ped, ped.dous, 0, M - 1)
    e = emission_all(fb, ped.config)
    fbres = forward_backward(e, np.diff(ped.markerposes), ped.config,
                             RuntimeParams())
    # the embedded engine's phase factors contribute a constant 2^-M..
    # no: with hw=0.5 each het slot halves; compare shift mode 0 and the
    # class posterior over the (g0, g3) bits at the last marker
    ll = np.asarray(fbres.fw_post_f)[0, -1, 0]
    if not np.isfinite(gold_ll):
        assert ll < -1e10
        return
    post = np.asarray(fbres.fw_post)[0, -1, 0, :]
    cls = np.zeros(4)
    g = np.arange(64)
    for s4 in range(4):
        sel = (((g >> 0) & 1) == (s4 & 1)) & (((g >> 3) & 1) == (s4 >> 1))
        cls[s4] = post[sel].sum()
    # the 4-state marginal posterior matches the hand HMM where emission
    # weights are phase-symmetric (hw == 0.5 everywhere)
    np.testing.assert_allclose(cls, gold_p, atol=1e-9)


def test_sexmarker_doubled_haploid():
    """The sex pseudo-allele (9) must not match unknowns and must match
    itself (markermiss, cnF2freq.cpp:303-316): a doubled-haploid side
    carrying 9s stays consistent."""
    from cnf2freq_tpu.config import SEXMARKER
    from cnf2freq_tpu.golden import GoldenEngine

    ped, dad, mom, kid = two_gen_family(3, 4)
    # mom is a 'haplo' pseudo-parent: second allele slot = sexmarker
    mom.markerdata[:, 1] = SEXMARKER
    kid.markerdata[:, 1] = SEXMARKER
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    eng = GoldenEngine(ped)
    e_gold = np.stack([eng.emission(kid, m, 0) for m in range(4)])
    fb = gather_family(ped, ped.dous, 0, 3)
    e = np.asarray(emission_all(fb, ped.config))[0, :, 0, :]
    np.testing.assert_allclose(e, e_gold, rtol=1e-12, atol=1e-15)
