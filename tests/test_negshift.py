"""Legacy negshift flip path (DOTOULBAR=0; updatenegshifts
cnF2freq.cpp:3640-3715, selection cnF2freq.cpp:6269-6325)."""

import numpy as np
import pytest

from cnf2freq_tpu import ModelConfig, Pedigree
from cnf2freq_tpu.updates.negshift import (accumulate_negshift,
                                           negshift_flips,
                                           select_candidates,
                                           slot_turn_bits)
from cnf2freq_tpu.updates.phaseflip import apply_flips

CFG = ModelConfig()


def family(ped, tag, kid_pars=None):
    names = [f"{tag}{s}" for s in
             ["gp00", "gp01", "gp10", "gp11", "p0", "p1", "kid"]]
    by = {nm: ped.getind(nm) for nm in names}
    return by, names


def make_ped(M=8):
    ped = Pedigree(CFG)
    ped.markerposes = np.linspace(0, 70, M)
    ped.chromstarts = [0, M]
    return ped


def finish(ped):
    ped.freeze()
    for ind in ped.inds[1:]:
        ind.empty = False
        ind.markerdata[:] = 1
        ind.markersure[:] = 0.0
        ind.haploweight[:] = 0.3
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_children()
    ped.count_descendants()


def test_slot_turn_bits_layout():
    # focal=6, par0=0, gp00=1, gp01=2, par1=3, gp10=4, gp11=5
    assert slot_turn_bits(CFG) == [6, 0, 1, 2, 3, 4, 5]


def test_accumulate_and_flip():
    ped = make_ped()
    by, _ = family(ped, "a")
    by["ap0"].pars = (by["agp00"].n, by["agp01"].n)
    by["ap1"].pars = (by["agp10"].n, by["agp11"].n)
    by["akid"].pars = (by["ap0"].n, by["ap1"].n)
    by["akid"].gen = 2
    ped.dous = [by["akid"].n]
    finish(ped)
    M = ped.num_markers
    T = CFG.numturns

    # craft turn weights: flipping the focal (bit 6) at marker 3 improves
    # the likelihood by 2 nats; everything else is neutral
    w = np.zeros((1, M, T))
    w[0, 3, 1 << 6] = 2.0
    winner = negshift_flips(ped, ped.dous, 0, M, w, CFG)
    assert winner is not None
    assert winner.flips == [(by["akid"].n, 3)]
    # negshift accumulated on the focal only, negative at 3
    assert by["akid"].negshift[3] < -1.9
    assert abs(by["ap0"].negshift[3]) < 1e-12

    hw_before = by["akid"].haploweight.copy()
    apply_flips(ped, winner, 0)
    assert by["akid"].lastinved[0] == 3
    np.testing.assert_allclose(by["akid"].haploweight[4:],
                               1.0 - hw_before[4:])
    np.testing.assert_allclose(by["akid"].haploweight[:4], hw_before[:4])


def test_grandparent_scaling_and_validity():
    ped = make_ped()
    by, _ = family(ped, "b")
    by["bp0"].pars = (by["bgp00"].n, by["bgp01"].n)
    by["bp1"].pars = (by["bgp10"].n, by["bgp11"].n)
    by["bkid"].pars = (by["bp0"].n, by["bp1"].n)
    by["bkid"].gen = 2
    sib = ped.getind("bsib")
    sib.pars = (by["bp0"].n, by["bp1"].n)
    sib.gen = 2
    ped.dous = [by["bkid"].n, sib.n]
    finish(ped)
    M = ped.num_markers
    T = CFG.numturns

    # gp00 flip (bit 1) gains 3 nats in both children's units
    w = np.zeros((2, M, T))
    w[:, 2, 1 << 1] = 3.0
    accumulate_negshift(ped, ped.dous, 0, M, w, CFG)
    # each unit contributes -3 / p0.children (= 2 children)
    np.testing.assert_allclose(by["bgp00"].negshift[2], -3.0, atol=1e-12)
    assert abs(by["bgp01"].negshift[2]) < 1e-12


def test_relatedness_pruning():
    ped = make_ped()
    by, _ = family(ped, "c")
    by["cp0"].pars = (by["cgp00"].n, by["cgp01"].n)
    by["cp1"].pars = (by["cgp10"].n, by["cgp11"].n)
    by["ckid"].pars = (by["cp0"].n, by["cp1"].n)
    by["ckid"].gen = 2
    # unrelated second family
    other = ped.getind("zz")
    ped.dous = [by["ckid"].n]
    finish(ped)

    by["ckid"].negshift[:] = 0.0
    by["ckid"].negshift[2] = -5.0
    by["cp0"].negshift[:] = 0.0
    by["cp0"].negshift[4] = -3.0       # related, worse -> pruned
    other.negshift[:] = 0.0
    other.negshift[1] = -1.0           # unrelated -> kept
    cands = select_candidates(ped, 0, ped.num_markers)
    got = {(n, m) for n, _, m in cands}
    assert (by["ckid"].n, 2) in got
    assert (other.n, 1) in got
    assert all(n != by["cp0"].n for n, _, m in cands)


def test_driver_negshift_mode_demo():
    """The full driver runs with flip_mode='negshift' on the demo data."""
    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.io import load_plantimpute
    ped = load_plantimpute("/root/reference/demoplantimpute.map",
                          "/root/reference/demoplantimpute.ped",
                          "/root/reference/demoplantimpute.gen")
    drv = Driver(ped)
    drv.flip_mode = "negshift"
    drv.preprocess()
    drv.iterate(early=True)
    info = drv.iterate()
    assert np.isfinite(info["hitnnn"])
    for ind in ped.inds[1:]:
        if ind.haploweight is not None:
            assert ((ind.haploweight >= 0) & (ind.haploweight <= 1)).all()


def test_parent_swap_scores_and_moves():
    """parentswapnegshifts (cnF2freq.cpp:5004-5084): pair scoring,
    bestshift dominance, and tail application semantics."""
    from cnf2freq_tpu.updates.negshift import (accumulate_pair_scores,
                                               parent_swap_negshifts)
    ped = make_ped()
    by, _ = family(ped, "d")
    by["dkid"].pars = (by["dp0"].n, by["dp1"].n)
    sib = ped.getind("dsib")
    sib.pars = (by["dp0"].n, by["dp1"].n)
    ped.dous = [by["dkid"].n, sib.n]
    finish(ped)
    M = ped.num_markers
    T = CFG.numturns

    # flipping parent 1 (turn bit 3) gains 2 nats per child at marker 3
    w = np.zeros((2, M, T))
    w[:, 3, 1 << 3] = 2.0
    nsm = accumulate_pair_scores(ped, ped.dous, 0, M, w, CFG)
    key = (by["dp0"].n, by["dp1"].n)
    assert key in nsm
    np.testing.assert_allclose(nsm[key][3, 2], 4.0, atol=1e-12)  # summed
    assert abs(nsm[key][3, 1]) < 1e-12

    hw1 = by["dp1"].haploweight.copy()
    hw0 = by["dp0"].haploweight.copy()
    moves = parent_swap_negshifts(ped, ped.dous, 0, M, w, CFG)
    # one move per parent pair (bestshift dominance), phase 2, marker 3
    assert moves == [(by["dp0"].n, by["dp1"].n, 2, 3,
                      pytest.approx(4.0 - 1e-5))]
    np.testing.assert_allclose(by["dp1"].haploweight[4:], 1.0 - hw1[4:])
    np.testing.assert_allclose(by["dp1"].haploweight[:4], hw1[:4])
    np.testing.assert_allclose(by["dp0"].haploweight, hw0)  # untouched

    # no positive gain -> no moves
    moves2 = parent_swap_negshifts(ped, ped.dous, 0, M,
                                   np.zeros((2, M, T)), CFG)
    assert moves2 == []


def test_parent_swap_phase4_flips_full_sibs():
    from cnf2freq_tpu.updates.negshift import parent_swap_negshifts
    ped = make_ped()
    by, _ = family(ped, "e")
    by["ekid"].pars = (by["ep0"].n, by["ep1"].n)
    sib = ped.getind("esib")
    sib.pars = (by["ep0"].n, by["ep1"].n)
    half = ped.getind("ehalf")            # half-sib: shares only par1
    half.pars = (ped.getind("eother").n, by["ep1"].n)
    ped.dous = [by["ekid"].n, sib.n]
    finish(ped)
    M = ped.num_markers
    T = CFG.numturns

    w = np.zeros((2, M, T))
    w[:, 2, 1 << CFG.typebits] = 1.5     # focal flips score the swap
    hwk = by["ekid"].haploweight.copy()
    hwh = half.haploweight.copy()
    moves = parent_swap_negshifts(ped, ped.dous, 0, M, w, CFG,
                                  phases=(4,))
    assert [mv[2:4] for mv in moves] == [(4, 2)]
    # full sibs flip their tails once; the half-sib does not
    np.testing.assert_allclose(by["ekid"].haploweight[3:],
                               1.0 - hwk[3:])
    np.testing.assert_allclose(half.haploweight, hwh)


def test_parent_swap_genome_wide_dominance():
    """A parent pair accepts at most ONE move across chromosomes when
    candidates from several chromosomes feed a single
    apply_parent_swaps pass (the reference fills one nsm genome-wide and
    runs parentswapnegshifts once, cnF2freq.cpp:5004-5084)."""
    from cnf2freq_tpu.updates.negshift import apply_parent_swaps
    ped = make_ped()
    by, _ = family(ped, "g")
    by["gkid"].pars = (by["gp0"].n, by["gp1"].n)
    ped.dous = [by["gkid"].n]
    finish(ped)
    M = ped.num_markers
    p0, p1 = by["gp0"].n, by["gp1"].n
    # two candidates for the same pair, as if from two chromosomes
    cands = [(3.0, p0, p1, 2, 1, M // 2),      # "chromosome 0", wins
             (2.0, p0, p1, 2, M // 2 + 1, M)]  # "chromosome 1", dominated
    hw1 = by["gp1"].haploweight.copy()
    applied = apply_parent_swaps(ped, cands)
    assert [mv[3] for mv in applied] == [1]
    np.testing.assert_allclose(by["gp1"].haploweight[2:M // 2],
                               1.0 - hw1[2:M // 2])
    # the dominated second-chromosome tail stays untouched
    np.testing.assert_allclose(by["gp1"].haploweight[M // 2:],
                               hw1[M // 2:])


def test_driver_parent_swap_demo():
    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.io import load_plantimpute
    ped = load_plantimpute("/root/reference/demoplantimpute.map",
                          "/root/reference/demoplantimpute.ped",
                          "/root/reference/demoplantimpute.gen")
    drv = Driver(ped)
    drv.flip_mode = "negshift"
    drv.parent_swap = True
    drv.preprocess()
    drv.iterate(early=True)
    info = drv.iterate()
    assert np.isfinite(info["hitnnn"])
    for ind in ped.inds[1:]:
        if ind.haploweight is not None:
            assert ((ind.haploweight >= 0) & (ind.haploweight <= 1)).all()
