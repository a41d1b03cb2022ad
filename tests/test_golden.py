"""Validate the golden scalar engine on hand-computable cases and
invariants, plus the demo dataset structure."""

import math

import numpy as np
import pytest

from cnf2freq_tpu import ModelConfig, Pedigree, UNKNOWN
from cnf2freq_tpu.golden import GoldenEngine


def make_ped(markerposes, inds, dous=()):
    """inds: list of (name, pars(names), markerdata or None)."""
    ped = Pedigree(ModelConfig())
    ped.markerposes = np.asarray(markerposes, dtype=float)
    ped.chromstarts = [0, len(markerposes)]
    byname = {}
    for name, pars, geno in inds:
        ind = ped.getind(name)
        byname[name] = ind
    ped.freeze()
    for name, pars, geno in inds:
        ind = byname[name]
        ind.pars = tuple(byname[p].n if p != "0" else 0 for p in pars)
        if geno is not None:
            ind.empty = False
            ind.markerdata[:] = np.asarray(geno).reshape(-1, 2)
            ind.markersure[:] = 0.0
    ped.dous = [byname[d].n for d in dous]
    return ped, byname


class TestDemoLoad:
    def test_structure(self, demo_pedigree):
        ped = demo_pedigree
        assert ped.num_markers == 18
        assert ped.chromstarts == [0, 18]
        names = [ped.by_id(n).name for n in ped.dous]
        assert names == ["C", "D", "F"]
        C = ped.getind("C")
        # implicit F1 synthesis: C's parents are aux individuals whose
        # parents are the founders A and B
        p0 = ped.by_id(C.pars[0])
        assert p0.name == "C_aux_realf"
        assert ped.by_id(p0.pars[0]).name == "A"
        assert ped.by_id(p0.pars[1]).name == "B"
        F = ped.getind("F")
        assert ped.by_id(F.pars[0]).name == "E"
        assert ped.by_id(F.pars[1]).name == "H"
        assert ped.getind("H").empty
        assert not ped.getind("E").empty

    def test_readcount_genotypes(self, demo_pedigree):
        ped = demo_pedigree
        B = ped.getind("B")
        # marker 6 (index 5) read "1/0": one read of allele1, none of 2
        md = B.markerdata[5]
        assert md[0] in (1, 2) and md[1] in (1, 2)
        # D marker 16 "5/1": one strand confidently allele 1, the other
        # nearly uninformative (the single allele-2 read may be an error)
        D = ped.getind("D")
        assert set(D.markerdata[15]) == {1}
        assert D.markersure[15][0] < 0.01
        assert 0.4 < D.markersure[15][1] < 0.5

    def test_fixtrees_masks(self, demo_pedigree):
        ped = demo_pedigree
        C = ped.getind("C")
        shiftignore, flag2ignore = ped.fixtrees(C.n)
        # aux F1 parents are empty: their path bits (1 and 4) are ignored
        assert flag2ignore == (1 << 1) | (1 << 4)
        assert shiftignore == 0
        F = ped.getind("F")
        shiftignore, flag2ignore = ped.fixtrees(F.n)
        # H's whole branch (bits 4,5,6) carries no information
        assert flag2ignore == (1 << 4) | (1 << 5) | (1 << 6)
        assert shiftignore == 4


class TestEmissionHandCases:
    def test_all_unknown_uniform(self):
        ped, by = make_ped([0.0, 10.0], [
            ("A", ("0", "0"), None), ("B", ("0", "0"), None),
            ("C", ("A", "B"), None)], dous=["C"])
        eng = GoldenEngine(ped)
        C = by["C"]
        for s in range(8):
            e = eng.emission(C, 0, s)
            np.testing.assert_allclose(e, 1.0)
        assert eng.total_loglik(C, 0, 1, 0) == pytest.approx(0.0)

    def test_founder_cross(self):
        # A=11, B=22, C=12: informative cross, no error probs
        ped, by = make_ped([0.0, 10.0], [
            ("A", ("0", "0"), [[1, 1], [1, 1]]),
            ("B", ("0", "0"), [[2, 2], [2, 2]]),
            ("C", ("A", "B"), [[1, 2], [1, 2]])], dous=["C"])
        eng = GoldenEngine(ped)
        C = by["C"]
        for s in range(8):
            e = eng.emission(C, 0, s)
            np.testing.assert_allclose(e, 0.5)

    def test_het_parent_phase_weight(self):
        # A=12 with haploweight 0.9; C=12.  The A-branch term depends on
        # state bit 0 xor shift bit 1: |f2n - hw| selection.
        ped, by = make_ped([0.0], [
            ("A", ("0", "0"), [[1, 2]]),
            ("B", ("0", "0"), [[2, 2]]),
            ("C", ("A", "B"), [[1, 2]])], dous=["C"])
        by["A"].haploweight[0] = 0.9
        eng = GoldenEngine(ped)
        C = by["C"]
        for s in range(8):
            e = eng.emission(C, 0, s)
            for g in range(64):
                expect = 0.5 * (0.1 if ((g & 1) ^ ((s >> 1) & 1)) else 0.9)
                assert e[g] == pytest.approx(expect), (g, s)

    def test_impossible_genotype(self):
        # A=11, B=11 cannot produce C=22 without genotyping error
        ped, by = make_ped([0.0], [
            ("A", ("0", "0"), [[1, 1]]),
            ("B", ("0", "0"), [[1, 1]]),
            ("C", ("A", "B"), [[2, 2]])], dous=["C"])
        eng = GoldenEngine(ped)
        e = eng.emission(by["C"], 0, 0)
        np.testing.assert_allclose(e, 0.0)

    def test_genotyping_error_recovery(self):
        # C=22 from 11x11: with error probability only on C the emission is
        # still exactly zero — a mismatch is weighted by the *ancestor's*
        # error probability (miss branch, cnF2freq.cpp:1198-1201), so
        # recovery requires nonzero error on the parents too.
        ped, by = make_ped([0.0], [
            ("A", ("0", "0"), [[1, 1]]),
            ("B", ("0", "0"), [[1, 1]]),
            ("C", ("A", "B"), [[2, 2]])], dous=["C"])
        by["C"].markersure[0] = (0.02, 0.02)
        eng = GoldenEngine(ped)
        e = eng.emission(by["C"], 0, 0)
        np.testing.assert_allclose(e, 0.0)
        # give every individual an error channel: now all states get a
        # small positive weight
        for nm in ("A", "B"):
            by[nm].markersure[0] = (0.02, 0.02)
        eng.clear_cache()
        e = eng.emission(by["C"], 0, 0)
        assert (e > 0).all()
        assert (e < 0.01).all()


class TestTransition:
    def test_rowsum_one(self):
        ped, _ = make_ped([0.0, 10.0], [("A", ("0", "0"), None)])
        eng = GoldenEngine(ped)
        rp = eng.recombprec(10.0)
        assert rp.sum() == pytest.approx(1.0)
        r = 0.5 * (1 - math.exp(-10.0 / 50.0))
        assert rp[0] == pytest.approx((1 - r) ** 6)
        assert rp[63] == pytest.approx(r ** 6)

    def test_transition_preserves_mass(self):
        ped, _ = make_ped([0.0, 10.0], [("A", ("0", "0"), None)])
        eng = GoldenEngine(ped)
        rng = np.random.default_rng(0)
        p = rng.random(64)
        q = eng.transition(p, 7.5)
        assert q.sum() == pytest.approx(p.sum())


class TestPosteriors:
    @pytest.fixture(scope="class")
    def demo_engine(self, demo_pedigree):
        return GoldenEngine(demo_pedigree)

    @pytest.mark.parametrize("name,expect", [("C", 0.25), ("F", 0.5)])
    def test_posterior_normalisation(self, demo_engine, name, expect):
        """Sum over canonical (g, flag2, shift) probe posteriors.

        For an individual whose analysis unit contains empty members the
        canonical-path restriction (flag2ignore) concentrates on a fixed
        fraction of the state mass: each *existing but empty* member halves
        the explored mass (its path bit is pinned to 0 while its phase
        collapse demands one specific interpretation).  C has two empty aux
        F1 parents -> 1/4; F has one empty parent (H, whose own parents are
        truly missing) -> 1/2.  The reference behaves identically — all its
        downstream uses are normalisation-invariant."""
        ped = demo_engine.ped
        cfg = ped.config
        ind = ped.getind(name)
        shiftignore, flag2ignore = ped.fixtrees(ind.n)
        factors = {}
        fbs = {}
        for s in range(cfg.numshifts):
            if s & shiftignore:
                continue
            fbs[s] = demo_engine.fwbw(ind, 0, 17, s)
            factors[s] = fbs[s]["fw_post_f"][-1]
        fmax = max(factors.values())
        total = fmax + math.log(sum(math.exp(f - fmax)
                                    for f in factors.values()))
        for q in [0, 3, 17]:
            acc = 0.0
            for s, fb in fbs.items():
                for g in range(cfg.numtypes):
                    for f2 in range(cfg.numpaths):
                        if f2 & flag2ignore:
                            continue
                        v = demo_engine.probe(ind, fb, 0, q, g, f2, s)
                        if v > MINF:
                            acc += math.exp(v - total)
            assert acc == pytest.approx(expect, abs=1e-9), q

    def test_turn_probe_identity(self, demo_engine):
        """turn mask 0 must reproduce the total likelihood."""
        ped = demo_engine.ped
        C = ped.getind("C")
        fbs = {s: demo_engine.fwbw(C, 0, 17, s) for s in range(8)}
        for s in range(8):
            for q in [0, 5, 16]:
                v = demo_engine.turn_probe(C, fbs, 0, q, 0, s)
                assert v == pytest.approx(fbs[s]["fw_post_f"][-1], abs=1e-9)


MINF = -1e14
