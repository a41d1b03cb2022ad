"""Golden full-iteration spec: the scan stage of the reference's ``doit``.

Extends the per-scan golden engine to the complete probe loop of one
outer iteration (cnF2freq.cpp:5294-5903): per analysis individual, the
per-shift total likelihoods, the (marker x state x path x shift) posterior
probe loop with its ``ignoreflag2`` skip rules, the HAPLOS /
GENOSPROBE / GENOS / HOMOZYGOUS update hooks, and the accumulator
movement ``movehaplos`` / ``moveinfprobs`` (cnF2freq.cpp:3577-3616) into
per-individual ``haplobase`` / ``haplocount`` / ``infprobs``.

Deliberately slow scalar Python; validated 1:1 against the instrumented
reference binary (refbaseline/build_ref.py REFTRACE/REFTRACE5 traces,
tests/test_refparity.py) and used to pin the tensorized driver.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import (GENOS, GENOSPROBE, HAPLOS, HOMOZYGOUS, MINFACTOR,
                      UNKNOWN, ZP_PROPAGATE)
from ..pedigree import Pedigree
from .engine import GoldenEngine


@dataclasses.dataclass
class ScanAccumulators:
    """Shared accumulators after the scan stage of one iteration."""

    haplobase: Dict[int, np.ndarray]
    haplocount: Dict[int, np.ndarray]
    # infprobs[n][marker][side][markerval] -> weight
    infprobs: Dict[int, List[List[Dict[int, float]]]]
    homozyg: Dict[int, np.ndarray]          # [M, 2]
    factors: Dict[int, np.ndarray]          # per dous: [numshifts] logliks
    probes: Dict[Tuple[int, int, int, int, int], float]  # (n,m,g,f2,s)->val
    # GENOSPROBE sidevals (collect_probes only): (n,m,g,side,mv)->val
    sidevals: Dict[Tuple[int, int, int, int, int], float] = \
        dataclasses.field(default_factory=dict)


def relmaps(ped: Pedigree, n: int):
    """relmap / relmapshift / reltree of fixtrees (cnF2freq.cpp:3099-3187):
    member id -> OR of its flag2 slot bits, member id -> OR of shift bits,
    plus the deduplicated member list and the slot-ordered list."""
    cfg = ped.config
    ind = ped.by_id(n)
    relmap: Dict[int, int] = {n: 1}
    relmapshift: Dict[int, int] = {n: 1}
    reltree: List[int] = [n]
    ordered: List[Optional[int]] = [None] * cfg.turnbits
    ordered[0] = n
    for lev1 in range(2):
        p = ped.by_id(ind.pars[lev1]) if ind.pars[lev1] else None
        if p is None:
            continue
        flag2index = 1 + lev1 * ((1 << (cfg.numgen - 1)) - 1)
        shiftval = (2 << lev1) if cfg.numgen == 3 else 0
        if not p.empty:
            relmap[p.n] = relmap.get(p.n, 0) | (1 << flag2index)
            relmapshift[p.n] = relmapshift.get(p.n, 0) | shiftval
            ordered[flag2index] = p.n
        reltree.append(p.n)
        if cfg.numgen > 2:
            for lev2 in range(2):
                gp = ped.by_id(p.pars[lev2]) if p.pars[lev2] else None
                if gp is None:
                    continue
                if not gp.empty:
                    bit = flag2index + lev2 + 1
                    relmap[gp.n] = relmap.get(gp.n, 0) | (1 << bit)
                    relmapshift[gp.n] = relmapshift.get(gp.n, 0) | 0
                    ordered[bit] = gp.n
                reltree.append(gp.n)
    reltree = sorted(set(reltree))
    return relmap, relmapshift, reltree, ordered


def ignoreflag2(ped: Pedigree, flag2: int, g: int, shiftflagmode: int,
                marker: int, flag2ignore: int, relmap: Dict[int, int],
                relmapshift: Dict[int, int]) -> bool:
    """cnF2freq.cpp:3462-3496 (non-selfing path).

    Rule 1: masked path bits must stay 0.  Rule 2: a member occupying
    several slots (inbreeding/shared founders) must have consistent
    path-vs-state bits across all of them.  Rule 3: for members with a
    duplicate-allele, equal-error genotype, the redundant path choice is
    tied to the member's shift bits so each equivalent probe is counted
    exactly once."""
    cfg = ped.config
    if flag2 & flag2ignore:
        return True
    for n, currfilter in relmap.items():
        filtered = (flag2 ^ (g * 2)) & currfilter
        if filtered and filtered != currfilter:
            return True
        ind = ped.by_id(n)
        # rule 3 survives under RELSKEWSTATES for every member except
        # the focal (currfilter == 1): `(!RELSKEWSTATES || currfilter
        # != 1) && !SELFING`, cnF2freq.cpp:3488-3489 — the coherence
        # bit only needs the FOCAL's equivalent probes kept apart
        if marker >= 0 and ind.markerdata[marker, 0] == \
                ind.markerdata[marker, 1] and \
                ind.markersure[marker, 0] == ind.markersure[marker, 1] and \
                (bool(filtered) == bool(shiftflagmode & relmapshift[n])) \
                and (not cfg.relskewstates or currfilter != 1) \
                and not cfg.selfing:
            return True
    return False


class GoldenDoit:
    """Scalar reference ``doit`` over one pedigree."""

    def __init__(self, ped: Pedigree, params=None):
        self.ped = ped
        self.cfg = ped.config
        self.eng = GoldenEngine(ped, params)

    # -- one individual's scan contribution ---------------------------
    def scan_individual(self, n: int, chrom: int, acc: ScanAccumulators,
                        collect_probes: bool = False):
        ped, cfg, eng = self.ped, self.cfg, self.eng
        ind = ped.by_id(n)
        lo, hi = ped.chromosome_range(chrom)
        shiftignore, flag2ignore = ped.fixtrees(n)
        nohaplo = not cfg.haplotyping
        if nohaplo:
            # !HAPLOTYPING doit: reltree cleared, flag2ignore zeroed,
            # probes run flag2=-1 only, no update hooks at all
            # (cnF2freq.cpp:5318-5345, 5554)
            relmap, relmapshift, reltree, ordered = {}, {}, [], []
        else:
            relmap, relmapshift, reltree, ordered = relmaps(ped, n)

        shiftend = cfg.numshifts
        if ind.gen < 2:
            shiftend = min(2, shiftend)

        fbs = {}
        factors = np.full(cfg.numshifts, -1e30)
        for s in range(shiftend):
            if s & shiftignore:
                continue
            fbs[s] = eng.fwbw(ind, lo, hi - 1, s)
            factors[s] = fbs[s]["fw_post_f"][-1]
        acc.factors[n] = factors.copy()
        fmax = factors[:shiftend].max()
        realfactor = sum(math.exp(factors[s] - fmax)
                         for s in range(shiftend) if not (s & shiftignore))
        factor = fmax + math.log(realfactor)
        if math.isnan(factor) or factor < MINFACTOR:
            return

        desc = ind.descendants
        unusualstate = -200.0
        # thread-local accumulators (per reference threadblock)
        for q in range(lo, hi):
            m = q
            eng.hooks.haplos.clear()
            eng.hooks.infprobs.clear()
            homozyg_m = np.zeros(2)
            # the reference probes its full (padded) extended space
            # (NUMTYPES includes the selfing/relskew bits, settings.h:27;
            # probe loop cnF2freq.cpp:5416); states beyond numstates are
            # the invalid selfval==3 block, which carries no probability
            for g in range(cfg.numstates):
                for s in range(shiftend):
                    if s & shiftignore:
                        continue
                    if factor - factors[s] > 40:
                        continue
                    flag2_range = (-1,) if nohaplo \
                        else range(cfg.numpaths)
                    for flag2 in flag2_range:
                        if flag2 >= 0 and \
                                ignoreflag2(ped, flag2, g, s, m,
                                            flag2ignore, relmap,
                                            relmapshift):
                            continue
                        val = eng.probe(ind, fbs[s], lo, q, g, flag2, s) \
                            - factor
                        if not (math.isfinite(val) and val > unusualstate):
                            continue
                        val = math.exp(val)
                        if collect_probes:
                            acc.probes[(n, m, g, flag2, s)] = val

                        if nohaplo:
                            # the reference computes GENOSPROBE sidevals
                            # under DOINFPROBS but consumes them only
                            # behind the HAPLOTYPING guard
                            # (cnF2freq.cpp:5554-5566); collect them for
                            # the genotype-share pinning tests
                            if collect_probes:
                                for side in range(2):
                                    for mv in (1, 2):
                                        sv_ = eng.trackpossible(
                                            ind, GENOSPROBE, 0, mv, 0.0,
                                            m, g * 2 + side,
                                            flag2 ^ side, s,
                                            1 << (cfg.numgen - 1))
                                        key = (n, m, g, side, mv)
                                        acc.sidevals[key] = \
                                            acc.sidevals.get(key, 0.0) \
                                            + sv_
                            continue

                        sidevals = np.zeros((2, 2))
                        homo = np.zeros(2)
                        for side in range(2):
                            for mv in (1, 2):
                                sidevals[side][mv - 1] += eng.trackpossible(
                                    ind, GENOSPROBE, 0, mv, 0.0, m,
                                    g * 2 + side, flag2 ^ side, s,
                                    1 << (cfg.numgen - 1))
                        for mv in (1, 2):
                            homo[mv - 1] += eng.trackpossible(
                                ind, HOMOZYGOUS, 0, mv, 0.0, m, g * 2,
                                flag2, s, 1 << (cfg.numgen - 1))

                        # updatehaplo (cnF2freq.cpp:1561-1575)
                        ok = eng.calltrackpossible(ind, m, g, flag2, s)
                        if ok:
                            eng.calltrackpossible(ind, m, g, flag2, s,
                                                  update=HAPLOS,
                                                  updateval=val)
                        svs = sidevals.sum(axis=1)
                        for side in range(2):
                            for mv in (1, 2):
                                # svs == 0: the reference computes a NaN
                                # updateval here (no guard,
                                # cnF2freq.cpp:5566) but the GENOS walk
                                # it feeds is the impossible one that
                                # produced the zero sidevalsum, so no
                                # hook ever fires — 0.0 is equivalent
                                # and keeps the spec NaN-free
                                uv = (val * sidevals[side][mv - 1]
                                      / svs[side]) if svs[side] else 0.0
                                eng.trackpossible(
                                    ind, GENOS, 0, mv, 0.0, m,
                                    g * 2 + side, flag2 ^ side, s,
                                    1 << (cfg.numgen - 1), updateval=uv)
                        for mv in (1, 2):
                            homozyg_m[mv - 1] += val * homo[mv - 1] / svs[0]

            if nohaplo:
                # no movement under !HAPLOTYPING: reltree is empty and
                # the update hooks never fired (cnF2freq.cpp:5895-5902)
                continue
            # accumulator movement (cnF2freq.cpp:5875-5903)
            tot = sum(eng.hooks.infprobs.get((n, 0, mv), 0.0)
                      for mv in set(k[2] for k in eng.hooks.infprobs
                                    if k[0] == n and k[1] == 0))
            norm = 1.0 / tot if tot else float("inf")
            acc.homozyg.setdefault(n, np.zeros((ped.num_markers, 2)))
            acc.homozyg[n][m] += homozyg_m * norm
            for k in reltree:
                dup = sum(1 for o in ordered if o == k)
                self._moveinfprobs(k, m, norm, desc, dup, acc)
                self._movehaplos(k, m, desc, acc)

    def _moveinfprobs(self, k: int, marker: int, norm: float, desc: float,
                      dup: int, acc: ScanAccumulators):
        eng = self.eng
        eff = norm * 2.0 / (2.0 ** dup) * desc
        tab = acc.infprobs.setdefault(
            k, [[dict(), dict()] for _ in range(self.ped.num_markers)])
        for side in range(2):
            for (n_, s_, mv), v in list(eng.hooks.infprobs.items()):
                if n_ == k and s_ == side:
                    tab[marker][side][mv] = tab[marker][side].get(mv, 0.0) \
                        + v * eff
                    del eng.hooks.infprobs[(n_, s_, mv)]

    def _movehaplos(self, k: int, marker: int, desc: float,
                    acc: ScanAccumulators):
        eng, ped = self.eng, self.ped
        h = eng.hooks.haplos.pop(k, None)
        if h is None or (h[0] == 0 and h[1] == 0):
            return
        ind = ped.by_id(k)
        if abs(ind.haploweight[marker] - 0.5) >= 0.5 - 1e-12:
            return
        tiny = math.exp(-400) * self.eng.params.maxdiff ** 2 * 0.5
        b1 = h[0] + tiny
        b2 = h[1] + tiny
        hb = acc.haplobase.setdefault(k, np.zeros(ped.num_markers))
        hc = acc.haplocount.setdefault(k, np.zeros(ped.num_markers))
        hb[marker] += b1 / (b1 + b2) * desc
        hc[marker] += desc

    # -- full scan stage ----------------------------------------------
    def scan(self, collect_probes: bool = False) -> ScanAccumulators:
        acc = ScanAccumulators({}, {}, {}, {}, {}, {})
        self.eng.clear_cache()
        for c in range(self.ped.num_chromosomes):
            for n in self.ped.dous:
                self.scan_individual(n, c, acc,
                                     collect_probes=collect_probes)
        return acc
