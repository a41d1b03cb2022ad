"""Synthetic F2 pedigree generator.

The reference ships no benchmark generator (its closest analogue is the
QTLMAS genotype-grid simulator, cnF2freq.cpp:2952-3042).  This builds
PlantImpute-style F2 crosses of arbitrary size for benchmarks and tests:
founder pairs, implicit F1s, F2 offspring genotyped with configurable
missingness and error, meiosis simulated with Haldane recombination on the
given map.
"""

from __future__ import annotations

import numpy as np

from ..config import UNKNOWN
from ..pedigree import Pedigree


def simulate_f2(n_f2: int = 100, n_markers: int = 100,
                marker_spacing_cm: float = 1.0, n_founder_pairs: int = 1,
                missing_rate: float = 0.3, error_rate: float = 0.02,
                seed: int = 0, n_chromosomes: int = 1) -> Pedigree:
    rng = np.random.default_rng(seed)
    ped = Pedigree()
    per_chrom = n_markers
    poses = []
    starts = []
    for c in range(n_chromosomes):
        starts.append(len(poses))
        poses.extend(np.arange(per_chrom) * marker_spacing_cm)
    starts.append(len(poses))
    ped.markerposes = np.asarray(poses, dtype=float)
    ped.chromstarts = starts
    M = len(poses)

    def meiosis(geno):
        """One gamete from a [M, 2] genotype with Haldane crossovers."""
        out = np.empty(M, dtype=np.int32)
        for c in range(n_chromosomes):
            lo, hi = starts[c], starts[c + 1]
            d = np.diff(ped.markerposes[lo:hi])
            rec = 0.5 * (1 - np.exp(-2 * d / 100.0))
            strand = rng.integers(0, 2)
            idx = [strand]
            for r in rec:
                if rng.random() < r:
                    strand ^= 1
                idx.append(strand)
            out[lo:hi] = geno[np.arange(lo, hi), idx]
        return out

    def observe(ind, truth):
        ind.empty = False
        md = truth.copy()
        err = rng.random((M, 2)) < error_rate
        md[err] = 3 - md[err]          # flip 1<->2
        miss = rng.random(M) < missing_rate
        md[miss] = UNKNOWN
        ind.markerdata[:] = md
        ind.markersure[:] = np.where(md != UNKNOWN, error_rate, 0.0)
        ind.priormarkerdata = ind.markerdata.copy()
        ind.priormarkersure = ind.markersure.copy()
        ind.has_prior = True

    truths = {}
    fams = []
    for p in range(n_founder_pairs):
        fa = ped.getind(f"A{p}")
        fb = ped.getind(f"B{p}")
        fams.append((fa, fb))
    ped.freeze()
    for fa, fb in fams:
        truths[fa.n] = np.full((M, 2), 1, dtype=np.int32)
        truths[fb.n] = np.full((M, 2), 2, dtype=np.int32)
        observe(fa, truths[fa.n])
        observe(fb, truths[fb.n])

    for i in range(n_f2):
        fa, fb = fams[i % len(fams)]
        kid = ped.getind(f"F2_{i}")
        aux = [ped.getind(f"F2_{i}_aux_realf"), ped.getind(f"F2_{i}_aux_realm")]
        ped.freeze()
        for a in aux:
            a.gen = 1
            a.pars = (fa.n, fb.n)
            a.empty = True
            truths[a.n] = np.stack([meiosis(truths[fa.n]),
                                    meiosis(truths[fb.n])], axis=1)
        kid.gen = 2
        kid.pars = (aux[0].n, aux[1].n)
        truth = np.stack([meiosis(truths[aux[0].n]),
                          meiosis(truths[aux[1].n])], axis=1)
        truths[kid.n] = truth
        observe(kid, truth)
        kid.haploweight[:] = 0.5
        ped.dous.append(kid.n)
    ped.truths = truths
    return ped
