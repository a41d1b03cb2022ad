"""Legacy negshift phase-flip path (the reference's ``DOTOULBAR=0`` mode).

Instead of the joint per-marker MaxSAT solve (updates/phaseflip.py), the
legacy mode scores *single-member* tail inversions only
(``c > 1 continue``, cnF2freq.cpp:5696-5697): per individual and marker a
``negshift`` log-likelihood-gain accumulator is filled from the turn
probes (``updatenegshifts``, cnF2freq.cpp:3640-3715), the most negative
position per (individual, chromosome) becomes an inversion candidate,
relatedness conflicts keep only the best candidate per family cluster
(``inferiorrelated``, cnF2freq.cpp:3415-3435, selection loop
cnF2freq.cpp:6269-6325), and winners flip their haploweight tail
(``negshifter``, cnF2freq.cpp:3437-3460 == updates.phaseflip.apply_flips).

Differences from the reference, by design:
* the reference gates candidate insertion on ``rand()/(RAND_MAX/5)``
  (cnF2freq.cpp:6317) — an ~80% acceptance coin flip; this port is
  deterministic (always accept), keeping iteration results reproducible.
* accumulation is vectorised over markers; per-turn values arrive as the
  already-computed turn score tensor instead of re-running sweeps.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import ModelConfig
from ..pedigree import Pedigree
from .phaseflip import FlipCandidate

# log of the clamp floor applied to summed turn likelihood ratios
# (cnF2freq.cpp:3657: val < 1e-174 -> 1e-174)
_LOG_CLAMP = math.log(1e-174)


def slot_turn_bits(cfg: ModelConfig) -> List[int]:
    """Turn-mask bit for each family slot, in slot order
    (updatenegshifts' hardcoded NUMGEN==3 layout, cnF2freq.cpp:3663-3687):
    focal = bit typebits; parent k = bit 3k; grandparent (k, j) =
    bit 3k + 1 + j."""
    assert cfg.numgen == 3
    bits = [cfg.typebits]
    for k in range(2):
        bits.append(3 * k)
        for j in range(2):
            bits.append(3 * k + 1 + j)
    return bits


def accumulate_negshift(ped: Pedigree, dous: List[int], lo: int, hi: int,
                        weights: np.ndarray, cfg: ModelConfig):
    """updatenegshifts (cnF2freq.cpp:3640-3715) over all analysis units.

    weights: [B, M, T] per-turn log likelihood-ratio sums over allowed
    shifts, *unscaled* (no descendant factor) — ``log val`` with
    ``val = sum_s exp(loglik(turn) - total)``; the no-turn entry is 0.
    Adds into each family member's ``ind.negshift[lo:hi]``:
    ``+log(val_0) - log(val_flip(member))`` with the 1e-174 clamp, and
    grandparent terms scaled by 1/parent.children.
    """
    bits = slot_turn_bits(cfg)
    Mi = hi - lo
    for b, n in enumerate(dous):
        ind = ped.by_id(n)
        slots = ped.family_slots(n)
        _shiftignore, flag2ignore = ped.fixtrees(n)
        # turn validity: g & (flag2ignore >> 1) must be 0
        # (cnF2freq.cpp:5688)
        valid = ~((np.asarray([1 << bit for bit in bits])
                   & (flag2ignore >> 1)) > 0)
        for s, (sid, bit) in enumerate(zip(slots, bits)):
            if sid <= 0 or not valid[s]:
                continue
            member = ped.by_id(sid)
            if member.negshift is None:
                continue
            # grandparent slots scale by the in-between parent's children
            # count (cnF2freq.cpp:3677-3687); slots 2,3 belong to parent
            # slot 1, slots 5,6 to slot 4
            scale = 1.0
            if s in (2, 3, 5, 6):
                if ind.gen < 2:
                    continue
                par = ped.by_id(slots[1 if s in (2, 3) else 4])
                scale = 1.0 / max(par.children, 1)
            logval = np.maximum(weights[b, :Mi, 1 << bit], _LOG_CLAMP)
            member.negshift[lo:hi] += -logval * scale


def select_candidates(ped: Pedigree, lo: int, hi: int,
                      threshold: float = -1e-10
                      ) -> List[Tuple[int, float, int]]:
    """Per-individual best inversion position + relatedness pruning
    (cnF2freq.cpp:6269-6325).  Returns surviving (ind id, val, marker)."""
    cands: List[Tuple[int, float, int]] = []
    for ind in ped.inds[1:]:
        if ind.negshift is None or ind.haploweight is None:
            continue
        seg = ind.negshift[lo:hi]
        p = int(np.argmin(seg))
        val = float(seg[p])
        if val >= threshold or lo + p + 1 >= hi:
            continue
        ours = (ind.n, val, lo + p)
        inferior = False
        keep: List[Tuple[int, float, int]] = []
        for other in cands:
            if ped.arerelated(other[0], ind.n):
                if other[1] > val:
                    continue        # drop the worse relative
                inferior = True
            keep.append(other)
        cands = keep
        if not inferior:
            cands.append(ours)
    return cands


def negshift_flips(ped: Pedigree, dous: List[int], lo: int, hi: int,
                   weights: np.ndarray, cfg: ModelConfig
                   ) -> Optional[FlipCandidate]:
    """The full legacy pass for one chromosome: accumulate, select, and
    return the winning single-member inversions as a FlipCandidate
    (consumed by updates.phaseflip.apply_flips == negshifter)."""
    for ind in ped.inds[1:]:
        if ind.negshift is not None:
            ind.negshift[lo:hi] = 0.0
    accumulate_negshift(ped, dous, lo, hi, weights, cfg)
    cands = select_candidates(ped, lo, hi)
    if not cands:
        return None
    return FlipCandidate(
        score=-sum(v for _, v, _ in cands),
        cover={n for n, _, _ in cands},
        flips=[(n, m) for n, _, m in cands])
