"""Family-batch tensors: the analysis units of a marker scan.

The reference walks pointers through ``individ::pars`` per probe
(cnF2freq.cpp:1279-1332).  Here we gather, once per scan, everything the
emission computation needs into dense arrays over

    [B, SLOT, M, ...]   B = focal individuals, SLOT = 7 family slots,
                        M = markers of one chromosome,

so the whole emission model becomes fixed-shape tensor algebra (vmappable,
shardable over B).

Slot order: 0=focal, 1=parent0, 2=gp00, 3=gp01, 4=parent1, 5=gp10, 6=gp11
(the flag2-bit layout of fixtrees, cnF2freq.cpp:3099-3187).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from ..config import ModelConfig
from ..pedigree import Pedigree


@dataclasses.dataclass
class FamilyBatch:
    """Plain arrays (numpy or jnp) describing B analysis units over M
    markers.  A pytree — safe to pass through jit."""

    md: np.ndarray          # [B, 7, M, 2] int32 marker values
    ms: np.ndarray          # [B, 7, M, 2] float error probabilities
    hw: np.ndarray          # [B, 7, M]    float haplotype weights
    exists: np.ndarray      # [B, 7] bool  slot occupied by an individual
    attop: np.ndarray       # [B, 7] bool  slot is a recursion top (founder)
    flag2ignore: np.ndarray  # [B] int32 canonical-path masks
    shiftignore: np.ndarray  # [B] int32 disabled shift modes
    descendants: np.ndarray  # [B] int32
    slot_ind: np.ndarray    # [B, 7] int32 global individual ids (0 = none)
    # probe dedup inputs (ignoreflag2 rules 2-3, cnF2freq.cpp:3462-3496):
    # emptyslot marks members outside fixtrees' relmap (genotype-less,
    # cnF2freq.cpp:6511-6524); dup_flip[b, v, slot] says variant v applies
    # a (-1)^(phase bit) sign at that slot — the 4-variant average is the
    # exact indicator of phase-bit equality across duplicate-member slots
    emptyslot: np.ndarray = None   # [B, 7] bool
    dup_flip: np.ndarray = None    # [B, 4, 7] bool
    # extended state spaces (engine_ext.py):
    # selfgen [B] int32 — selfing generations of the focal (gen - 2,
    # clamped at 0; selfingfactors/selfprec, cnF2freq.cpp:2050-2063,
    # 2316-2327).  Only filled when cfg.selfing.
    selfgen: np.ndarray = None
    # relh [B, M] — the focal's relhaplo (phase-coherence transition
    # weights of the RELSKEWSTATES coherence bit, cnF2freq.cpp:2343-2362).
    # Only filled when cfg.relskewstates.
    relh: np.ndarray = None

    @property
    def num_units(self) -> int:
        # exists is always materialised (md may be None in a light
        # batch whose marker tensors are gathered on device)
        return self.exists.shape[0]

    @property
    def num_markers(self) -> int:
        return self.md.shape[2]

    def map(self, fn):
        return FamilyBatch(**{f.name: (fn(v) if (v := getattr(self, f.name))
                                       is not None else None)
                              for f in dataclasses.fields(self)})


def _flatten(fb: FamilyBatch):
    return [getattr(fb, f.name) for f in dataclasses.fields(FamilyBatch)], None


def _unflatten(_, leaves):
    return FamilyBatch(*leaves)


try:  # register as a jax pytree when jax is importable
    import jax

    jax.tree_util.register_pytree_node(FamilyBatch, _flatten, _unflatten)
except Exception:  # pragma: no cover
    pass


def gather_family(ped: Pedigree, focal_ids: Sequence[int],
                  startmark: int, endmark: int,
                  dtype=np.float64, mask_mode: str = "missing",
                  parity: bool = False,
                  n_variants: int = None,
                  light: bool = False) -> \
        FamilyBatch:
    """Build the batch for markers [startmark, endmark] inclusive.

    parity enables reference-exact quirks: the gen<2 shift-mode
    truncation (cnF2freq.cpp:5359) and strict probe-dedup validation
    (>2 duplicate slots raise instead of being approximated).

    mask_mode selects the canonical-path mask: "missing" (default) pins
    only vacant slots — the correct restriction; "reference" reproduces
    the reference's fixtrees mask that also pins empty members
    (cnF2freq.cpp:3099-3187), for parity testing.

    n_variants pins the probe-dedup variant count (the dup_flip axis):
    a member occupying k slots needs 2**(k-1) sign variants, multiplied
    across duplicate groups; the driver computes the cohort-wide maximum
    once (Driver._n_variants) so every chunk shares one compiled scan.
    Units with fewer variants repeat theirs cyclically — exact, since
    every per-unit count divides the (power-of-two) maximum."""
    cfg: ModelConfig = ped.config
    B = len(focal_ids)
    S = cfg.numslots
    M = endmark - startmark + 1

    if light:
        # md/ms/hw (and relh) stay None: the caller gathers them on
        # device from a ScanCohort (resident.make_gather_dev) — the
        # masks below are cheap, the per-slot marker copies are not
        md = ms = hw = None
    else:
        md = np.zeros((B, S, M, 2), dtype=np.int32)
        ms = np.zeros((B, S, M, 2), dtype=dtype)
        hw = np.full((B, S, M), 0.5, dtype=dtype)
    exists = np.zeros((B, S), dtype=bool)
    attop = np.zeros((B, S), dtype=bool)
    f2ig = np.zeros(B, dtype=np.int32)
    shig = np.zeros(B, dtype=np.int32)
    desc = np.zeros(B, dtype=np.int32)
    slot_ind = np.zeros((B, S), dtype=np.int32)
    emptyslot = np.zeros((B, S), dtype=bool)
    unit_cons: List[List] = []

    selfgen = np.zeros(B, dtype=np.int32) if cfg.selfing else None
    relh = np.full((B, M), 0.5, dtype=dtype) \
        if (cfg.relskewstates and not light) else None

    sl = slice(startmark, endmark + 1)
    for b, n in enumerate(focal_ids):
        shig[b], f2ig[b] = ped.fixtrees(n)
        if mask_mode == "missing":
            f2ig[b] = ped.missing_flag2_mask(n)
        slots = ped.family_slots(n)
        focal = ped.by_id(n)
        desc[b] = focal.descendants
        if selfgen is not None:
            selfgen[b] = max(focal.gen - 2, 0)
        if relh is not None and focal.relhaplo is not None:
            relh[b] = focal.relhaplo[sl]
        if parity and focal.gen < 2:
            # the reference truncates gen<2 analysis to shift modes {0,1}
            # (cnF2freq.cpp:5359); default mode keeps the full symmetric
            # shift set (a superset — harmless, and avoids special cases)
            shig[b] |= (cfg.numshifts - 1) & ~1
        for s, sid in enumerate(slots):
            if not sid:
                continue
            ind = ped.by_id(sid)
            exists[b, s] = True
            slot_ind[b, s] = sid
            emptyslot[b, s] = ind.empty
            if not light:
                md[b, s] = ind.markerdata[sl]
                ms[b, s] = ind.markersure[sl]
                hw[b, s] = ind.haploweight[sl]
            # grandparent slots are tops by depth; others by founder
            # flag; two-generation haplotyping units stop at the
            # parents, no-haplotyping ones at the grandparents
            # (attopnow: genwidth == haplotyping, cnF2freq.cpp:1095)
            is_gp = s not in (0, cfg.parent_slot(0), cfg.parent_slot(1))
            attop[b, s] = ind.founder \
                or (is_gp and (cfg.numgen == 3 or cfg.deep_walk)) \
                or (cfg.numgen == 2 and s != 0 and cfg.haplotyping)
        # duplicate-member slot groups (fixtrees relmap members with
        # multiple flag2 bits; ignoreflag2 rule 2, cnF2freq.cpp:3478):
        # probe stats must tie the group's phase bits.  Each group of k
        # slots contributes k-1 pair constraints (anchor, other); the
        # exact equality indicator is the average over all 2**constraints
        # sign variants of prod (-1)^(phase bit of flipped slot).
        groups = {}
        for s, sid in enumerate(slots):
            if sid and not emptyslot[b, s]:
                groups.setdefault(sid, []).append(s)
        dgroups = [v for v in groups.values() if len(v) > 1]
        cons = [(g[0], s) for g in dgroups for s in g[1:]]
        unit_cons.append(cons)
    n_local = max((1 << len(c) for c in unit_cons), default=1)
    NV = n_variants if n_variants is not None else max(4, n_local)
    # NV == 1 is the "dedup rules off" convention (plain standard-space
    # runs); an insufficient NV > 1 would silently mis-average, so raise
    if 1 < NV < n_local:
        raise ValueError(
            f"a family needs {n_local} probe-dedup variants but the "
            f"batch was built with n_variants={NV}; pass the cohort "
            "maximum (Driver._n_variants)")
    NV = max(NV, 1)
    dup_flip = np.zeros((B, NV, S), dtype=bool)
    for b, cons in enumerate(unit_cons):
        n_u = 1 << len(cons)
        for v in range(NV):
            t = v % n_u
            for ci, (anchor, other) in enumerate(cons):
                if (t >> ci) & 1:
                    dup_flip[b, v, other] ^= True
                    dup_flip[b, v, anchor] ^= True
    return FamilyBatch(md=md, ms=ms, hw=hw, exists=exists, attop=attop,
                       flag2ignore=f2ig, shiftignore=shig, descendants=desc,
                       slot_ind=slot_ind, emptyslot=emptyslot,
                       dup_flip=dup_flip, selfgen=selfgen, relh=relh)
