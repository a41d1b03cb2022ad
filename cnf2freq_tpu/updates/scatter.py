"""Vectorized host-side accumulator scatter.

The per-(focal, family-member) merges of scan statistics onto shared
per-individual accumulators (moveinfprobs/movehaplos,
cnF2freq.cpp:3577-3616) were Python loops over the cohort — at B=1000
they cost ~100x the device scan they post-process.  Here the same
arithmetic runs as batched numpy over [B, 7, M] tensors:

* duplicate family slots holding the same individual (selfing, shared
  grandparents) are folded with a [B, 7, 7] same-id mask instead of
  per-focal dicts;
* the per-individual accumulation is one ``np.add.at`` over the
  first-occurrence rows.

Exact loop-form parity is pinned by tests/test_scatter.py.
"""

from __future__ import annotations

import math

import numpy as np

_MOVEHAPLO_TINY = math.exp(-400) * 5e-6 * 5e-6 * 0.5  # cnF2freq.cpp:3605


def _id_lut(ind_index: dict, max_id: int) -> np.ndarray:
    # size by the full registry, not just this chunk's ids: a streamed
    # chunk may not contain the highest-id individual
    size = max(max_id, max(ind_index) if ind_index else 0) + 1
    lut = np.zeros(size, dtype=np.int64)
    for n, i in ind_index.items():
        lut[n] = i
    return lut


def _dup_masks(slot_ind: np.ndarray):
    """slot_ind [B, 7] -> (eq [B,7,7] same-individual mask,
    first [B,7] first-occurrence mask, cnt [B,7] duplicate counts)."""
    ids = slot_ind
    occupied = ids > 0
    eq = (ids[:, :, None] == ids[:, None, :]) & occupied[:, :, None] \
        & occupied[:, None, :]
    S = ids.shape[1]
    tri = np.tril(np.ones((S, S), dtype=bool), -1)      # s' < s
    first = occupied & ~(eq & tri[None]).any(axis=2)
    cnt = eq.sum(axis=2)
    return eq, first, cnt


def scatter_haplos(slot_ind: np.ndarray, hw: np.ndarray,
                   descendants: np.ndarray, lo: int,
                   b12: np.ndarray, mask: np.ndarray,
                   haplobase: np.ndarray, haplocount: np.ndarray,
                   ind_index: dict) -> None:
    """movehaplos: b12 [B, M, 7, 2], mask [B, M, 7] -> accumulators
    [NI, Mtot].  hw: [B, 7, M] gathered haploweights (FamilyBatch.hw)."""
    B, M = b12.shape[:2]
    eq, first, _ = _dup_masks(slot_ind)

    masked = np.where(mask[..., None], b12, 0.0)         # [B, M, 7, 2]
    tot = np.einsum("bst,bmtk->bmsk", eq.astype(b12.dtype), masked)
    used_slot = mask & (b12.sum(axis=-1) > 0)            # [B, M, 7]
    used = np.einsum("bst,bmt->bms", eq.astype(b12.dtype),
                     used_slot.astype(b12.dtype)) > 0

    unlocked = np.abs(hw - 0.5) < 0.5 - 1e-12            # [B, 7, M]
    take = used & np.transpose(unlocked, (0, 2, 1))      # [B, M, 7]
    b1 = tot[..., 0] + _MOVEHAPLO_TINY
    b2 = tot[..., 1] + _MOVEHAPLO_TINY
    den = b1 + b2
    safe = take & np.isfinite(den) & (den > 0)
    contrib = np.where(safe, b1 / np.where(safe, den, 1.0), 0.0) * \
        descendants[:, None, None]
    take = safe
    count = np.where(take, 1.0, 0.0) * descendants[:, None, None]

    bs, ss = np.nonzero(first)
    rows = _id_lut(ind_index, int(slot_ind.max()))[slot_ind[bs, ss]]
    sl = slice(lo, lo + M)
    np.add.at(haplobase[:, sl], rows, contrib[bs, :, ss])
    np.add.at(haplocount[:, sl], rows, count[bs, :, ss])


def scatter_infprobs(slot_ind: np.ndarray, descendants: np.ndarray,
                     lo: int, accum: np.ndarray, infacc: np.ndarray,
                     ind_index: dict) -> None:
    """moveinfprobs: accum [B, M, 7, 2, 2] -> infacc [NI, Mtot, 2, 2]."""
    B, M = accum.shape[:2]
    eq, first, cnt = _dup_masks(slot_ind)

    fsum = accum[:, :, 0, 0, :].sum(axis=-1)             # [B, M]
    inv = np.where(fsum > 0, 1.0 / np.where(fsum > 0, fsum, 1.0), 0.0)
    tot = np.einsum("bst,bmtjk->bmsjk", eq.astype(accum.dtype), accum)
    norm = 2.0 / (2.0 ** cnt) * descendants[:, None]     # [B, 7]
    contrib = tot * inv[:, :, None, None, None] * \
        norm[:, None, :, None, None]

    bs, ss = np.nonzero(first)
    rows = _id_lut(ind_index, int(slot_ind.max()))[slot_ind[bs, ss]]
    np.add.at(infacc[:, lo:lo + M], rows, contrib[bs, :, ss])


def scatter_coherence(slot_ind: np.ndarray, descendants: np.ndarray,
                      lo: int, coh: np.ndarray, coh_num: np.ndarray,
                      coh_den: np.ndarray, ind_index: dict) -> None:
    """coh [B, M, 7] adjacent-phase coherence -> per-individual weighted
    sums; every occupied slot contributes (duplicates add twice, as the
    loop form did)."""
    B, M = coh.shape[:2]
    occupied = slot_ind > 0
    bs, ss = np.nonzero(occupied)
    rows = _id_lut(ind_index, int(slot_ind.max()))[slot_ind[bs, ss]]
    desc = descendants[bs].astype(coh.dtype)
    sl = slice(lo, lo + M)
    np.add.at(coh_num[:, sl], rows, desc[:, None] * coh[bs, :, ss])
    np.add.at(coh_den[:, sl], rows,
              np.broadcast_to(desc[:, None], (len(bs), M)))


def apply_skewterms(hw: np.ndarray, rh: np.ndarray, haplobase: np.ndarray,
                    haplocount: np.ndarray, descendants: np.ndarray,
                    weights: np.ndarray, tsel: np.ndarray) -> np.ndarray:
    """calcskewterms clause adjustment (cnF2freq.cpp:4469-4531,
    5929-5959), batched over the cohort.

    hw, rh: [B, Mc] per-focal haploweight/relhaplo rows; haplobase/
    haplocount: [B, Mc] rows for the focals; weights [B, Mc-?, T]
    modified in place on the first Mc-1 markers; tsel [T] turn masks
    flipping the focal."""
    B, Mc = hw.shape
    Mi = Mc - 1

    def slog(x):
        return np.log(np.maximum(x, 1e-323))

    skew = np.zeros((B, Mi))
    rhs = rh[:, :Mi]
    lrh, l1rh = slog(rhs), slog(1 - rhs)
    for ix in range(2):
        w_ = hw[:, 1 - ix:Mi + 1 - ix]
        wo = hw[:, ix:Mi + ix]
        lw, l1w = slog(w_), slog(1 - w_)
        lo_, l1o = slog(wo), slog(1 - wo)
        val = wo
        now = (w_ * val * (lrh + lw + lo_) +
               (1 - w_) * (1 - val) * (lrh + l1w + l1o) +
               w_ * (1 - val) * (l1rh + lw + l1o) +
               (1 - w_) * val * (l1rh + l1w + lo_))
        then = ((1 - w_) * val * (lrh + l1w + lo_) +
                w_ * (1 - val) * (lrh + lw + l1o) +
                (1 - w_) * (1 - val) * (l1rh + l1w + l1o) +
                w_ * val * (l1rh + lw + lo_))
        skew -= then - now
        hcx = haplocount[:, ix:Mi + ix]
        hbx = haplobase[:, ix:Mi + ix]
        gonext = np.where(hcx > 0, hbx / np.maximum(hcx, 1e-300), 0.0)
        skew += np.where((hcx > 0) & ((gonext - w_) * (w_ - 0.5) < 0),
                         25000.0, 0.0)
    w = skew * 0.5
    w = np.where(np.isfinite(w), w, np.sign(w) * 25000.0)
    w = np.clip(w, -25000.0, 25000.0)
    w = w * descendants[:, None]
    weights[:, :Mi, :][:, :, tsel] -= w[:, :, None]
    return weights
