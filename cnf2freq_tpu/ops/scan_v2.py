"""Feature-leading chromosome scan (the zero-marshalling hot path).

The standard path materialises the factored emission blocks (2 x 393 MB
at B=1000, M=192), assembles E from them, scans in [B, M, NS, S] layout
(whose (8, 64) minor dims pad to (8, 128) vregs — 2x physical HBM), and
transposes three sweep tensors into (b, m)-tile layout for the fused
stats kernel.  Those copies and padding, not arithmetic, dominate the
iteration (bench/trace_scan.py).

This module replaces the data layout end to end:

    slot tensors [7, ..., M, R]   (R = batch padded to 8*128 tiles)
      | emission_tiles (Pallas): blocks recomputed in VMEM from ~50
      |   scalars per (b, m) — nothing bigger than E ever exists
      v
    e  [M, X=512, R]              (feature-leading, batch on lanes)
      | fb_sweeps_v2_pallas (Pallas, TPU default): carry in VMEM
      |   across the marker grid, butterfly-FWHT transitions in full
      |   f32; fb_scan_v2 (lax.scan) is the XLA fallback/spec
      v
    fw_pre/bw [M, X, R], factors [M, NS, R]
      | stats kernel reads (m, b-tile) blocks straight out of the scan
      |   outputs via BlockSpec index maps — no transposes at all;
      | turn_weights_v2_pallas: weighted xor-correlation at the 128
      |   turn offsets in one fused pass
      v
    b12 / infprob accum / pair / turn weights

Same update statistics as engine.chromosome_scan (pinned by
tests/test_scan_v2.py; the Pallas forms are exact against the XLA
forms in f64 interpret mode).  See docs/PERFORMANCE.md for the
traffic analysis behind the kernel choices; the linear-memory /
temporal-parallel HMM literature (PAPERS.md) motivates the stored
fw/bw + per-marker factor scheme and the marker-axis blocking left as
future work for extreme chromosome lengths.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MINFACTOR, ModelConfig, RuntimeParams
from ..hmm.family import FamilyBatch
from ..hmm.transition import hadamard, interval_recomb, transition_eigenvalues
from . import stats_pallas as sp

_TS, _TL = 8, 128
_TN = _TS * _TL


# ---------------------------------------------------------------------------
# Input prep: FamilyBatch -> feature-leading slot tensors
# ---------------------------------------------------------------------------
class SlotTensors(NamedTuple):
    md: jnp.ndarray    # [7, 2, M, nb, TS, TL] int32
    ms: jnp.ndarray    # [7, 2, M, nb, TS, TL]
    hw: jnp.ndarray    # [7, M, nb, TS, TL]
    ex: jnp.ndarray    # [7, nb, TS, TL] int32
    at: jnp.ndarray    # [7, nb, TS, TL] int32
    f2: jnp.ndarray    # [nb, TS, TL] int32
    sh: jnp.ndarray    # [nb, TS, TL] int32
    em: jnp.ndarray    # [7, nb, TS, TL] int32 (emptyslot)
    df: jnp.ndarray    # [NV, 7, nb, TS, TL] int32 (dup_flip variants)

    @property
    def nb(self) -> int:
        return self.f2.shape[0]


def prep_slots(fb: FamilyBatch, dtype) -> SlotTensors:
    B, _, M, _ = fb.md.shape
    nb = -(-B // _TN)
    R = nb * _TN

    def padb(x):  # pad batch axis 0 to R
        pad = [(0, R - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    md = jnp.transpose(padb(fb.md), (1, 3, 2, 0))          # [7, 2, M, R]
    ms = jnp.transpose(padb(fb.ms.astype(dtype)), (1, 3, 2, 0))
    hw = jnp.transpose(padb(fb.hw.astype(dtype)), (1, 2, 0))   # [7, M, R]
    ex = padb(fb.exists.astype(jnp.int32)).T               # [7, R]
    at = padb(fb.attop.astype(jnp.int32)).T
    f2 = padb(fb.flag2ignore)
    sh = padb(fb.shiftignore)
    em = padb(fb.emptyslot.astype(jnp.int32)).T            # [7, R]
    df = jnp.transpose(padb(fb.dup_flip.astype(jnp.int32)),
                       (1, 2, 0))                          # [4, 7, R]
    t = (nb, _TS, _TL)
    return SlotTensors(
        md=md.reshape((7, 2, M) + t), ms=ms.reshape((7, 2, M) + t),
        hw=hw.reshape((7, M) + t), ex=ex.reshape((7,) + t),
        at=at.reshape((7,) + t), f2=f2.reshape(t), sh=sh.reshape(t),
        em=em.reshape((7,) + t), df=df.reshape((-1, 7) + t))


# ---------------------------------------------------------------------------
# Emission kernel: e[m, X, tile] from slot data
# ---------------------------------------------------------------------------
def _e_tile(md, ms, hw, exists, attop, cfg: ModelConfig, dtype):
    """E [2(s2), 2(s1), 2(s0), 8(fp1), 8(fp0)] + T for one (m, b-tile):
    assemble_e_all semantics on in-VMEM blocks."""
    def slotL(s):
        return sp.SlotL(md=md[s], ms=ms[s], hw=hw[s], exists=exists[s],
                        attop=attop[s])

    focal = slotL(0)
    par = [slotL(cfg.parent_slot(k)) for k in range(2)]
    gps = [[slotL(cfg.grandparent_slot(k, j)) for j in range(2)]
           for k in range(2)]
    hap = cfg.haplotyping
    froot, vA, svA, vB, svB = sp.root_block_L(focal, haplotyping=hap,
                                              dtype=dtype)
    pbs = []
    for k in range(2):
        vk, svk = (vA, svA) if k == 0 else (vB, svB)
        pb = sp.parent_block_L(par[k], gps[k][0], gps[k][1], vk, svk,
                               haplotyping=hap)      # [r, f, p, sk, *T]
        # no flag2ignore mask here: assemble_e_all sums all paths, and
        # parent_block_L's canonical-path weights already zero every
        # path bit a vacant/attop-pruned slot cannot consume (pinned by
        # test_emission_tiles_match_assemble_e incl. vacant-slot
        # families)
        pbs.append(pb.sum(axis=2))                   # [r, f, sk, *T]

    T = md.shape[2:]
    # e[v,u,t,b,a] = sum_r froot[r,t] * pbs0[r,a,u] * pbs1[r,b,v]
    # (python-level stack, not .at[].set: Mosaic cannot lower scatter)
    planes = []
    for v in range(2):
        for u in range(2):
            for t in range(2):
                acc = jnp.zeros((8, 8) + T, dtype=dtype)
                for r in range(2):
                    acc = acc + (froot[r, t] * pbs[0][r][:, u])[None, :] * \
                        pbs[1][r][:, v][:, None]
                planes.append(acc)
    e = jnp.stack(planes, axis=0).reshape((2, 2, 2, 8, 8) + T)
    # focal attop: E is the root term alone, constant over states and the
    # upper shift bits (assemble_e_all tops path)
    tops = froot.sum(axis=0)                          # [t(2), *T]
    tops_e = jnp.broadcast_to(tops[None, None, :, None, None],
                              (2, 2, 2, 8, 8) + T)
    return jnp.where(focal.attop, tops_e, e)


def _e_kernel(md_ref, ms_ref, hw_ref, ex_ref, at_ref,
              e_ref, *, cfg: ModelConfig):
    T = (_TS, _TL)
    dtype = e_ref.dtype
    md = md_ref[:].reshape((7, 2) + T)
    ms = ms_ref[:].reshape((7, 2) + T)
    hw = hw_ref[:].reshape((7,) + T)
    exists = ex_ref[:].reshape((7,) + T) != 0
    attop = at_ref[:].reshape((7,) + T) != 0
    e = _e_tile(md, ms, hw, exists, attop, cfg, dtype)
    e_ref[:] = e.reshape(e_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("M", "cfg", "dtype", "interpret"))
def emission_tiles(st: SlotTensors, M: int, cfg: ModelConfig,
                   dtype=jnp.float32, interpret: bool = False):
    """e [M, 512, nb, TS, TL]."""
    nb = st.nb
    grid = (M, nb)

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    e = pl.pallas_call(
        functools.partial(_e_kernel, cfg=cfg),
        grid=grid,
        in_specs=[
            bspec((7, 2, 1, 1, _TS, _TL), lambda m, b: (0, 0, m, b, 0, 0)),
            bspec((7, 2, 1, 1, _TS, _TL), lambda m, b: (0, 0, m, b, 0, 0)),
            bspec((7, 1, 1, _TS, _TL), lambda m, b: (0, m, b, 0, 0)),
            bspec((7, 1, _TS, _TL), lambda m, b: (0, b, 0, 0)),
            bspec((7, 1, _TS, _TL), lambda m, b: (0, b, 0, 0)),
        ],
        out_specs=bspec((1, 512, 1, _TS, _TL), lambda m, b: (m, 0, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, 512, nb, _TS, _TL), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(st.md, st.ms, st.hw, st.ex, st.at)
    return e


# ---------------------------------------------------------------------------
# Feature-leading forward-backward scan
# ---------------------------------------------------------------------------
class FBv2(NamedTuple):
    fw_pre: jnp.ndarray    # [M, X, R]
    fw_post: jnp.ndarray   # [M, X, R]
    bw: jnp.ndarray        # [M, X, R]
    fw_pre_f: jnp.ndarray  # [M, NS, R]
    fw_post_f: jnp.ndarray
    bw_f: jnp.ndarray


def _emit_norm_v2(p, e, logf, NS, S):
    """p, e: [X, R]; logf [NS, R]."""
    p = jnp.where(p < 1e-300, 0.0, p)
    pe = (p * e).reshape(NS, S, -1)
    s = pe.sum(axis=1, keepdims=True)                 # [NS, 1, R]
    ok = s > 0
    pn = jnp.where(ok, pe / jnp.where(ok, s, 1.0), 0.0)
    logf = jnp.where(ok[:, 0], logf + jnp.log(jnp.where(ok[:, 0], s[:, 0],
                                                        1.0)), MINFACTOR)
    return pn.reshape(p.shape), logf


def _transition_v2(p, lam_row, H, NS, S):
    """p [X, R] -> H diag(lam) H p / S per shift block."""
    ph = jnp.einsum("gh,nhr->ngr", H, p.reshape(NS, S, -1))
    ph = ph * lam_row[None, :, None]
    q = jnp.einsum("gh,nhr->ngr", H, ph) / S
    return q.reshape(p.shape)


def fb_scan_v2(e: jnp.ndarray, dists: jnp.ndarray, cfg: ModelConfig,
               params: RuntimeParams, ratemat=None) -> FBv2:
    """e: [M, X, R] from emission_tiles (tile axes flattened)."""
    M, X, R = e.shape
    S, NS = cfg.numtypes, cfg.numshifts
    dtype = e.dtype
    r = interval_recomb(cfg, params, dists, ratemat=ratemat)
    lam = transition_eigenvalues(cfg, r).astype(dtype)      # [M-1, S]
    lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dtype)], 0)
    H = jnp.asarray(hadamard(int(S).bit_length() - 1, str(dtype)))

    p0 = jnp.full((X, R), cfg.evengen, dtype=dtype)
    f0 = jnp.zeros((NS, R), dtype=dtype)

    def fwd_step(carry, xs):
        p, logf = carry
        ei, w = xs
        pre, pre_f = p, logf
        pn, logf = _emit_norm_v2(p, ei, logf, NS, S)
        return (_transition_v2(pn, w, H, NS, S), logf), (pre, pre_f, pn,
                                                         logf)

    _, (fw_pre, fw_pre_f, fw_post, fw_post_f) = jax.lax.scan(
        fwd_step, (p0, f0), (e, lam_pad), unroll=8)

    ones = jnp.ones((X, R), dtype=dtype)

    def bwd_step(carry, xs):
        p, logf = carry
        ei, w = xs
        pn, logf = _emit_norm_v2(p, ei, logf, NS, S)
        pprev = _transition_v2(pn, w, H, NS, S)
        return (pprev, logf), (pprev, logf)

    _, (bw_rest, bw_rest_f) = jax.lax.scan(
        bwd_step, (ones, f0), (e[1:], lam), unroll=8, reverse=True)
    bw = jnp.concatenate([bw_rest, ones[None]], axis=0)
    bw_f = jnp.concatenate([bw_rest_f, f0[None]], axis=0)
    return FBv2(fw_pre=fw_pre, fw_post=fw_post, bw=bw, fw_pre_f=fw_pre_f,
                fw_post_f=fw_post_f, bw_f=bw_f)


# ---------------------------------------------------------------------------
# Marker-blocked (checkpointed) forward-backward: O(block) device memory
# for arbitrarily long chromosomes.  Phase A/B carry-only sweeps store
# only block-boundary carries; phase C recomputes each block's sweep
# tensors from its boundaries (the lax.scan analogue of the reference's
# fillortake binary-tree block cache, cnF2freq.cpp:1675-1776, and the
# linear-memory fb literature in PAPERS.md).
# ---------------------------------------------------------------------------
def _wht_matrix(cfg, dtype):
    return jnp.asarray(hadamard(int(cfg.numtypes).bit_length() - 1,
                                str(dtype)))


def fb_carry_fwd(e: jnp.ndarray, lam_pad: jnp.ndarray, p0, f0,
                 cfg: ModelConfig):
    """Carry-only forward over one block: e [K, X, R], lam_pad [K, S]
    (row j = interval leaving marker j; last row crosses the block
    boundary, identity for the final block).  Returns the pre-emission
    carry entering the next block."""
    S, NS = cfg.numtypes, cfg.numshifts
    H = _wht_matrix(cfg, e.dtype)

    def step(carry, xs):
        p, logf = carry
        ei, w = xs
        pn, logf = _emit_norm_v2(p, ei, logf, NS, S)
        return (_transition_v2(pn, w, H, NS, S), logf), None

    (p, f), _ = jax.lax.scan(step, (p0, f0), (e, lam_pad), unroll=8)
    return p, f


def fb_carry_bwd(e: jnp.ndarray, lam_pad: jnp.ndarray, lam_below,
                 bT, bfT, cfg: ModelConfig):
    """Carry-only backward over one block: from the carry at the block's
    last marker (bT = bw[last], bfT) consume markers K-1..0; the final
    step's transition crosses the boundary below via lam_below [S]
    (unused output for block 0).  Returns bw at the previous block's
    last marker."""
    S, NS = cfg.numtypes, cfg.numshifts
    H = _wht_matrix(cfg, e.dtype)
    lam_rows = jnp.concatenate([lam_below[None], lam_pad[:-1]], axis=0)

    def step(carry, xs):
        p, logf = carry
        ei, w = xs
        pn, logf = _emit_norm_v2(p, ei, logf, NS, S)
        return (_transition_v2(pn, w, H, NS, S), logf), None

    (p, f), _ = jax.lax.scan(step, (bT, bfT), (e, lam_rows), unroll=8,
                             reverse=True)
    return p, f


def fb_scan_v2_block(e: jnp.ndarray, lam_pad: jnp.ndarray, p0, f0, bT,
                     bfT, cfg: ModelConfig) -> FBv2:
    """Full sweep tensors for one block from its boundary carries —
    exactly the slice [iK:(i+1)K] of the whole-chromosome fb_scan_v2
    (pinned by tests/test_blocked.py)."""
    K, X, R = e.shape
    S, NS = cfg.numtypes, cfg.numshifts
    H = _wht_matrix(cfg, e.dtype)

    def fwd_step(carry, xs):
        p, logf = carry
        ei, w = xs
        pre, pre_f = p, logf
        pn, logf = _emit_norm_v2(p, ei, logf, NS, S)
        return (_transition_v2(pn, w, H, NS, S), logf), (pre, pre_f, pn,
                                                         logf)

    _, (fw_pre, fw_pre_f, fw_post, fw_post_f) = jax.lax.scan(
        fwd_step, (p0, f0), (e, lam_pad), unroll=8)

    def bwd_step(carry, xs):
        p, logf = carry
        ei, w = xs
        pn, logf = _emit_norm_v2(p, ei, logf, NS, S)
        pprev = _transition_v2(pn, w, H, NS, S)
        return (pprev, logf), (pprev, logf)

    _, (bw_rest, bw_rest_f) = jax.lax.scan(
        bwd_step, (bT, bfT), (e[1:], lam_pad[:-1]), unroll=8,
        reverse=True)
    bw = jnp.concatenate([bw_rest, bT[None]], axis=0)
    bw_f = jnp.concatenate([bw_rest_f, bfT[None]], axis=0)
    return FBv2(fw_pre=fw_pre, fw_post=fw_post, bw=bw, fw_pre_f=fw_pre_f,
                fw_post_f=fw_post_f, bw_f=bw_f)


def make_blocked_pieces(cfg: ModelConfig, params: RuntimeParams, dtype,
                        num_individuals: int, interpret: bool = False,
                        probe_rules: bool = False, n_variants: int = 1):
    """Jitted building blocks for the marker-blocked scan, shared across
    blocks/chunks/iterations (one compile per block shape)."""
    from ..hmm.probes import haplo_update_mask
    from ..parallel.collective import merge_haplos, merge_infprobs

    prep = jax.jit(lambda f: prep_slots(f, dtype))
    lamfn = jax.jit(lambda d, rm: transition_eigenvalues(
        cfg, interval_recomb(cfg, params, d, ratemat=rm)).astype(dtype))
    carry_f = jax.jit(lambda e, lp, p, f: fb_carry_fwd(e, lp, p, f, cfg))
    carry_b = jax.jit(lambda e, lp, lb, p, f:
                      fb_carry_bwd(e, lp, lb, p, f, cfg))
    blockfb = jax.jit(lambda e, lp, p0, f0, bT, bfT:
                      fb_scan_v2_block(e, lp, p0, f0, bT, bfT, cfg))
    total_fn = jax.jit(loglik_from_factors)

    @functools.partial(jax.jit, static_argnames=("K", "B"))
    def block_stats(st, fb2, total_r, lut, fb_blk, K: int, B: int):
        b12, accum, pair = stats_from_v2(st, fb2, total_r, K, B, cfg,
                                         dtype, interpret=interpret,
                                         probe_rules=probe_rules,
                                         n_variants=n_variants)
        hmask = haplo_update_mask(fb_blk, cfg)
        hb, hc = merge_haplos(b12, hmask, fb_blk.hw, fb_blk.slot_ind,
                              fb_blk.descendants, lut, num_individuals)
        inf = merge_infprobs(accum, fb_blk.slot_ind, fb_blk.descendants,
                             lut, num_individuals,
                             emptyslot=fb_blk.emptyslot if probe_rules
                             else None)
        return pair, hb, hc, inf

    def turn_fn(fb2, sh, desc, B):
        if interpret:
            return turn_weights_v2(fb2, sh, desc, cfg, B)
        return turn_weights_v2_pallas(fb2, sh, desc, cfg, B)

    return dict(prep=prep, lam=lamfn, carry_f=carry_f, carry_b=carry_b,
                blockfb=blockfb, total=total_fn, block_stats=block_stats,
                turn=jax.jit(turn_fn, static_argnames=("B",)))


def _blk_interp():
    return jax.default_backend() == "cpu"


def blocked_slice(fb_np, i: int, block: int):
    """Host FamilyBatch restricted to block i's markers."""
    import dataclasses
    sl = slice(i * block, (i + 1) * block)
    relh = fb_np.relh
    if relh is not None:
        relh = relh[:, sl]
    return dataclasses.replace(fb_np, md=fb_np.md[:, :, sl],
                               ms=fb_np.ms[:, :, sl],
                               hw=fb_np.hw[:, :, sl], relh=relh)


def _blk_inputs(fb_np, i, block, cfg, dt, pieces):
    fb_blk = blocked_slice(fb_np, i, block).map(jnp.asarray)
    st = pieces["prep"](fb_blk)
    e = emission_tiles(st, block, cfg, dtype=dt,
                       interpret=_blk_interp()).reshape(block, 512, -1)
    return fb_blk, st, e


def blocked_carries(fb_np, dists, ratemat, cfg: ModelConfig, block: int,
                    pieces):
    """Phases A/B of the marker-blocked scan for one batch chunk:
    carry-only forward and backward sweeps storing only block-boundary
    carries (O(M/block) of them).  Returns
    (total_np [B], total_r [R] device, lam_pad [M, S] device,
    fbound, bbound)."""
    B, _, M, _ = fb_np.md.shape
    assert M % block == 0, (M, block)
    nblk = M // block
    S, NS = cfg.numtypes, cfg.numshifts

    lam = pieces["lam"](jnp.asarray(dists), None if ratemat is None
                        else jnp.asarray(ratemat))          # [M-1, S]
    dt = lam.dtype
    lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dt)], 0)

    R = (-(-B // _TN)) * _TN
    p = jnp.full((NS * S, R), cfg.evengen, dtype=dt)
    f = jnp.zeros((NS, R), dtype=dt)
    fbound = []
    for i in range(nblk):
        fbound.append((p, f))
        _, _, e = _blk_inputs(fb_np, i, block, cfg, dt, pieces)
        p, f = pieces["carry_f"](e, lam_pad[i * block:(i + 1) * block],
                                 p, f)

    st0 = pieces["prep"](blocked_slice(fb_np, 0, block).map(jnp.asarray))
    total_r = pieces["total"](f, st0.sh)

    bT = jnp.ones((NS * S, R), dtype=dt)
    bfT = jnp.zeros((NS, R), dtype=dt)
    bbound = [None] * nblk
    for i in range(nblk - 1, -1, -1):
        bbound[i] = (bT, bfT)
        below = lam_pad[i * block - 1] if i > 0 else \
            jnp.ones(S, dtype=dt)
        _, _, e = _blk_inputs(fb_np, i, block, cfg, dt, pieces)
        bT, bfT = pieces["carry_b"](e, lam_pad[i * block:(i + 1) * block],
                                    below, *bbound[i])
    return np.asarray(total_r)[:B], total_r, lam_pad, fbound, bbound


def blocked_block_pass(fb_np, i: int, block: int, lam_pad, fbound_i,
                       bbound_i, total_r, lut, cfg: ModelConfig, pieces,
                       with_turn: bool = True):
    """Phase C for one (batch chunk, marker block): recompute the
    block's sweep tensors from its boundary carries and run the fused
    statistics (+ turn weights).  Returns
    (fb_blk, st, fb2, pair_i, hb_i, hc_i, inf_i, w-or-None) — pair/hb/
    hc/inf as device arrays for the block's marker span."""
    B = fb_np.md.shape[0]
    dt = lam_pad.dtype
    fb_blk, st, e = _blk_inputs(fb_np, i, block, cfg, dt, pieces)
    fb2 = pieces["blockfb"](e, lam_pad[i * block:(i + 1) * block],
                            *fbound_i, *bbound_i)
    pair_i, hb_i, hc_i, inf_i = pieces["block_stats"](
        st, fb2, total_r, lut, fb_blk, K=block, B=B)
    w = None
    if with_turn:
        w = pieces["turn"](fb2, st.sh, fb_blk.descendants.astype(dt), B=B)
    return fb_blk, st, fb2, pair_i, hb_i, hc_i, inf_i, w


def blocked_scan_chunk(fb_np, dists, ratemat, lut, cfg: ModelConfig,
                       params: RuntimeParams, block: int, pieces,
                       turn_consumer=None):
    """O(block)-device-memory scan + merge over one batch chunk.

    fb_np: host FamilyBatch (marker axis a multiple of ``block``);
    pieces: make_blocked_pieces output.  Three passes per chromosome
    (blocked_carries + per-block blocked_block_pass);
    turn_consumer(offset, w_dev) is called per block so turn weights
    never accumulate across blocks.  Returns
    (total [B], pair [B, M, 2, 2] np, hb, hc [NI, M] np,
    inf [NI, M, 2, 2] np)."""
    B, _, M, _ = fb_np.md.shape
    nblk = M // block
    total_np, total_r, lam_pad, fbound, bbound = blocked_carries(
        fb_np, dists, ratemat, cfg, block, pieces)

    pair = np.zeros((B, M, 2, 2))
    hb = hc = inf = None
    for i in range(nblk):
        _, _, _, pair_i, hb_i, hc_i, inf_i, w = blocked_block_pass(
            fb_np, i, block, lam_pad, fbound[i], bbound[i], total_r, lut,
            cfg, pieces, with_turn=turn_consumer is not None)
        sl = slice(i * block, (i + 1) * block)
        pair[:, sl] = np.asarray(pair_i)
        if hb is None:
            NI = hb_i.shape[0]
            hb = np.zeros((NI, M))
            hc = np.zeros((NI, M))
            inf = np.zeros((NI, M, 2, 2))
        hb[:, sl] = np.asarray(hb_i)
        hc[:, sl] = np.asarray(hc_i)
        inf[:, sl] = np.asarray(inf_i)
        if turn_consumer is not None:
            # consumer sees the block's turn weights plus the full
            # in-progress accumulators (filled through this block):
            # enough for exact relskew clause adjustment of the
            # PREVIOUS block including its right-boundary halo column
            turn_consumer(i * block, w, hb, hc)
    return total_np, pair, hb, hc, inf


def loglik_from_factors(f: jnp.ndarray, sh: jnp.ndarray) -> jnp.ndarray:
    """total [R] from final post-emission factors f [NS, R]."""
    NS, R = f.shape
    allowed = (jnp.arange(NS)[:, None] & sh.reshape(1, R)) == 0
    f = jnp.where(allowed, f, MINFACTOR)
    fmax = f.max(axis=0)
    return fmax + jnp.log(jnp.sum(jnp.where(allowed,
                                            jnp.exp(f - fmax[None]), 0.0),
                                  axis=0))


def combined_loglik_v2(fb2: FBv2, sh: jnp.ndarray) -> jnp.ndarray:
    """total [R] from fw_post_f [M, NS, R]; sh [nb, TS, TL] shiftignore."""
    return loglik_from_factors(fb2.fw_post_f[-1], sh)


def turn_weights_v2(fb2: FBv2, sh: jnp.ndarray, descendants: jnp.ndarray,
                    cfg: ModelConfig, B: int,
                    total_desc_scale: bool = True) -> jnp.ndarray:
    """[B, M, T] clause weights (turn_weights_fast on v2 layout).

    The joint index in the [M, X, R] layout is already shift-major
    (x = s*S + g), matching the WHT offset flip(t)*S + state_mask(t)."""
    M, X, R = fb2.fw_post.shape
    S, NS = cfg.numtypes, cfg.numshifts
    dtype = fb2.fw_post.dtype
    allowed = ((jnp.arange(NS)[:, None] & sh.reshape(1, R)) == 0)

    ff = jnp.where(allowed[None], fb2.fw_post_f, -jnp.inf)
    ffm = ff.max(axis=1)                                    # [M, R]
    fexp = jnp.where(allowed[None], jnp.exp(ff - ffm[:, None]), 0.0)
    bf = fb2.bw_f
    bfm = bf.max(axis=1)
    bexp = jnp.exp(bf - bfm[:, None])

    fwp = (fb2.fw_post.reshape(M, NS, S, R) * fexp[:, :, None]).reshape(
        M, X, R)
    bwp = (fb2.bw.reshape(M, NS, S, R) * bexp[:, :, None]).reshape(M, X, R)

    # factored 512-point WHT: H_X = H_NS (x) H_S, applied as one [S, S]
    # and one [NS, NS] contraction — 7x fewer FLOPs than the dense
    # [X, X] matmul, which made this the most expensive stage
    Hs = jnp.asarray(hadamard(int(S).bit_length() - 1, str(dtype)))
    Hn = jnp.asarray(hadamard(int(NS).bit_length() - 1, str(dtype)))

    def wht_x(x):
        x = x.reshape(M, NS, S, R)
        x = jnp.einsum("nt,mtgr->mngr", Hn, x)
        x = jnp.einsum("gh,mnhr->mngr", Hs, x)
        return x.reshape(M, X, R)

    fh = wht_x(fwp)
    bh = wht_x(bwp)
    D = wht_x(fh * bh) / X                                  # [M, X, R]

    idx = np.array([cfg.turn_shift_flip(t) * S + (t & cfg.turn_state_mask)
                    for t in range(cfg.numturns)])
    vals = D[:, idx]                                        # [M, T, R]
    tiny = jnp.asarray(np.finfo(str(dtype)).tiny, dtype=dtype)
    logv = jnp.log(jnp.maximum(vals, tiny))
    ok = vals > 0
    w = jnp.where(ok & ok[:, 0:1], logv - logv[:, 0:1], MINFACTOR)
    w = jnp.transpose(w[:, :, :B], (2, 0, 1))               # [B, M, T]
    if total_desc_scale:
        w = w * descendants[:, None, None]
    return w


# ---------------------------------------------------------------------------
# Fused forward-backward kernel in v2 layout: the carry lives in VMEM
# across the marker grid (the XLA scan bounces carry + per-step
# intermediates through HBM every step), transitions are butterfly FWHTs
# on the leading state axis, and only fw_pre / fw_post / bw + factors
# leave the chip.
# ---------------------------------------------------------------------------
def _emit_norm_tile(p, e, f, NS, S, dtype):
    """p, e: [NS, S, TS, TL]; f: [NS, TS, TL].  adjustprobs semantics
    (same arithmetic as _emit_norm_v2)."""
    clip = jnp.asarray(1e-300, dtype=dtype)
    p = jnp.where(p < clip, 0.0, p)
    pe = p * e
    s = pe.sum(axis=1)                                  # [NS, TS, TL]
    ok = s > 0
    sden = jnp.where(ok, s, 1.0)
    pn = jnp.where(ok[:, None], pe / sden[:, None], 0.0)
    f = jnp.where(ok, f + jnp.log(sden), MINFACTOR)
    return pn, f


def _transition_tile(pn, lam, NS, S):
    """Butterfly-WHT transition: H diag(lam) H pn / S along the state
    axis; lam: [S, TS, TL] (pre-broadcast eigenvalues)."""
    q = _fwht_lead(pn, 1, S) * lam[None]
    return _fwht_lead(q, 1, S) * (1.0 / S)


def _fbv2_fwd_kernel(e_ref, lam_ref, p0_ref, f0_ref, pre_ref, pref_ref,
                     post_ref, postf_ref, p_scr, f_scr, *, NS, S):
    m = pl.program_id(1)
    T = (_TS, _TL)
    dtype = p_scr.dtype

    @pl.when(m == 0)
    def _():
        p_scr[:] = p0_ref[:].reshape(p_scr.shape)
        f_scr[:] = f0_ref[:].reshape(f_scr.shape)

    p = p_scr[:].reshape((NS, S) + T)
    f = f_scr[:].reshape((NS,) + T)
    pre_ref[:] = p.reshape(pre_ref.shape)
    pref_ref[:] = f.reshape(pref_ref.shape)

    e = e_ref[:].reshape((NS, S) + T)
    pn, f = _emit_norm_tile(p, e, f, NS, S, dtype)
    post_ref[:] = pn.reshape(post_ref.shape)
    postf_ref[:] = f.reshape(postf_ref.shape)

    lam = lam_ref[:].reshape(S, 1, _TL)
    p_scr[:] = _transition_tile(pn, lam, NS, S).reshape(p_scr.shape)
    f_scr[:] = f.reshape(f_scr.shape)


def _fbv2_bwd_kernel(e_ref, lam_ref, bT_ref, bfT_ref, bw_ref, bwf_ref,
                     p_scr, f_scr, *, NS, S, nm):
    m = pl.program_id(1)
    T = (_TS, _TL)
    dtype = p_scr.dtype

    @pl.when(m == 0)
    def _():
        p_scr[:] = bT_ref[:].reshape(p_scr.shape)
        f_scr[:] = bfT_ref[:].reshape(f_scr.shape)

    p = p_scr[:].reshape((NS, S) + T)
    f = f_scr[:].reshape((NS,) + T)
    bw_ref[:] = p.reshape(bw_ref.shape)
    bwf_ref[:] = f.reshape(bwf_ref.shape)

    @pl.when(m < nm - 1)
    def _():
        e = e_ref[:].reshape((NS, S) + T)
        pn, f2 = _emit_norm_tile(p, e, f, NS, S, dtype)
        lam = lam_ref[:].reshape(S, 1, _TL)
        p_scr[:] = _transition_tile(pn, lam, NS, S).reshape(p_scr.shape)
        f_scr[:] = f2.reshape(f_scr.shape)


def fb_sweeps_v2_pallas(e: jnp.ndarray, dists: jnp.ndarray,
                        cfg: ModelConfig, params: RuntimeParams,
                        ratemat=None, interpret: bool = False,
                        lam_pad=None, init_fwd=None,
                        init_bwd=None) -> FBv2:
    """fb_scan_v2 as two fused Pallas sweeps.  e: [M, X, R].

    Boundary-carry generalisation (the kernel form of
    fb_scan_v2_block): ``lam_pad`` [M, S] supplies the per-interval
    eigenvalue rows directly (row j = interval leaving marker j; last
    row identity for a whole chromosome), ``init_fwd=(p0 [X,R], f0
    [NS,R])`` seeds the forward carry and ``init_bwd=(bT, bfT)`` the
    backward carry at the last marker — defaults reproduce the
    whole-chromosome sweep (evengen prior / all-ones backward)."""
    M, X, R = e.shape
    S, NS = cfg.numtypes, cfg.numshifts
    dtype = e.dtype
    nb = R // _TN
    if lam_pad is None:
        r = interval_recomb(cfg, params, dists, ratemat=ratemat)
        lam = transition_eigenvalues(cfg, r).astype(dtype)   # [M-1, S]
        lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dtype)],
                                  0)
    else:
        lam_pad = lam_pad.astype(dtype)
    if init_fwd is None:
        init_fwd = (jnp.full((X, R), cfg.evengen, dtype=dtype),
                    jnp.zeros((NS, R), dtype=dtype))
    if init_bwd is None:
        init_bwd = (jnp.ones((X, R), dtype=dtype),
                    jnp.zeros((NS, R), dtype=dtype))
    # eigenvalues vary along the leading state axis of the carry: feed
    # them broadcast over the lane axis only (one vreg row per state;
    # the kernel broadcasts over sublanes in-register)
    lam_b = jnp.broadcast_to(lam_pad[:, :, None, None], (M, S, 1, _TL))

    t5 = (nb, _TS, _TL)
    ev = e.reshape((M, X) + t5)

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    espec_f = bspec((1, X, 1, _TS, _TL), lambda b, m: (m, 0, b, 0, 0))
    espec_b = bspec((1, X, 1, _TS, _TL),
                    lambda b, m, nm=M: (nm - 1 - m, 0, b, 0, 0))
    lspec_f = bspec((1, S, 1, _TL), lambda b, m: (m, 0, 0, 0))
    lspec_b = bspec((1, S, 1, _TL),
                    lambda b, m, nm=M: (jnp.maximum(nm - 2 - m, 0),
                                        0, 0, 0))
    ospec_f = bspec((1, X, 1, _TS, _TL), lambda b, m: (m, 0, b, 0, 0))
    ospec_b = bspec((1, X, 1, _TS, _TL),
                    lambda b, m, nm=M: (nm - 1 - m, 0, b, 0, 0))
    fspec_f = bspec((1, NS, 1, _TS, _TL), lambda b, m: (m, 0, b, 0, 0))
    fspec_b = bspec((1, NS, 1, _TS, _TL),
                    lambda b, m, nm=M: (nm - 1 - m, 0, b, 0, 0))
    # carry inits: resident per b-tile (index map ignores m, so the
    # block is DMA'd once per b, read only at m == 0)
    ispec_x = bspec((X, 1, _TS, _TL), lambda b, m: (0, b, 0, 0))
    ispec_f = bspec((NS, 1, _TS, _TL), lambda b, m: (0, b, 0, 0))
    p0t = init_fwd[0].reshape((X,) + t5)
    f0t = init_fwd[1].reshape((NS,) + t5)
    bTt = init_bwd[0].reshape((X,) + t5)
    bfTt = init_bwd[1].reshape((NS,) + t5)
    scratch = [pltpu.VMEM((X, _TS, _TL), dtype),
               pltpu.VMEM((NS, _TS, _TL), dtype)]
    shape_x = jax.ShapeDtypeStruct((M, X) + t5, dtype)
    shape_f = jax.ShapeDtypeStruct((M, NS) + t5, dtype)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)

    fw_pre, fw_pre_f, fw_post, fw_post_f = pl.pallas_call(
        functools.partial(_fbv2_fwd_kernel, NS=NS, S=S),
        grid=(nb, M),
        in_specs=[espec_f, lspec_f, ispec_x, ispec_f],
        out_specs=(ospec_f, fspec_f, ospec_f, fspec_f),
        out_shape=(shape_x, shape_f, shape_x, shape_f),
        compiler_params=cparams,
        scratch_shapes=scratch,
        interpret=interpret,
    )(ev, lam_b, p0t, f0t)

    bw, bw_f = pl.pallas_call(
        functools.partial(_fbv2_bwd_kernel, NS=NS, S=S, nm=M),
        grid=(nb, M),
        in_specs=[espec_b, lspec_b, ispec_x, ispec_f],
        out_specs=(ospec_b, fspec_b),
        out_shape=(shape_x, shape_f),
        compiler_params=cparams,
        scratch_shapes=scratch,
        interpret=interpret,
    )(ev, lam_b, bTt, bfTt)

    def flat(x, lead):
        return x.reshape(M, lead, R)

    return FBv2(fw_pre=flat(fw_pre, X), fw_post=flat(fw_post, X),
                bw=flat(bw, X), fw_pre_f=flat(fw_pre_f, NS),
                fw_post_f=flat(fw_post_f, NS), bw_f=flat(bw_f, NS))


# ---------------------------------------------------------------------------
# Fused turn-weight kernel: posterior-weighted xor-correlation at the 128
# turn offsets, one pass over (m, b-tile) blocks.  The XLA form reads and
# writes ~6 GB of [M, X, R] intermediates per chromosome (weighted
# sweeps, three WHT transforms, offset gather, log ratios); here the
# whole chain runs in VMEM per tile with butterfly FWHTs on the leading
# (vreg-index) axes, so HBM traffic is just fw_post + bw in and [M, T, R]
# out.
# ---------------------------------------------------------------------------
def _fwht_lead(x, axis: int, n: int):
    """In-register FWHT along a leading axis of length n (power of 2);
    all reshapes/stacks act on vreg-index dims, no lane movement."""
    for k in range(n.bit_length() - 1):
        h = 1 << k
        pre = x.shape[:axis]
        post = x.shape[axis + 1:]
        v = x.reshape(pre + (n // (2 * h), 2, h) + post)
        ix = (slice(None),) * (axis + 1)
        a = v[ix + (0,)]
        b = v[ix + (1,)]
        x = jnp.stack([a + b, a - b], axis=axis + 1).reshape(
            pre + (n,) + post)
    return x


def _turn_kernel(fwp_ref, bw_ref, fwf_ref, bwf_ref, sh_ref, w_ref, *,
                 idx, NS, S):
    T = (_TS, _TL)
    dtype = w_ref.dtype
    fw = fwp_ref[:].reshape((NS, S) + T)
    bw = bw_ref[:].reshape((NS, S) + T)
    ff = fwf_ref[:].reshape((NS,) + T)
    bf = bwf_ref[:].reshape((NS,) + T)
    sh = sh_ref[:].reshape(T)

    n_iota = jax.lax.broadcasted_iota(jnp.int32, (NS,) + T, 0)
    allowed = (n_iota & sh) == 0
    big = jnp.asarray(-1e38, dtype=dtype)
    ffm = jnp.max(jnp.where(allowed, ff, big), axis=0)
    fexp = jnp.where(allowed, jnp.exp(ff - ffm), 0.0)
    bfm = jnp.max(bf, axis=0)
    bexp = jnp.exp(bf - bfm)

    f = fw * fexp[:, None]
    b = bw * bexp[:, None]
    f = _fwht_lead(_fwht_lead(f, 0, NS), 1, S)
    b = _fwht_lead(_fwht_lead(b, 0, NS), 1, S)
    D = _fwht_lead(_fwht_lead(f * b, 0, NS), 1, S) * (1.0 / (NS * S))

    vals = jnp.stack([D[i // S, i % S] for i in idx], axis=0)
    tiny = jnp.asarray(np.finfo(np.dtype(str(dtype))).tiny, dtype=dtype)
    logv = jnp.log(jnp.maximum(vals, tiny))
    ok = vals > 0
    w = jnp.where(ok & ok[0:1], logv - logv[0:1], MINFACTOR)
    w_ref[:] = w.reshape(w_ref.shape)


def turn_weights_v2_pallas(fb2: FBv2, sh: jnp.ndarray,
                           descendants: jnp.ndarray, cfg: ModelConfig,
                           B: int, total_desc_scale: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    """turn_weights_v2 as one fused Pallas pass (same outputs)."""
    M, X, R = fb2.fw_post.shape
    S, NS = cfg.numtypes, cfg.numshifts
    nb = R // _TN
    dtype = fb2.fw_post.dtype
    idx = tuple(int(cfg.turn_shift_flip(t)) * S +
                (t & cfg.turn_state_mask) for t in range(cfg.numturns))
    Tn = cfg.numturns
    t5 = (nb, _TS, _TL)

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    w = pl.pallas_call(
        functools.partial(_turn_kernel, idx=idx, NS=NS, S=S),
        grid=(M, nb),
        in_specs=[
            bspec((1, X, 1, _TS, _TL), lambda m, b: (m, 0, b, 0, 0)),
            bspec((1, X, 1, _TS, _TL), lambda m, b: (m, 0, b, 0, 0)),
            bspec((1, NS, 1, _TS, _TL), lambda m, b: (m, 0, b, 0, 0)),
            bspec((1, NS, 1, _TS, _TL), lambda m, b: (m, 0, b, 0, 0)),
            bspec((1, _TS, _TL), lambda m, b: (b, 0, 0)),
        ],
        out_specs=bspec((1, Tn, 1, _TS, _TL), lambda m, b: (m, 0, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Tn, nb, _TS, _TL), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fb2.fw_post.reshape((M, X) + t5), fb2.bw.reshape((M, X) + t5),
      fb2.fw_post_f.reshape((M, NS) + t5),
      fb2.bw_f.reshape((M, NS) + t5), sh)

    w = jnp.transpose(w.reshape(M, Tn, R)[:, :, :B], (2, 0, 1))
    if total_desc_scale:
        w = w * descendants[:, None, None]
    return w


# ---------------------------------------------------------------------------
# Stats kernel on v2 tensors (zero-copy via index maps)
# ---------------------------------------------------------------------------
def stats_from_v2(st: SlotTensors, fb2: FBv2, total: jnp.ndarray,
                  M: int, B: int, cfg: ModelConfig, dtype,
                  interpret: bool = False, probe_rules: bool = False,
                  n_variants: int = 1):
    """(b12 [B,M,7,2], accum [B,M,7,2,2], pair [B,M,2,2]): the fused
    stats kernel (ops/stats_pallas._kernel) reading every operand
    directly from the v2 tensors — tile (i) = (marker i // nb,
    batch-tile i % nb).  probe_rules/n_variants as in
    ops.stats_pallas.stats_pallas."""
    nb = st.nb
    nt = M * nb
    R = nb * _TN

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def mb(i):
        return i // nb, i % nb

    def slot_spec():        # md/ms [7, 2, M, nb, TS, TL]
        return bspec((7, 2, 1, 1, _TS, _TL),
                     lambda i: (0, 0) + mb(i) + (0, 0))

    def b7_spec():          # ex/at/em/df-variant [7, nb, TS, TL]
        return bspec((7, 1, _TS, _TL), lambda i: (0, i % nb, 0, 0))

    specs = [
        slot_spec(), slot_spec(),
        bspec((7, 1, 1, _TS, _TL), lambda i: (0,) + mb(i) + (0, 0)),
        b7_spec(), b7_spec(), b7_spec(), b7_spec(),
        bspec((1, _TS, _TL), lambda i: (i % nb, 0, 0)),
        bspec((1, _TS, _TL), lambda i: (i % nb, 0, 0)),
        # fw_pre/bw [M, X, R] viewed as [M, X, nb, TS, TL]
        bspec((1, 512, 1, _TS, _TL), lambda i: mb(i)[:1] + (0, mb(i)[1],
                                                            0, 0)),
        bspec((1, 512, 1, _TS, _TL), lambda i: mb(i)[:1] + (0, mb(i)[1],
                                                            0, 0)),
        bspec((1, 8, 1, _TS, _TL), lambda i: mb(i)[:1] + (0, mb(i)[1],
                                                          0, 0)),
        bspec((1, 8, 1, _TS, _TL), lambda i: mb(i)[:1] + (0, mb(i)[1],
                                                          0, 0)),
        bspec((1, _TS, _TL), lambda i: (i % nb, 0, 0)),
    ]

    def out_spec(lead):
        return bspec((lead, 1, _TS, _TL), lambda i: (0, i, 0, 0))

    t5 = (nb, _TS, _TL)
    call = pl.pallas_call(
        functools.partial(sp._kernel, cfg=cfg, rules=probe_rules),
        grid=(nt,),
        in_specs=specs,
        out_specs=(out_spec(14), out_spec(28), out_spec(4)),
        out_shape=(
            jax.ShapeDtypeStruct((14, nt, _TS, _TL), dtype),
            jax.ShapeDtypeStruct((28, nt, _TS, _TL), dtype),
            jax.ShapeDtypeStruct((4, nt, _TS, _TL), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),   # tiles are independent
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    outs = []
    for v in range(n_variants if probe_rules else 1):
        df = st.df[v] if probe_rules else st.em
        outs.append(call(
            st.md, st.ms, st.hw, st.ex, st.at, st.em, df, st.f2, st.sh,
            fb2.fw_pre.reshape((M, 512) + t5), fb2.bw.reshape((M, 512) + t5),
            fb2.fw_pre_f.reshape((M, 8) + t5), fb2.bw_f.reshape((M, 8) + t5),
            jnp.broadcast_to(total.reshape(t5), t5)))
    nv = len(outs)
    b12t, acct, pairt = (sum(parts) / nv for parts in zip(*outs))

    def back(x, shape):
        lead = x.shape[0]
        x = x.reshape((lead, M, R))[:, :, :B]     # n = m*R + b (m-major)
        nl = len(shape)
        x = x.reshape(shape + (M, B))
        return jnp.transpose(x, (nl + 1, nl) + tuple(range(nl)))

    return back(b12t, (7, 2)), back(acct, (7, 2, 2)), back(pairt, (2, 2))


# ---------------------------------------------------------------------------
# Full per-iteration scan in v2 layout
# ---------------------------------------------------------------------------
def chromosome_scan_v2(fb: FamilyBatch, dists: jnp.ndarray,
                       cfg: ModelConfig, params: RuntimeParams,
                       interpret: bool = False, ratemat=None,
                       probe_rules: bool = False, n_variants: int = 1):
    """engine.chromosome_scan on the feature-leading pipeline.

    Returns an engine.ScanResult; the fw/bw sweep tensors are converted
    back to the standard [B, M, NS, S] layout for the follow-up passes
    (coherence, map re-estimation) — when a caller's jit doesn't use
    them, XLA dead-code-eliminates the transposes."""
    from ..engine import ScanResult
    from ..hmm.probes import haplo_update_mask

    dtype = fb.ms.dtype
    B, _, M, _ = fb.md.shape
    S, NS = cfg.numtypes, cfg.numshifts
    st = prep_slots(fb, dtype)
    R = st.nb * _TN
    e = emission_tiles(st, M, cfg, dtype=dtype, interpret=interpret)
    import os
    env = os.environ.get("CNF2FREQ_FBV2_PALLAS")
    use_fb_kernel = (env not in ("0", "false", "") if env is not None
                     else not interpret)
    if use_fb_kernel:
        # fused sweeps: carry in VMEM, butterfly-FWHT transitions in
        # full f32 (the XLA einsum transition rounds through bf16 on
        # the MXU); ~2x on v5e
        fb2 = fb_sweeps_v2_pallas(e.reshape(M, NS * S, R), dists, cfg,
                                  params, ratemat=ratemat,
                                  interpret=interpret)
    else:
        fb2 = fb_scan_v2(e.reshape(M, NS * S, R), dists, cfg, params,
                         ratemat=ratemat)
    total_r = combined_loglik_v2(fb2, st.sh)
    b12, accum, pair = stats_from_v2(st, fb2, total_r, M, B, cfg, dtype,
                                     interpret=interpret,
                                     probe_rules=probe_rules,
                                     n_variants=n_variants)
    if interpret:
        turn_w = turn_weights_v2(fb2, st.sh, fb.descendants.astype(dtype),
                                 cfg, B)
    else:
        # fused kernel: ~2x over the XLA chain on v5e (kernel-vs-XLA
        # parity pinned by test_turn_weights_pallas_matches)
        turn_w = turn_weights_v2_pallas(fb2, st.sh,
                                        fb.descendants.astype(dtype),
                                        cfg, B)
    hmask = haplo_update_mask(fb, cfg)

    def to_std(x):      # [M, X, R] -> [B, M, NS, S]
        return jnp.transpose(x[:, :, :B], (2, 0, 1)).reshape(B, M, NS, S)

    def to_std_f(x):    # [M, NS, R] -> [B, M, NS]
        return jnp.transpose(x[:, :, :B], (2, 0, 1))

    coh = jnp.full((B, M, cfg.numslots), 0.5, dtype=dtype)
    return ScanResult(total=total_r[:B], haplo_b12=b12, haplo_mask=hmask,
                      inf_accum=accum, pair=pair, turn_weight=turn_w,
                      coherence=coh, fw_pre=to_std(fb2.fw_pre),
                      bw=to_std(fb2.bw), fw_pre_f=to_std_f(fb2.fw_pre_f),
                      bw_f=to_std_f(fb2.bw_f))
