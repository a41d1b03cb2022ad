"""Marker-blocked (checkpointed) scans for the ng2 and extended spaces.

The standard 64-state space has a dedicated fused blocked pipeline
(ops/scan_v2.make_blocked_pieces).  This module gives the OTHER model
families — the 4-state numgen==2 engine and the extended (V x 64)
SELFING / RELSKEWSTATES spaces — the same O(block) device-memory
property, mirroring the reference's fillortake block tree, which works
under every settings.h config (cnF2freq.cpp:1675-1776).

Three phases per (batch chunk, chromosome), exactly like the v2 blocked
path:

  A. forward carry pass: per block, build the block's emissions and run
     the forward recursion carry-only; store the (p, logf) carry at
     each block boundary.  The final carry yields the per-shift totals.
  B. backward carry pass, in the "z-form" rephrasing: the carry is the
     post-emission-normalised state, so each block's sweep consumes ONLY
     its own emission rows (the natural phrasing folds e[m+1] and would
     reach one row into the next block).  The z-form performs the exact
     same float operations in the same order as the whole-chromosome
     scan, so blocked == whole bit-for-bit; the only structural
     difference — the appended all-ones column at the global last
     marker — is special-cased (``islast``) to avoid a Walsh-Hadamard
     round trip the whole scan never performs.
  C. per block: rebuild emissions, rerun both sweeps WITH per-marker
     stores from the boundary carries, and run the family's statistics
     stage (posterior weights, haplo/infprob stats, turn weights) plus
     the on-device per-individual merges for that marker span.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import MINFACTOR, ModelConfig, RuntimeParams
from .hmm.transition import (apply_transition, interval_recomb,
                             transition_eigenvalues)


class _FbProxy(NamedTuple):
    """The two FamilyBatch fields _vcoupling reads."""

    selfgen: jnp.ndarray
    relh: jnp.ndarray


def make_blocked_family_pieces(cfg: ModelConfig, params: RuntimeParams,
                               dtype, num_individuals: int,
                               n_variants: int = 1):
    """Jitted building blocks, cached per (family, block shape)."""
    ext = cfg.selfing or cfg.relskewstates
    ng2 = cfg.numgen == 2 and not ext
    if not (ext or ng2):
        raise ValueError("standard space uses ops/scan_v2 blocked pieces")
    if ng2 and not cfg.haplotyping:
        raise NotImplementedError(
            "blocked mode: the no-haplotyping deep-walk engine is "
            "whole-chromosome only")

    from .hmm.forward_backward import FBResult, _emit_normalise
    from .parallel.collective import merge_haplos, merge_infprobs

    if ext:
        from .engine_ext import (ExtFBResult, _emit_normalise_ext,
                                 _prior, _vcoupling, ext_blocks)
    else:
        from .engine_ng2 import (assemble_e_ng2, haplo_stats_ng2,
                                 haplo_update_mask_ng2, infprob_stats_ng2,
                                 ng2_blocks)

    S = cfg.numtypes

    # ---- whole-chromosome interval tensors (O(M), small) -------------
    @jax.jit
    def prep_intervals(dists, ratemat, selfgen, relh):
        lam = transition_eigenvalues(
            cfg, interval_recomb(cfg, params, dists,
                                 ratemat=ratemat)).astype(dtype)
        lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dtype)],
                                  axis=0)
        if ext:
            C = _vcoupling(_FbProxy(selfgen=selfgen, relh=relh), cfg,
                           params, dists, dtype)       # [B, M-1, V, V]
            V = C.shape[-1]
            B = C.shape[0]
            eye = jnp.broadcast_to(jnp.eye(V, dtype=dtype), (B, 1, V, V))
            C_pad = jnp.concatenate([C, eye], axis=1)
        else:
            C_pad = None
        return lam_pad, C_pad

    # ---- emissions for one block -------------------------------------
    def _emit(fb_blk):
        if ng2:
            froot, P2, top, focal_attop = ng2_blocks(fb_blk, cfg,
                                                     dtype=dtype)
            e = assemble_e_ng2(froot, P2, top, focal_attop, fb_blk, cfg)
            return (froot, P2, top, focal_attop), e   # [B, K, NS, S]
        blocks_v, e_ext, collapses, ovs = ext_blocks(fb_blk, cfg,
                                                     dtype=dtype)
        return (blocks_v, collapses, ovs), e_ext   # [B, K, V, NS, S]

    def _norm(p, e, logf):
        return (_emit_normalise_ext(p, e, logf) if ext
                else _emit_normalise(p, e, logf))

    def _trans(p, w):
        if ext:
            return apply_transition(p, w[None, None, None, :])
        return apply_transition(p, w[None, None, :])

    def _couple(p, cm):
        return jnp.einsum("bfg,bfns->bgns", cm, p) if cm is not None \
            else p

    # ---- initial carries ---------------------------------------------
    @jax.jit
    def init_fwd(fb_blk):
        B = fb_blk.md.shape[0]
        NS = cfg.numshifts
        if ext:
            p0 = _prior(fb_blk, cfg, dtype, NS)
        else:
            p0 = jnp.full((B, NS, S), cfg.evengen, dtype=dtype)
        return p0, jnp.zeros((B, NS), dtype=dtype)

    @jax.jit
    def init_bwd(fb_blk):
        B = fb_blk.md.shape[0]
        NS = cfg.numshifts
        shape = (B, cfg.numselfstates * cfg.numrelstates, NS, S) if ext \
            else (B, NS, S)
        return (jnp.ones(shape, dtype=dtype),
                jnp.zeros((B, NS), dtype=dtype))

    # ---- carry-only passes -------------------------------------------
    @jax.jit
    def carry_f(fb_blk, lam_blk, C_blk, p, f):
        _, e = _emit(fb_blk)
        e_scan = jnp.moveaxis(e, 1, 0)
        xs = (e_scan, lam_blk) if not ext else \
            (e_scan, lam_blk, jnp.moveaxis(C_blk, 1, 0))

        def step(carry, x):
            p, logf = carry
            e_m, w = x[0], x[1]
            pn, logf = _norm(p, e_m, logf)
            pc = _trans(pn, w)
            return (_couple(pc, x[2] if ext else None), logf), None

        (p, f), _ = jax.lax.scan(step, (p, f), xs, unroll=4)
        return p, f

    @jax.jit
    def carry_b(fb_blk, lam_blk, C_blk, islast, z, f):
        """z-form reverse pass: carry = post-fold state of the marker to
        the RIGHT; per marker m emit nothing, just advance."""
        _, e = _emit(fb_blk)
        e_scan = jnp.moveaxis(e, 1, 0)
        xs = (e_scan, lam_blk, islast) if not ext else \
            (e_scan, lam_blk, islast, jnp.moveaxis(C_blk, 1, 0))

        def step(carry, x):
            z, logf = carry
            e_m, w, last = x[0], x[1], x[2]
            bw_m = _couple(_trans(z, w), x[3] if ext else None)
            bw_m = jnp.where(last, z, bw_m)
            z2, logf2 = _norm(bw_m, e_m, logf)
            return (z2, logf2), None

        (z, f), _ = jax.lax.scan(step, (z, f), xs, unroll=4,
                                 reverse=True)
        return z, f

    @jax.jit
    def total_fn(f_final, shiftignore):
        """Per-shift totals + the combined log-sum-exp (doit,
        cnF2freq.cpp:5373-5401): f_final is the forward carry's logf
        after the last marker's emission fold == fw_post_f[:, -1]."""
        NS = f_final.shape[-1]
        allowed = (jnp.arange(NS)[None, :] & shiftignore[:, None]) == 0
        f = jnp.where(allowed, f_final, MINFACTOR)
        fmax = f.max(axis=-1, keepdims=True)
        return fmax[..., 0] + jnp.log(
            jnp.sum(jnp.where(allowed, jnp.exp(f - fmax), 0.0), axis=-1))

    # ---- block pass with stores + statistics -------------------------
    @functools.partial(jax.jit, static_argnames=("with_turn",))
    def block_pass(fb_blk, lam_blk, C_blk, islast, p_in, f_in, z_in,
                   zf_in, total, lut, with_turn=True):
        em, e = _emit(fb_blk)
        e_scan = jnp.moveaxis(e, 1, 0)
        C_scan = jnp.moveaxis(C_blk, 1, 0) if ext else None

        def fwd(carry, x):
            p, logf = carry
            e_m, w = x[0], x[1]
            pre, pre_f = p, logf
            pn, logf = _norm(p, e_m, logf)
            pc = _trans(pn, w)
            return (_couple(pc, x[2] if ext else None), logf), \
                (pre, pre_f, pn, logf)

        xs_f = (e_scan, lam_blk) if not ext else (e_scan, lam_blk, C_scan)
        _, (fw_pre, fw_pre_f, fw_post, fw_post_f) = jax.lax.scan(
            fwd, (p_in, f_in), xs_f, unroll=4)

        def bwd(carry, x):
            z, logf = carry
            e_m, w, last = x[0], x[1], x[2]
            bw_m = _couple(_trans(z, w), x[3] if ext else None)
            bw_m = jnp.where(last, z, bw_m)
            out = (bw_m, logf)
            z2, logf2 = _norm(bw_m, e_m, logf)
            return (z2, logf2), out

        xs_b = (e_scan, lam_blk, islast) if not ext else \
            (e_scan, lam_blk, islast, C_scan)
        _, (bw, bw_f) = jax.lax.scan(bwd, (z_in, zf_in), xs_b,
                                     unroll=4, reverse=True)

        def arr(x):
            return jnp.moveaxis(x, 0, 1)

        if ext:
            fbres = ExtFBResult(fw_pre=arr(fw_pre), fw_post=arr(fw_post),
                                bw=arr(bw), fw_pre_f=arr(fw_pre_f),
                                fw_post_f=arr(fw_post_f), bw_f=arr(bw_f))
            out = _stats_ext(em, fbres, fb_blk, total, with_turn)
        else:
            fbres = FBResult(fw_pre=arr(fw_pre), fw_post=arr(fw_post),
                             bw=arr(bw), fw_pre_f=arr(fw_pre_f),
                             fw_post_f=arr(fw_post_f), bw_f=arr(bw_f))
            out = _stats_ng2(em, fbres, fb_blk, total, with_turn)
        pair, b12, mask, inf, turn_w = out

        hb, hc = merge_haplos(b12, mask, fb_blk.hw, fb_blk.slot_ind,
                              fb_blk.descendants, lut, num_individuals)
        empty = fb_blk.emptyslot if ext else None
        infm = merge_infprobs(inf, fb_blk.slot_ind, fb_blk.descendants,
                              lut, num_individuals, emptyslot=empty)
        return pair, hb, hc, infm, turn_w

    def _stats_ng2(em, fbres, fb_blk, total, with_turn):
        from .hmm.probes import posterior_weight, turn_weights_fast
        froot, P2, top, focal_attop = em
        W = posterior_weight(fbres, total, fb_blk.shiftignore)
        b12 = haplo_stats_ng2(W, froot, P2, fb_blk, cfg)
        mask = haplo_update_mask_ng2(fb_blk, cfg)
        inf, pair = infprob_stats_ng2(W, froot, P2, fb_blk, cfg)
        turn_w = turn_weights_fast(fbres, fb_blk, cfg) if with_turn \
            else jnp.zeros((1,), dtype=dtype)
        return pair, b12, mask, inf, turn_w

    def _stats_ext(em, fbres, fb_blk, total, with_turn):
        # the shared extended-space statistics stage restricted to the
        # block's markers (W is per-marker local given the global total)
        from .engine_ext import (ext_statistics, posterior_weight_ext,
                                 turn_weights_ext)
        blocks_v, collapses, ovs = em
        W = posterior_weight_ext(fbres, total, fb_blk.shiftignore)
        b12, mask, inf, pair = ext_statistics(
            W, blocks_v, collapses, ovs, fb_blk, cfg, n_variants)
        turn_w = turn_weights_ext(fbres, fb_blk, cfg) if with_turn \
            else jnp.zeros((1,), dtype=dtype)
        return pair, b12, mask, inf, turn_w

    return dict(prep=prep_intervals, init_fwd=init_fwd,
                init_bwd=init_bwd, carry_f=carry_f, carry_b=carry_b,
                total=total_fn, block_pass=block_pass, ext=ext)


def blocked_family_chunk(fb_np, dists, rm, cfg, params, block: int,
                         lut, pieces, with_turn: bool = True):
    """Run one batch chunk's chromosome through phases A-C.

    Yields per block ``(i, pair, hb, hc, inf, turn_w)`` as device
    arrays; O(block) device memory plus O(M/block) boundary carries."""
    B, _, Mp, _ = fb_np.md.shape
    assert Mp % block == 0, (Mp, block)
    nblk = Mp // block
    from .ops.scan_v2 import blocked_slice

    dists_j = jnp.asarray(dists)
    rm_j = jnp.asarray(rm) if rm is not None else None
    selfgen = jnp.asarray(fb_np.selfgen) if fb_np.selfgen is not None \
        else jnp.zeros((B,), dtype=jnp.int32)
    relh = jnp.asarray(fb_np.relh) if fb_np.relh is not None \
        else jnp.full((B, Mp), 0.5)
    lam_pad, C_pad = pieces["prep"](dists_j, rm_j, selfgen, relh)

    def blk(i):
        fb_blk = blocked_slice(fb_np, i, block).map(jnp.asarray)
        lam_blk = lam_pad[i * block:(i + 1) * block]
        C_blk = C_pad[:, i * block:(i + 1) * block] if C_pad is not None \
            else None
        islast = np.zeros(block, dtype=bool)
        if i == nblk - 1:
            islast[-1] = True
        return fb_blk, lam_blk, C_blk, jnp.asarray(islast)

    # phase A: forward carries
    fbound = []
    fb0, _, _, _ = blk(0)
    p, f = pieces["init_fwd"](fb0)
    shiftignore = jnp.asarray(fb_np.shiftignore)
    for i in range(nblk):
        fbound.append((p, f))
        fb_blk, lam_blk, C_blk, islast = blk(i)
        p, f = pieces["carry_f"](fb_blk, lam_blk, C_blk, p, f)
    total = pieces["total"](f, shiftignore)

    # phase B: backward carries (z-form, right to left)
    bbound = [None] * nblk
    z, zf = pieces["init_bwd"](fb0)
    for i in reversed(range(nblk)):
        bbound[i] = (z, zf)
        fb_blk, lam_blk, C_blk, islast = blk(i)
        z, zf = pieces["carry_b"](fb_blk, lam_blk, C_blk, islast, z, zf)

    # phase C: stores + statistics per block
    for i in range(nblk):
        fb_blk, lam_blk, C_blk, islast = blk(i)
        pair, hb, hc, inf, turn_w = pieces["block_pass"](
            fb_blk, lam_blk, C_blk, islast, *fbound[i], *bbound[i],
            total, lut, with_turn=with_turn)
        yield i, pair, hb, hc, inf, turn_w
