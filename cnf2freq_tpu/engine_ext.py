"""Extended-state engine: full-iteration chromosome scans for the SELFING
and RELSKEWSTATES model families.

The reference runs its complete ``doit`` loop under any ``settings.h``
configuration — the extended builds just enlarge the hidden state with
selfing HBD bits (settings.h:25-46) or a phase-coherence bit
(settings.h:16,26).  Here the extension is a *separate tensor axis* of
size V (3 valid HBD statuses, or 2 coherence values) rather than a padded
flat space:

* the base-state transition stays the shared Walsh-Hadamard xor
  convolution on the state axis (hmm/transition.py), and the extension
  transition is one tiny [V, V] matmul per step — the Kronecker
  factorisation of the reference's dense VALIDSELFNUMTYPES**2 loop
  (cnF2freq.cpp:2352-2364);
* emissions per extension value reuse the factored block machinery
  (hmm/emission.py) with the focal root replaced per value: the selfing
  HBD-collapsed pair via ``root_override`` (selfmarker/selfsure,
  cnF2freq.cpp:1131-1189), or the RELSKEWSTATES root-interpretation pin
  (``f2s``/``f2end`` clamp, cnF2freq.cpp:1148-1154) as a one-hot factor
  on the root block's interpretation axis;
* every update statistic (HAPLOS / GENOSPROBE / GENOS contractions,
  turn scores) is the per-value standard contraction summed over the
  extension axis — turn masks never touch the extension bits
  (aroundturner XORs ``turn & 54`` only, cnF2freq.cpp:504-515).

Validated against the golden full-iteration spec (golden/doit.py) run on
the extended state spaces (tests/test_engine_ext.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import MINFACTOR, ModelConfig, RuntimeParams, UNKNOWN
from .hmm.emission import assemble_e_all, build_blocks
from .hmm.family import FamilyBatch
from .hmm.transition import (apply_transition, hadamard, interval_recomb,
                             transition_eigenvalues)


class ExtFBResult(NamedTuple):
    """Forward-backward stores over the extended (V, state) space;
    normalisation factors are per shift mode (adjustprobs normalises over
    the full extended state vector jointly, cnF2freq.cpp:1579-1670)."""

    fw_pre: jnp.ndarray    # [B, M, V, NS, S]
    fw_post: jnp.ndarray
    bw: jnp.ndarray
    fw_pre_f: jnp.ndarray  # [B, M, NS]
    fw_post_f: jnp.ndarray
    bw_f: jnp.ndarray

    @property
    def total_loglik(self) -> jnp.ndarray:
        return self.fw_post_f[:, -1, :]


def _vcoupling(fb: FamilyBatch, cfg: ModelConfig, params: RuntimeParams,
               dists: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B, I, V, V] extension-axis transition factors per marker interval
    (row = from, column = to)."""
    if cfg.selfing:
        from .models.selfing import selfprec_tensor
        return selfprec_tensor(fb.selfgen, dists, params.genrec[2], dtype)
    # RELSKEWSTATES: coherence-bit factor relscore[vf ^ vt] with
    # relscore = (relh, 1 - relh) read at the interval's left marker
    # (cnF2freq.cpp:2343-2362)
    rel = fb.relh[:, :-1].astype(dtype)                  # [B, I]
    same, diff = rel, 1.0 - rel
    row0 = jnp.stack([same, diff], axis=-1)
    row1 = jnp.stack([diff, same], axis=-1)
    return jnp.stack([row0, row1], axis=-2)              # [B, I, 2, 2]


def _prior(fb: FamilyBatch, cfg: ModelConfig, dtype, NS: int) -> jnp.ndarray:
    """[B, V, NS, S] initial extended-state distribution (doanalyze
    seeding, cnF2freq.cpp:2037-2072): EVENGEN everywhere, with the
    selfing HBD split from selfingfactors."""
    B = fb.md.shape[0]
    S = cfg.numtypes
    V = cfg.numselfstates * cfg.numrelstates
    base = jnp.full((B, V, NS, S), cfg.evengen, dtype=dtype)
    if cfg.selfing:
        # selfingfactors[v] * EVENGEN per state — the reference's padded
        # EVENGEN = 1/(NUMTYPES << SELFBITS) (cnF2freq.cpp:2050-2063)
        from .models.selfing import selfing_factors
        f = selfing_factors(fb.selfgen, dtype)           # [B, 3]
        base = base * f[:, :, None, None]
    return base


def ext_blocks(fb: FamilyBatch, cfg: ModelConfig, ci: bool = False,
               dtype=jnp.float64):
    """Per-extension-value emission blocks.

    Returns (blocks[v], e_ext [B, M, V, NS, S], collapses[v] [B, M] focal
    duplicate-allele collapse flags, root_overrides[v])."""
    md, ms = fb.md[:, 0], fb.ms[:, 0]
    collapse_std = (md[..., 0] == md[..., 1]) & \
        (ci | (ms[..., 0] == ms[..., 1]))
    if cfg.selfing:
        from .models.selfing import collapse_focal
        b0 = build_blocks(fb, cfg, ci=ci, dtype=dtype)
        collapsed, csure, dead = collapse_focal(md, ms)
        unk = jnp.zeros_like(collapsed)
        zero = jnp.zeros_like(csure)
        # selfing roots always canonicalise (``|| selfingNOW``,
        # cnF2freq.cpp:1235; pinned by tests/test_refparity_ext.py)
        coll_cond = jnp.ones_like(collapsed, dtype=bool)
        alive = (~dead).astype(dtype)[:, :, None, None]  # [B, M, 1, 1]
        blocks, ovs = [b0], [None]
        for v in (1, 2):
            ov = (collapsed, csure, unk, zero, coll_cond) if v == 1 \
                else (unk, zero, collapsed, csure, coll_cond)
            bv = build_blocks(fb, cfg, ci=ci, dtype=dtype, root_override=ov)
            # a heterozygous focal with a certain first allele kills the
            # HBD hypothesis outright (trackpossible returns 0,
            # cnF2freq.cpp:1177-1183)
            bv = bv._replace(froot=bv.froot * alive, top=bv.top * alive)
            blocks.append(bv)
            ovs.append(ov)
        collapses = [collapse_std, coll_cond, coll_cond]
    else:
        assert cfg.relskewstates
        b0 = build_blocks(fb, cfg, ci=ci, dtype=dtype)
        blocks, ovs = [], []
        for v in range(2):
            sel = np.zeros((2, 1))
            sel[v, 0] = 1.0
            selj = jnp.asarray(sel, dtype=dtype)
            blocks.append(b0._replace(froot=b0.froot * selj,
                                      top=b0.top * selj))
            ovs.append(None)
        # no root collapse under RELSKEWSTATES (``!relskewingNOW``,
        # cnF2freq.cpp:1235; build_blocks disables it for this config)
        nc = jnp.zeros_like(collapse_std, dtype=bool)
        collapses = [nc, nc]
    e_ext = jnp.stack([assemble_e_all(b, cfg) for b in blocks], axis=2)
    return blocks, e_ext, collapses, ovs


def _emit_normalise_ext(p, e, logf):
    """adjustprobs over the joint (V, state) axes per shift mode."""
    p = jnp.where(p < 1e-300, 0.0, p)
    pe = p * e
    s = pe.sum(axis=(-3, -1), keepdims=True)           # [..., 1, NS, 1]
    ok = s > 0
    pn = jnp.where(ok, pe / jnp.where(ok, s, 1.0), 0.0)
    s0 = s[..., 0, :, 0]
    ok0 = ok[..., 0, :, 0]
    logf = jnp.where(ok0, logf + jnp.log(jnp.where(ok0, s0, 1.0)),
                     MINFACTOR)
    return pn, logf


def extended_forward_backward(e_ext: jnp.ndarray, dists: jnp.ndarray,
                              fb: FamilyBatch, cfg: ModelConfig,
                              params: RuntimeParams,
                              ratemat=None) -> ExtFBResult:
    """Batched fb sweeps over [B, M, V, NS, S]: Walsh-Hadamard base-state
    transition x one [V, V] coupling matmul per interval."""
    B, M, V, NS, S = e_ext.shape
    dtype = e_ext.dtype
    r = interval_recomb(cfg, params, dists, ratemat=ratemat)
    lam = transition_eigenvalues(cfg, r).astype(dtype)    # [M-1, S]
    lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dtype)], axis=0)
    C = _vcoupling(fb, cfg, params, dists, dtype)         # [B, M-1, V, V]
    eye = jnp.broadcast_to(jnp.eye(V, dtype=dtype), (B, 1, V, V))
    C_pad = jnp.concatenate([C, eye], axis=1)             # [B, M, V, V]

    e_scan = jnp.moveaxis(e_ext, 1, 0)                    # [M, B, V, NS, S]
    C_scan = jnp.moveaxis(C_pad, 1, 0)                    # [M, B, V, V]

    p0 = _prior(fb, cfg, dtype, NS)
    f0 = jnp.zeros((B, NS), dtype=dtype)

    def fwd(carry, xs):
        p, logf = carry
        e, w, cm = xs
        pre, pre_f = p, logf
        pn, logf = _emit_normalise_ext(p, e, logf)
        pc = apply_transition(pn, w[None, None, None, :])
        pnext = jnp.einsum("bfg,bfns->bgns", cm, pc)
        return (pnext, logf), (pre, pre_f, pn, logf)

    _, (fw_pre, fw_pre_f, fw_post, fw_post_f) = jax.lax.scan(
        fwd, (p0, f0), (e_scan, lam_pad, C_scan), unroll=4)

    ones = jnp.ones((B, V, NS, S), dtype=dtype)

    def bwd(carry, xs):
        p, logf = carry
        e, w, cm = xs
        pn, logf = _emit_normalise_ext(p, e, logf)
        pc = apply_transition(pn, w[None, None, None, :])
        # the reference's backward sweep applies the SAME from->to kernel
        # as the forward one — probs2[to] += probs[from] * selfprec[from][to]
        # with the suffix carry in the "from" role (realanalyze,
        # cnF2freq.cpp:2352-2364) — i.e. the transpose of the adjoint;
        # the distinction only matters for the non-symmetric selfing
        # coupling
        pprev = jnp.einsum("bfg,bfns->bgns", cm, pc)
        return (pprev, logf), (pprev, logf)

    _, (bw_rest, bw_rest_f) = jax.lax.scan(
        bwd, (ones, f0), (e_scan[1:], lam, C_scan[:-1]), unroll=4,
        reverse=True)
    bw = jnp.concatenate([bw_rest, ones[None]], axis=0)
    bw_f = jnp.concatenate([bw_rest_f, f0[None]], axis=0)

    def arrange(x):
        return jnp.moveaxis(x, 0, 1)

    return ExtFBResult(fw_pre=arrange(fw_pre), fw_post=arrange(fw_post),
                       bw=arrange(bw), fw_pre_f=arrange(fw_pre_f),
                       fw_post_f=arrange(fw_post_f), bw_f=arrange(bw_f))


def combined_loglik_ext(fbres: ExtFBResult,
                        shiftignore: jnp.ndarray) -> jnp.ndarray:
    """Log-sum-exp of per-shift totals over allowed shift modes."""
    NS = fbres.fw_post_f.shape[-1]
    allowed = (jnp.arange(NS)[None, :] & shiftignore[:, None]) == 0
    f = jnp.where(allowed, fbres.total_loglik, MINFACTOR)
    fmax = f.max(axis=-1, keepdims=True)
    return (fmax[..., 0] +
            jnp.log(jnp.sum(jnp.where(allowed, jnp.exp(f - fmax), 0.0),
                            axis=-1)))


def posterior_weight_ext(fbres: ExtFBResult, total: jnp.ndarray,
                         shiftignore: jnp.ndarray) -> jnp.ndarray:
    """W[b, m, v, s, g]: per-(extension value, shift, state) probe weight
    (posterior_weight lifted over the extension axis)."""
    NS = fbres.fw_pre_f.shape[-1]
    allowed = (jnp.arange(NS)[None, :] & shiftignore[:, None]) == 0
    logw = fbres.fw_pre_f + fbres.bw_f - total[:, None, None]
    logw = jnp.where(allowed[:, None, :], logw, MINFACTOR)
    return fbres.fw_pre * fbres.bw * jnp.exp(logw)[:, :, None, :, None]


def turn_weights_ext(fbres: ExtFBResult, fb: FamilyBatch, cfg: ModelConfig,
                     total_desc_scale: bool = True) -> jnp.ndarray:
    """Turn clause weights over the extended space: the joint (state,
    shift) Walsh-Hadamard correlation of probes.turn_weights_fast, summed
    over the extension axis (turn masks act as identity there)."""
    B, M, V, NS, S = fbres.fw_post.shape
    dtype = fbres.fw_post.dtype
    X = S * NS
    allowed = ((jnp.arange(NS)[None, :] & fb.shiftignore[:, None]) == 0)

    ff = jnp.where(allowed[:, None, :], fbres.fw_post_f, -jnp.inf)
    ffm = ff.max(axis=-1)
    fexp = jnp.where(allowed[:, None, :],
                     jnp.exp(ff - ffm[..., None]), 0.0)
    bf = fbres.bw_f
    bfm = bf.max(axis=-1)
    bexp = jnp.exp(bf - bfm[..., None])

    fwp = (fbres.fw_post * fexp[:, :, None, :, None]).reshape(B, M, V, X)
    bwp = (fbres.bw * bexp[:, :, None, :, None]).reshape(B, M, V, X)

    H = jnp.asarray(hadamard(int(X).bit_length() - 1, str(dtype)))
    fh = jnp.einsum("jk,bmvk->bmvj", H, fwp)
    bh = jnp.einsum("jk,bmvk->bmvj", H, bwp)
    D = jnp.einsum("jk,bmvk->bmj", H, (fh * bh)) / X     # [B, M, X]

    idx = np.array([cfg.turn_shift_flip(t) * S + (t & cfg.turn_state_mask)
                    for t in range(cfg.numturns)])
    vals = D[..., idx]
    tiny = jnp.asarray(np.finfo(str(dtype)).tiny, dtype=dtype)
    logv = jnp.log(jnp.maximum(vals, tiny))
    ok = vals > 0
    w = jnp.where(ok & ok[..., 0:1], logv - logv[..., 0:1], MINFACTOR)
    if total_desc_scale:
        w = w * fb.descendants[:, None, None]
    return w


def relskew_coherence_ext(fbres: ExtFBResult, e_ext: jnp.ndarray,
                          fb: FamilyBatch, cfg: ModelConfig,
                          params: RuntimeParams, dists: jnp.ndarray,
                          ratemat=None) -> jnp.ndarray:
    """C[b, m]: posterior P(coherence bit equal at markers m, m+1) under
    RELSKEWSTATES — the EM statistic for the relhaplo transition weight
    (the bit the state space carries explicitly; last column 0.5 pad).

    Pairwise joint over the V axis: J[vf, vt] = sum_g fw_post[m, vf] .
    R_base . relscore[vf^vt] . (E[m+1, vt] * bw[m+1, vt]), weighted per
    shift mode."""
    assert cfg.relskewstates
    B, M, V, NS, S = fbres.fw_post.shape
    dtype = fbres.fw_post.dtype
    r = interval_recomb(cfg, params, dists, ratemat=ratemat)
    lam = transition_eigenvalues(cfg, r).astype(dtype)      # [M-1, S]
    C = _vcoupling(fb, cfg, params, dists, dtype)           # [B,M-1,V,V]

    logw = fbres.fw_post_f[:, :-1, :] + fbres.bw_f[:, 1:, :]
    logw = logw - logw.max(axis=-1, keepdims=True)
    w = jnp.exp(logw)                                       # [B, M-1, NS]

    x = fbres.fw_post[:, :-1]                               # [B,M-1,V,NS,S]
    xt = apply_transition(x, lam[:, None, None, :])
    y = e_ext[:, 1:] * fbres.bw[:, 1:]
    J = jnp.einsum("bmvns,bmwns,bmn,bmvw->bmvw", xt, y, w, C)
    tot = J.sum(axis=(-1, -2))
    same = J[..., 0, 0] + J[..., 1, 1]
    c = jnp.where(tot > 0, same / jnp.where(tot > 0, tot, 1.0), 0.5)
    pad = jnp.full((B, 1), 0.5, dtype=dtype)
    return jnp.concatenate([c, pad], axis=1)


def coherence_slot_ext(fbres: ExtFBResult, blocks_v, fb: FamilyBatch,
                       cfg: ModelConfig, params: RuntimeParams,
                       dists: jnp.ndarray, slot: int,
                       ratemat=None) -> jnp.ndarray:
    """C[b, m]: posterior P(phase bit of `slot` equal at markers m, m+1)
    over an extended state space — the per-value phase-resolved
    emissions ride the V axis and the interval transition composes the
    base-state Walsh-Hadamard kernel with the V coupling."""
    from .hmm.probes import _phase_resolved_emission
    B, M, V, NS, S = fbres.fw_pre.shape
    dtype = fbres.fw_pre.dtype
    r = interval_recomb(cfg, params, dists, ratemat=ratemat)
    lam = transition_eigenvalues(cfg, r).astype(dtype)      # [M-1, S]
    C = _vcoupling(fb, cfg, params, dists, dtype)           # [B,M-1,V,V]

    e_j = jnp.stack([_phase_resolved_emission(blocks_v[v], fb, cfg, slot)
                     for v in range(V)], axis=2)    # [B, M, V, j, NS, S]
    logw = fbres.fw_pre_f[:, :-1, :] + fbres.bw_f[:, 1:, :]
    logw = logw - logw.max(axis=-1, keepdims=True)
    w = jnp.exp(logw)                                       # [B, M-1, NS]

    x = fbres.fw_pre[:, :-1, :, None] * e_j[:, :-1]
    xt = apply_transition(x, lam[:, None, None, None, :])
    xt = jnp.einsum("bmfg,bmfjns->bmgjns", C, xt)
    y = e_j[:, 1:] * fbres.bw[:, 1:, :, None]
    J = jnp.einsum("bmvins,bmvjns,bmn->bmij", xt, y, w)
    tot = J.sum(axis=(-1, -2))
    same = J[..., 0, 0] + J[..., 1, 1]
    c = jnp.where(tot > 0, same / jnp.where(tot > 0, tot, 1.0), 0.5)
    pad = jnp.full((B, 1), 0.5, dtype=dtype)
    return jnp.concatenate([c, pad], axis=1)


def ext_statistics(W, blocks_v, collapses, ovs, fb: FamilyBatch,
                   cfg: ModelConfig, n_variants: int,
                   with_infprobs: bool = True):
    """The extended-space statistics stage (shared by the whole-
    chromosome scan and the marker-blocked block pass): per extension
    value v, probe-dedup-variant-averaged haplo/infprob statistics and
    the selfing focal-collapse masking.  W: [B, M, V, NS, S] posterior
    weights; returns (b12, mask, inf, pair)."""
    from .hmm.probes import (_valid_paths, haplo_stats,
                             haplo_update_mask, infprob_stats,
                             probe_rule_factors)

    dtype = fb.ms.dtype
    B, M = fb.md.shape[0], fb.md.shape[2]
    V = len(blocks_v)
    VP = [_valid_paths(fb.flag2ignore, k).astype(dtype) for k in range(2)]
    rule_factors = []
    # rule 3 scope per build: SELFING disables it outright, RELSKEWSTATES
    # only exempts the focal ((!RELSKEWSTATES || currfilter != 1) &&
    # !SELFING, cnF2freq.cpp:3488-3489)
    tied = "nonfocal" if cfg.relskewstates else False
    for w in range(n_variants):
        rule_factors.append(probe_rule_factors(fb, cfg, dtype, w,
                                               tied_rule=tied))

    mask_std = haplo_update_mask(fb, cfg)                # [B, M, slots]
    b12 = jnp.zeros((B, M, cfg.numslots, 2), dtype=dtype)
    inf = jnp.zeros((B, M, cfg.numslots, 2, 2), dtype=dtype)
    pair = jnp.zeros((B, M, 2, 2), dtype=dtype)
    mask = jnp.zeros((B, M, cfg.numslots), dtype=bool)
    for v in range(V):
        PBm = [blocks_v[v].pb[k] * VP[k][:, None, None, None, :, None]
               for k in range(2)]
        b12_v = jnp.zeros((B, M, cfg.numslots, 2), dtype=dtype)
        inf_v = jnp.zeros((B, M, cfg.numslots, 2, 2), dtype=dtype)
        pair_v = jnp.zeros((B, M, 2, 2), dtype=dtype)
        for w in range(n_variants):
            F0, FPs = rule_factors[w]
            frootw = blocks_v[v].froot * F0
            PBw = [PBm[k] * FPs[k] for k in range(2)]
            hs = haplo_stats(W[:, :, v], blocks_v[v], fb, cfg,
                             froot=frootw, PB=PBw)
            b12_v = b12_v + hs.b12
            if with_infprobs:
                ist = infprob_stats(W[:, :, v], blocks_v[v], fb, cfg,
                                    froot=frootw, PB=PBw,
                                    root_override=ovs[v],
                                    drop_side1=cfg.relskewstates)
                inf_v = inf_v + ist.accum
                pair_v = pair_v + ist.pair
        b12_v, inf_v, pair_v = (x / n_variants
                                for x in (b12_v, inf_v, pair_v))
        mask_v = mask_std
        if cfg.selfing:
            # the focal's duplicate-allele collapse (no haplo update,
            # cnF2freq.cpp:1235-1239) tests the HBD-collapsed pair for
            # selfval > 0
            mv0 = fb.exists[:, None, 0:1] & ~collapses[v][:, :, None]
            mask_v = jnp.concatenate([mask_std[..., 0:1] & mv0,
                                      mask_std[..., 1:]], axis=-1) \
                if v == 0 else \
                jnp.concatenate([mv0, mask_std[..., 1:]], axis=-1)
        mask = mask | mask_v
        b12 = b12 + jnp.where(mask_v[..., None], b12_v, 0.0)
        if with_infprobs:
            inf = inf + inf_v
            pair = pair + pair_v
    return b12, mask, inf, pair


def chromosome_scan_ext(fb: FamilyBatch, dists: jnp.ndarray,
                        cfg: ModelConfig, params: RuntimeParams,
                        with_infprobs: bool = True, ratemat=None,
                        n_variants: int = 1,
                        with_coherence: bool = False):
    """One extended-state chromosome scan with the full ScanResult
    contract of engine.chromosome_scan (total likelihoods, haplo/infprob
    update statistics, genotype-pair posteriors, turn scores).

    n_variants: probe-dedup sign variants.  ignoreflag2's duplicate-
    member rule 2 stays ACTIVE on the extended builds (only rule 3 is
    gated out, cnF2freq.cpp:3478-3487) — and duplicates are structural
    here: every selfed analysis unit holds its parent in both parent
    slots.  Pass Driver._n_variants (2**constraints of the deepest
    duplicate group)."""
    from .engine import ScanResult

    dtype = fb.ms.dtype
    B, M = fb.md.shape[0], fb.md.shape[2]
    blocks_v, e_ext, collapses, ovs = ext_blocks(fb, cfg, dtype=dtype)
    fbres = extended_forward_backward(e_ext, dists, fb, cfg, params,
                                      ratemat=ratemat)
    total = combined_loglik_ext(fbres, fb.shiftignore)
    W = posterior_weight_ext(fbres, total, fb.shiftignore)
    b12, mask, inf, pair = ext_statistics(
        W, blocks_v, collapses, ovs, fb, cfg, n_variants,
        with_infprobs=with_infprobs)
    turn_w = turn_weights_ext(fbres, fb, cfg)
    coh = jnp.full((B, M, cfg.numslots), 0.5, dtype=dtype)
    if with_coherence and cfg.relskewstates:
        # the coherence bit is part of the hidden state: its posterior
        # xor-marginal per interval is the EM statistic for the focal's
        # relhaplo (slot 0; other slots stay neutral)
        c0 = relskew_coherence_ext(fbres, e_ext, fb, cfg, params, dists,
                                   ratemat=ratemat)
        coh = jnp.concatenate([c0[..., None], coh[..., 1:]], axis=-1)
    elif with_coherence and cfg.selfing:
        # per-slot adjacent-phase coherence over the extended space
        coh = jnp.stack([coherence_slot_ext(fbres, blocks_v, fb, cfg,
                                            params, dists, slot,
                                            ratemat=ratemat)
                         for slot in range(cfg.numslots)], axis=-1)
    return ScanResult(total=total, haplo_b12=b12, haplo_mask=mask,
                      inf_accum=inf, pair=pair, turn_weight=turn_w,
                      coherence=coh, fw_pre=fbres.fw_pre, bw=fbres.bw,
                      fw_pre_f=fbres.fw_pre_f, bw_f=fbres.bw_f)


def recombination_expectations_ext(fbres: ExtFBResult, e_ext: jnp.ndarray,
                                   fb: FamilyBatch, cfg: ModelConfig,
                                   params: RuntimeParams, dists,
                                   ratemat=None) -> jnp.ndarray:
    """P[b, m, t]: posterior probability that base meiosis bit t
    recombined in interval (m, m+1), over the extended (V, state) space.

    The extended transition factors as R_base(g ^ g') x C(V, V')
    (selfprec / relscore coupling, cnF2freq.cpp:2316-2362), so the
    pairwise joint's base-xor marginal is one coupling-weighted
    Walsh-Hadamard correlation per interval — the extended form of
    hmm.probes.recombination_expectations."""
    from .hmm.probes import lam_to_kernel
    B, M, V, NS, S = fbres.fw_post.shape
    dtype = fbres.fw_post.dtype
    H = jnp.asarray(hadamard(int(S).bit_length() - 1, str(dtype)))
    lam = transition_eigenvalues(
        cfg, interval_recomb(cfg, params, dists,
                             ratemat=ratemat)).astype(dtype)
    C = _vcoupling(fb, cfg, params, dists, dtype)      # [B, M-1, V, V]

    x_ = fbres.fw_post[:, :-1]                         # [B,M-1,V,NS,S]
    y_ = e_ext[:, 1:] * fbres.bw[:, 1:]
    xh = x_ @ H
    yh = y_ @ H
    z = jnp.einsum("bmvns,bmvw,bmwns->bmns", xh, C, yh)
    z = (z @ H) / S                                    # [B,M-1,NS,S]
    logw = fbres.fw_post_f[:, :-1] + fbres.bw_f[:, 1:]
    logw = logw - logw.max(axis=-1, keepdims=True)
    z = (z * jnp.exp(logw)[:, :, :, None]).sum(axis=2)     # [B,M-1,S]
    p = jnp.maximum(z, 0.0) * lam_to_kernel(lam, cfg)
    tot = p.sum(axis=-1, keepdims=True)
    p = jnp.where(tot > 0, p / jnp.where(tot > 0, tot, 1.0), 0.0)
    bits = ((np.arange(S)[:, None] >> np.arange(cfg.typebits)[None, :])
            & 1).astype(np.float64)
    return jnp.einsum("bmx,xt->bmt", p, jnp.asarray(bits, dtype=dtype))


def make_jitted_recomb_ext(cfg: ModelConfig, params: RuntimeParams):
    """Posterior per-interval recombination expectations over the
    extended space as their own pass (map re-estimation; the extended
    form of engine.make_jitted_recomb)."""
    @jax.jit
    def run(fb, dists, fw_pre, bw, fw_pre_f, bw_f, ratemat=None):
        dtype = fw_pre.dtype
        _, e_ext, _, _ = ext_blocks(fb, cfg, dtype=dtype)
        fw_post, fw_post_f = _emit_normalise_ext(
            jnp.moveaxis(fw_pre, 1, 0), jnp.moveaxis(e_ext, 1, 0),
            jnp.moveaxis(fw_pre_f, 1, 0))
        fbres = ExtFBResult(
            fw_pre=fw_pre, fw_post=jnp.moveaxis(fw_post, 0, 1),
            bw=bw, fw_pre_f=fw_pre_f,
            fw_post_f=jnp.moveaxis(fw_post_f, 0, 1), bw_f=bw_f)
        return recombination_expectations_ext(fbres, e_ext, fb, cfg,
                                              params, dists,
                                              ratemat=ratemat)

    return run
