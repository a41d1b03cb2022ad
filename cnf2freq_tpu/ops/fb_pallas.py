"""Pallas TPU kernel: fused forward-backward sweeps.

One grid walks (batch-tile, marker) sequentially; the probability carry
lives in VMEM scratch across grid steps, each step fusing

    emission multiply -> renormalise -> log-accumulate ->
    Hadamard transition (two 64x64 MXU matmuls + eigenvalue scale)

so the whole chromosome sweep runs without bouncing the carry through HBM
(the XLA scan materialises it every step).  Emissions stream in through
the automatic grid pipeline (double-buffered HBM->VMEM); the backward
sweep walks the same arrays through a reversed index map — no transposed
or reversed copies are materialised in HBM.

Layout: probabilities as [TB * NS, S] rows (batch x shift-mode rows, state
columns) so the transition is a [rows, 64] @ [64, 64] MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MINFACTOR
from ..hmm.transition import hadamard

import os
_TB = int(os.environ.get("CNF2FREQ_FB_TB", 128))  # rows = TB * NS


def _step(p, f, e, h, lam, S):
    """Shared fused step: emission-normalise + Hadamard transition."""
    p = jnp.where(p < 1e-30, 0.0, p)
    pe = p * e
    s = pe.sum(axis=1, keepdims=True)
    ok = s > 0
    pn = jnp.where(ok, pe / jnp.where(ok, s, 1.0), 0.0)
    f = jnp.where(ok, f + jnp.log(jnp.where(ok, s, 1.0)), MINFACTOR)
    q = jnp.dot(pn, h, preferred_element_type=pn.dtype) * lam
    pnext = jnp.dot(q, h, preferred_element_type=pn.dtype) * (1.0 / S)
    return pn, f, pnext


def _load_e(e_ref, TB, NS, S):
    """e block [TB, 1, NS, S] -> [TB*NS, S] row layout (direct reshape:
    state is already minor)."""
    return e_ref[:].reshape(TB * NS, S)


def _fwd_kernel(e_ref, lam_ref, h_ref, pre_ref, pref_ref, post_ref,
                postf_ref, p_scr, f_scr, *, S, NS, TB):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        p_scr[:] = jnp.full_like(p_scr, 1.0 / S)
        f_scr[:] = jnp.zeros_like(f_scr)

    p = p_scr[:]                                   # [TB*NS, S]
    f = f_scr[:]                                   # [TB*NS, 1]
    pre_ref[:] = p.reshape(TB, 1, NS, S)
    pref_ref[:] = f.reshape(TB, 1, NS, 1)

    e = _load_e(e_ref, TB, NS, S)
    pn, f, pnext = _step(p, f, e, h_ref[:], lam_ref[pl.ds(m, 1), :], S)

    post_ref[:] = pn.reshape(TB, 1, NS, S)
    postf_ref[:] = f.reshape(TB, 1, NS, 1)
    f_scr[:] = f
    p_scr[:] = pnext


def _bwd_kernel(e_ref, lam_ref, h_ref, bw_ref, bwf_ref, p_scr, f_scr, *,
                S, NS, TB, nm):
    """Marker order reversed through the index maps; grid step m handles
    original marker nm-1-m.  lam for the step from marker j+1 down to j is
    the original interval j = nm-2-m."""
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        p_scr[:] = jnp.ones_like(p_scr)
        f_scr[:] = jnp.zeros_like(f_scr)

    p = p_scr[:]
    f = f_scr[:]
    bw_ref[:] = p.reshape(TB, 1, NS, S)
    bwf_ref[:] = f.reshape(TB, 1, NS, 1)

    e = _load_e(e_ref, TB, NS, S)
    lam_idx = jnp.maximum(nm - 2 - m, 0)
    pn, f, pnext = _step(p, f, e, h_ref[:], lam_ref[pl.ds(lam_idx, 1), :],
                         S)
    f_scr[:] = f
    p_scr[:] = pnext


def _pad_batch(x, TB):
    B = x.shape[0]
    pad = (-B) % TB
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x, B


@functools.partial(jax.jit, static_argnames=("interpret",))
def fb_sweeps_pallas(e_all: jnp.ndarray, lam: jnp.ndarray,
                     interpret: bool = False):
    """e_all: [B, M, NS, S]; lam: [M-1, S] transition eigenvalues.

    Returns (fw_pre, fw_post, bw, fw_pre_f, fw_post_f, bw_f) shaped like
    the XLA path (forward_backward): [B, M, NS, S]."""
    B0, M, NS, S = e_all.shape
    dtype = e_all.dtype
    TB = _TB
    e_pad, B0 = _pad_batch(e_all, TB)
    B = e_pad.shape[0]
    nb = B // TB

    h = jnp.asarray(hadamard(int(S).bit_length() - 1, str(dtype)))
    lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dtype)], 0)

    grid = (nb, M)
    espec_f = pl.BlockSpec((TB, 1, NS, S), lambda b, m: (b, m, 0, 0))
    espec_b = pl.BlockSpec((TB, 1, NS, S),
                           lambda b, m, nm=M: (b, nm - 1 - m, 0, 0))
    lspec = pl.BlockSpec((M, S), lambda b, m: (0, 0))
    hspec = pl.BlockSpec((S, S), lambda b, m: (0, 0))
    outspec_f = pl.BlockSpec((TB, 1, NS, S), lambda b, m: (b, m, 0, 0))
    outspec_b = pl.BlockSpec((TB, 1, NS, S),
                             lambda b, m, nm=M: (b, nm - 1 - m, 0, 0))
    fspec_f = pl.BlockSpec((TB, 1, NS, 1), lambda b, m: (b, m, 0, 0))
    fspec_b = pl.BlockSpec((TB, 1, NS, 1),
                           lambda b, m, nm=M: (b, nm - 1 - m, 0, 0))
    scratch = [pltpu.VMEM((TB * NS, S), dtype),
               pltpu.VMEM((TB * NS, 1), dtype)]
    shapes = (jax.ShapeDtypeStruct((B, M, NS, S), dtype),
              jax.ShapeDtypeStruct((B, M, NS, 1), dtype),
              jax.ShapeDtypeStruct((B, M, NS, S), dtype),
              jax.ShapeDtypeStruct((B, M, NS, 1), dtype))

    fw_pre, fw_pre_f, fw_post, fw_post_f = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, NS=NS, TB=TB),
        grid=grid,
        in_specs=[espec_f, lspec, hspec],
        out_specs=(outspec_f, fspec_f, outspec_f, fspec_f),
        out_shape=shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(e_pad, lam_pad, h)

    bw, bw_f = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, NS=NS, TB=TB, nm=M),
        grid=grid,
        in_specs=[espec_b, lspec, hspec],
        out_specs=(outspec_b, fspec_b),
        out_shape=(shapes[0], shapes[1]),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(e_pad, lam_pad, h)

    def arrange(x):
        return x[:B0]

    return (arrange(fw_pre), arrange(fw_post), arrange(bw),
            fw_pre_f[:B0, :, :, 0], fw_post_f[:B0, :, :, 0],
            bw_f[:B0, :, :, 0])
