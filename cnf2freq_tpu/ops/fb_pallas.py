"""Pallas TPU kernel: fused forward-backward sweeps.

One grid walks (batch-tile, marker) sequentially; the probability carry
lives in VMEM scratch across grid steps, each step fusing

    emission multiply -> renormalise -> log-accumulate ->
    Hadamard transition (two 64x64 MXU matmuls + eigenvalue scale)

so the whole chromosome sweep runs without bouncing the carry through HBM
(the XLA scan materialises it every step).  Emissions stream in through
the automatic grid pipeline (double-buffered HBM->VMEM).

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

_TB = 64  # batch tile; rows = TB * NS = 512


def _fwd_kernel(e_ref, lam_ref, h_ref, pre_ref, pref_ref, post_ref,
                postf_ref, p_scr, f_scr, *, S, NS, TB, nm):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        p_scr[:] = jnp.full_like(p_scr, 1.0 / S)
        f_scr[:] = jnp.zeros_like(f_scr)

    p = p_scr[:]                                   # [TB*NS, S]
    f = f_scr[:]                                   # [TB*NS, 1]
    pre_ref[:] = p.reshape(TB, 1, NS, S)
    pref_ref[:] = f.reshape(TB, 1, NS, 1)

    e = e_ref[:].reshape(TB * NS, S)
    p = jnp.where(p < 1e-30, 0.0, p)
    pe = p * e
    s = pe.sum(axis=1, keepdims=True)
    ok = s > 0
    pn = jnp.where(ok, pe / jnp.where(ok, s, 1.0), 0.0)
    f = jnp.where(ok, f + jnp.log(jnp.where(ok, s, 1.0)), MINFACTOR)

    post_ref[:] = pn.reshape(TB, 1, NS, S)
    postf_ref[:] = f.reshape(TB, 1, NS, 1)
    f_scr[:] = f

    h = h_ref[:]
    lam = lam_ref[pl.ds(m, 1), :]
    q = jnp.dot(pn, h, preferred_element_type=pn.dtype) * lam
    p_scr[:] = jnp.dot(q, h, preferred_element_type=pn.dtype) * (1.0 / S)


def _bwd_kernel(e_ref, lam_ref, h_ref, bw_ref, bwf_ref, p_scr, f_scr, *,
                S, NS, TB, nm):
    """Walks reversed marker order; e_ref/lam_ref are pre-reversed."""
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        p_scr[:] = jnp.ones_like(p_scr)
        f_scr[:] = jnp.zeros_like(f_scr)

    p = p_scr[:]
    f = f_scr[:]
    bw_ref[:] = p.reshape(TB, 1, NS, S)
    bwf_ref[:] = f.reshape(TB, 1, NS, 1)

    e = e_ref[:].reshape(TB * NS, S)
    p = jnp.where(p < 1e-30, 0.0, p)
    pe = p * e
    s = pe.sum(axis=1, keepdims=True)
    ok = s > 0
    pn = jnp.where(ok, pe / jnp.where(ok, s, 1.0), 0.0)
    f = jnp.where(ok, f + jnp.log(jnp.where(ok, s, 1.0)), MINFACTOR)
    f_scr[:] = f

    h = h_ref[:]
    lam = lam_ref[pl.ds(m, 1), :]
    q = jnp.dot(pn, h, preferred_element_type=pn.dtype) * lam
    p_scr[:] = jnp.dot(q, h, preferred_element_type=pn.dtype) * (1.0 / S)


def _pad_batch(x, TB):
    B = x.shape[0]
    pad = (-B) % TB
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x, B


@functools.partial(jax.jit, static_argnames=("interpret",))
def fb_sweeps_pallas(e_all: jnp.ndarray, lam: jnp.ndarray,
                     interpret: bool = False):
    """e_all: [B, M, S, NS]; lam: [M-1, S] transition eigenvalues.

    Returns (fw_pre, fw_post, bw, fw_pre_f, fw_post_f, bw_f) shaped like
    the XLA path (forward_backward)."""
    B0, M, S, NS = e_all.shape
    dtype = e_all.dtype
    TB = _TB
    e_t = jnp.moveaxis(e_all, 3, 2)                # [B, M, NS, S]
    e_t, B0 = _pad_batch(e_t, TB)
    B = e_t.shape[0]
    nb = B // TB

    h = jnp.asarray(hadamard(int(S).bit_length() - 1, str(dtype)))
    lam_pad = jnp.concatenate([lam, jnp.ones((1, S), dtype=dtype)], 0)

    grid = (nb, M)
    espec = pl.BlockSpec((TB, 1, NS, S), lambda b, m: (b, m, 0, 0))
    lspec = pl.BlockSpec((M, S), lambda b, m: (0, 0))
    hspec = pl.BlockSpec((S, S), lambda b, m: (0, 0))
    outspec = pl.BlockSpec((TB, 1, NS, S), lambda b, m: (b, m, 0, 0))
    fspec = pl.BlockSpec((TB, 1, NS, 1), lambda b, m: (b, m, 0, 0))
    scratch = [pltpu.VMEM((TB * NS, S), dtype),
               pltpu.VMEM((TB * NS, 1), dtype)]
    shapes = (jax.ShapeDtypeStruct((B, M, NS, S), dtype),
              jax.ShapeDtypeStruct((B, M, NS, 1), dtype),
              jax.ShapeDtypeStruct((B, M, NS, S), dtype),
              jax.ShapeDtypeStruct((B, M, NS, 1), dtype))

    fw_pre, fw_pre_f, fw_post, fw_post_f = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, NS=NS, TB=TB, nm=M),
        grid=grid,
        in_specs=[espec, lspec, hspec],
        out_specs=(outspec, fspec, outspec, fspec),
        out_shape=shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(e_t, lam_pad, h)

    # backward on reversed markers; interval i of the reversed walk is the
    # original interval M-2-i
    e_rev = e_t[:, ::-1]
    lam_rev = jnp.concatenate([lam[::-1], jnp.ones((1, S), dtype=dtype)], 0)
    bw_rev, bw_rev_f = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, NS=NS, TB=TB, nm=M),
        grid=grid,
        in_specs=[espec, lspec, hspec],
        out_specs=(outspec, fspec),
        out_shape=(shapes[0], shapes[1]),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(e_rev, lam_rev, h)
    bw = bw_rev[:, ::-1]
    bw_f = bw_rev_f[:, ::-1]

    def arrange(x):
        return jnp.moveaxis(x[:B0], 2, 3)

    return (arrange(fw_pre), arrange(fw_post), arrange(bw),
            fw_pre_f[:B0, :, :, 0], fw_post_f[:B0, :, :, 0],
            bw_f[:B0, :, :, 0])
