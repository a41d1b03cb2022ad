"""Relative-skew smoothing HMM.

A 2-state HMM per individual per chromosome over adjacent-marker phase
coherence: emissions are the haplotype weights, transitions the ``relhaplo``
coherence weights (``relskewhmm``, cnF2freq.cpp:4325-4467).  Its per-marker
state-1 posterior feeds the haploweight gradient as ``relskewterm``
(cnF2freq.cpp:4603-4606, 4692).

Vectorized: one ``lax.scan`` over markers with all individuals riding the
batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relskew_ratio(hw: jnp.ndarray, relhaplo: jnp.ndarray) -> jnp.ndarray:
    """ratio[n, m] = posterior of phase-state 1 at marker m.

    hw, relhaplo: [N, M].  Mirrors the fw pass (emission at m then
    transition relhaplo[m]) and the emission-inclusive backward pass of the
    reference, including its unusual renormalisation (only rescaling when
    the mass underflows 1e-10; cnF2freq.cpp:4396-4409)."""
    N, M = hw.shape
    e0 = 1.0 - hw   # state-0 emission |1 - w| ... state ordering per ref:
    e1 = hw         # doemissions: s[k] *= fabs(!k - w)
    # NOTE reference: k=0 -> |1-w| = 1-w, k=1 -> |0-w| = w
    em = jnp.stack([e0, e1], axis=-1)          # [N, M, 2]
    rh = jnp.stack([relhaplo, 1.0 - relhaplo], axis=-1)  # [N, M, 2] (n, nb)

    def renorm(s):
        mass = s.sum(axis=-1, keepdims=True)
        return jnp.where(mass < 1e-10, s * 1e20, s)

    def trans(s, r):
        n = r[..., 0:1]
        nb = r[..., 1:2]
        return s * n + s[..., ::-1] * nb

    def fwd(carry, xs):
        e, r = xs
        s = carry * e
        stored = s
        s = trans(renorm(s), r)
        return s, stored

    init = jnp.full((N, 2), 0.5)
    _, fw = jax.lax.scan(fwd, init,
                         (jnp.moveaxis(em, 1, 0), jnp.moveaxis(rh, 1, 0)))
    fw = jnp.moveaxis(fw, 0, 1)                # [N, M, 2]

    # backward with emissions folded in; ratio uses transitioned backward
    # times stored forward (cnF2freq.cpp:4421-4442)
    def bwd(carry, xs):
        e_next, r_here, fw_here = xs
        s = carry * e_next
        s = renorm(trans(s, r_here))
        rf = s * fw_here
        return s, rf

    xs = (jnp.moveaxis(em, 1, 0)[1:][::-1],
          jnp.moveaxis(rh, 1, 0)[:-1][::-1],
          jnp.moveaxis(fw, 1, 0)[:-1][::-1])
    _, rf = jax.lax.scan(bwd, init, xs)
    rf = jnp.moveaxis(rf[::-1], 0, 1)          # [N, M-1, 2]

    last = fw[:, -1:, :]
    ratios_last = last[..., 1] / (last[..., 0] + last[..., 1])
    ratios = rf[..., 1] / (rf[..., 0] + rf[..., 1])
    return jnp.concatenate([ratios, ratios_last], axis=1)


def relskew_weight(hw: jnp.ndarray, relhaplo: jnp.ndarray):
    """getweight(m, dir) pair: normalised forward (dir 0) and backward
    (dir 1) state-1 weights (cnF2freq.cpp:4449-4466).  Returns
    (w0[N, M], w1[N, M]); w1 at the first marker mirrors the reference's
    uninitialised slot as 0.5."""
    N, M = hw.shape
    em = jnp.stack([1.0 - hw, hw], axis=-1)
    rh = jnp.stack([relhaplo, 1.0 - relhaplo], axis=-1)

    def renorm(s):
        mass = s.sum(axis=-1, keepdims=True)
        return jnp.where(mass < 1e-10, s * 1e20, s)

    def trans(s, r):
        return s * r[..., 0:1] + s[..., ::-1] * r[..., 1:2]

    def fwd(carry, xs):
        e, r = xs
        s = carry * e
        stored = s
        s = trans(renorm(s), r)
        return s, stored

    init = jnp.full((N, 2), 0.5)
    _, fw = jax.lax.scan(fwd, init,
                         (jnp.moveaxis(em, 1, 0), jnp.moveaxis(rh, 1, 0)))
    fw = jnp.moveaxis(fw, 0, 1)

    def bwd(carry, xs):
        e_next, r_here = xs
        s = carry * e_next
        stored = s          # stored at marker m+1, dir 1
        s = renorm(trans(s, r_here))
        return s, stored

    xs = (jnp.moveaxis(em, 1, 0)[1:][::-1],
          jnp.moveaxis(rh, 1, 0)[:-1][::-1])
    _, bwst = jax.lax.scan(bwd, init, xs)
    bwst = jnp.moveaxis(bwst[::-1], 0, 1)      # [N, M-1, 2] for markers 1..
    half = jnp.full((N, 1, 2), 0.5)
    bw = jnp.concatenate([half, bwst], axis=1)

    w0 = fw[..., 1] / fw.sum(axis=-1)
    w1 = bw[..., 1] / bw.sum(axis=-1)
    return w0, w1
