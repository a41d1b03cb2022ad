"""Per-parameter update rules: haplotype weights and inferred genotypes.

The shared analytic gradient is the derivative of the pseudo-likelihood

    ((h)(1-x) log(1-x) + g x log(x)) / (h (1-x) + g x)

after the substitutions the reference bakes into its expanded expression
(comment at cnF2freq.cpp:4273-4275); it appears twice, once for haplotype
weights (updatehaploweights, cnF2freq.cpp:4684-4697) and once for genotype
probabilities (processinfprobs, cnF2freq.cpp:4270-4287).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import RuntimeParams
from .capped import cappedgd


def pseudo_likelihood_grad(y, g, h, x):
    """The expanded gradient with (y, g, h) = (current probability,
    posterior-weighted count, total count)."""
    lx = jnp.log(x)
    l1x = jnp.log(1.0 - x)
    num = (-(y * g) ** 2 * lx + (y * g) ** 2 * l1x
           + y * y * g * h * lx - y * y * g * h * l1x - y * y * g * h
           - (y * h) ** 2 * x + (y * h) ** 2
           + y * g * g * lx - y * g * g * l1x + y * g * g
           + 2 * y * g * h * x - y * g * h * lx + y * g * h * l1x
           - y * g * h
           - g * g * x)
    den = (y * g + y * h * x - y * h - g * x) ** 2
    return -num / den


class HaploUpdateResult(NamedTuple):
    haploweight: jnp.ndarray  # [N, M] updated weights
    hits: jnp.ndarray         # [] saturated-step count


def update_haploweights(hw, haplobase, haplocount, markerdata, markersure,
                        relterm, descendants, children, lastinved_active,
                        active, params: RuntimeParams,
                        scalefactor: float) -> HaploUpdateResult:
    """Vectorized updatehaploweights (cnF2freq.cpp:4533-4734) over [N, M]
    lanes.

    relterm: relskew ratio per lane (0.5-neutral when relskews disabled);
    descendants/children: [N]; lastinved_active: [N] bool (breakathalf);
    active: [N, M] bool — lanes that should update (anyinfo on the
    chromosome, weight not locked at 0/1)."""
    w = hw
    B0 = haplobase
    C0 = haplocount

    # similarity damping between near-duplicate allele observations
    # (cnF2freq.cpp:4644-4677)
    scorea = 1.0 - markersure[..., 0]
    scoreb = jnp.where(markerdata[..., 0] != markerdata[..., 1],
                       markersure[..., 1], 1.0 - markersure[..., 1])
    sim = scorea * scoreb + (1.0 - scorea) * (1.0 - scoreb)

    plain = (C0 == 0) | (sim == 1.0)
    C_plain = jnp.maximum(1.0, C0)
    B_plain = w * C_plain

    simc = jnp.minimum(sim, 1.0 - params.maxdiff)
    count2 = C0 * (1.0 - simc)
    B_adj = (B0 - C0 * w + count2 * w) * \
        jnp.where(count2 > 0, C0 / jnp.where(count2 > 0, count2, 1.0), 0.0)
    B_adj = jnp.clip(B_adj, 0.0, C0)

    B = jnp.where(plain, B_plain, B_adj)
    C = jnp.where(plain, C_plain, C0)
    simeff = jnp.where(plain, sim, simc)

    ef = params.entropyfactor
    desc = descendants[:, None] * jnp.ones_like(w)

    def gradient(x):
        base = pseudo_likelihood_grad(w.reshape(-1), B.reshape(-1),
                                      C.reshape(-1), x)
        ent = (1.0 - simeff.reshape(-1)) * ef * jnp.log(1.0 / x - 1.0)
        rel = (relterm.reshape(-1) - x) / (x - x * x) * desc.reshape(-1)
        return base + ent + rel

    eps = (params.maxdiff / (children[:, None] + 1.0)) * jnp.ones_like(w)
    newv, hit = cappedgd(gradient, w.reshape(-1), eps.reshape(-1),
                         scalefactor,
                         breakathalf=jnp.broadcast_to(
                             lastinved_active, w.shape).reshape(-1))
    newv = newv.reshape(w.shape)
    hit = hit.reshape(w.shape) & active
    out = jnp.where(active, newv, hw)
    return HaploUpdateResult(haploweight=out, hits=hit.sum())


class InfprobsUpdateResult(NamedTuple):
    newprob: jnp.ndarray   # [N, M, 2(side), 2(allele 1/2)] updated probs
    hits: jnp.ndarray


def update_infprobs(accum, markerdata, markersure, priordata, priorsure,
                    has_prior, children, params: RuntimeParams,
                    scalefactor: float) -> InfprobsUpdateResult:
    """Vectorized processinfprobs core (cnF2freq.cpp:4179-4291): for each
    (individual, marker, side, candidate allele in {1,2}) move the current
    probability of that allele along the capped gradient.

    accum: [N, M, 2, 2] posterior-weighted allele statistics; zero entries
    are skipped (no probe mass -> no entry in the reference's small_map)."""
    N, M = accum.shape[:2]
    mv = jnp.asarray([1, 2])[None, None, None, :]
    cur = markerdata[..., None]                    # [N, M, 2, 1]
    sure = markersure[..., None]
    curprob = jnp.where(cur == 0, 0.5,
                        jnp.abs((cur == mv).astype(accum.dtype) - sure))

    total = accum.sum(axis=-1, keepdims=True)      # sum over candidate mvs

    pv = priordata[..., None]
    psure = priorsure[..., None]
    pprob = jnp.where(pv == mv, 1.0 - psure, psure)
    pclip = jnp.clip(pprob, 1e-14, 1.0 - 1e-14)
    priord = jnp.where(pprob == 0.0, -10000.0,
                       jnp.where(pprob == 1.0, 10000.0,
                                 jnp.log(pclip) - jnp.log(1.0 - pclip)))
    priord = jnp.where((pv != 0) & has_prior[:, None, None, None],
                       priord, 0.0)

    ef = params.entropyfactor

    def gradient(x):
        base = pseudo_likelihood_grad(curprob.reshape(-1),
                                      accum.reshape(-1),
                                      jnp.broadcast_to(
                                          total, accum.shape).reshape(-1), x)
        ent = ef * (jnp.log(1.0 / x - 1.0) +
                    jnp.broadcast_to(priord, accum.shape).reshape(-1))
        return base + ent

    eps = jnp.broadcast_to(
        (params.maxdiff / (children[:, None, None, None] + 1.0)),
        accum.shape)
    newv, hit = cappedgd(gradient, curprob.reshape(-1) *
                         jnp.ones_like(accum).reshape(-1),
                         eps.reshape(-1), scalefactor)
    newv = newv.reshape(accum.shape)
    live = accum > 0
    newprob = jnp.where(live, newv, 0.0)
    return InfprobsUpdateResult(newprob=newprob, hits=(hit.reshape(
        accum.shape) & live).sum())


def make_jitted_updates(params: RuntimeParams):
    """jit-compiled update kernels with ``scalefactor`` as a traced
    argument — one compile per shape, none per scalefactor value (it
    changes every iteration, cnF2freq.cpp:6373-6392).  Run eagerly these
    dispatch hundreds of small ops, which dominates on high-latency
    device links."""
    import jax

    uh = jax.jit(lambda hw, hb, hc, md, ms, rel, desc, ch, li, act, sf:
                 update_haploweights(hw, hb, hc, md, ms, rel, desc, ch,
                                     li, act, params, sf))
    ui = jax.jit(lambda accum, md, ms, pd, ps, hp, ch, sf:
                 update_infprobs(accum, md, ms, pd, ps, hp, ch, params,
                                 sf))
    return uh, ui
