"""Vectorized capped gradient steps.

The reference updates every bounded parameter (haplotype weights, inferred
genotype probabilities) with a "move along the gradient for a fixed
pseudo-time" rule: find x such that the integral of 1/grad from the current
value to x equals the global ``scalefactor``, located by a 51-step
bisection with 15-point Gauss-Legendre quadrature, then cap the implied
odds change at 3x (``caplogitchange``/``cappedgd``,
cnF2freq.cpp:4006-4177).  Here the whole thing is a fixed-iteration
``lax.fori_loop`` over [N] lanes at once — same math, no Python-level
loops, no boost.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 15-point Gauss-Legendre nodes/weights on [-1, 1] (matches
# boost::math::quadrature::gauss<double, 15>)
_GL_X, _GL_W = np.polynomial.legendre.leggauss(15)
_CAP_ODDS = 3.0   # the nnn factor (cnF2freq.cpp:4008)


def caplogitchange(intended: jnp.ndarray, orig: jnp.ndarray,
                   epsilon: jnp.ndarray, breakathalf) -> Tuple[jnp.ndarray,
                                                               jnp.ndarray]:
    """Bound a proposed value so the odds change at most 3x
    (cnF2freq.cpp:4006-4038).  Returns (value, hit) where hit flags a
    saturated move toward the boundary (feeds scalefactor adaptation)."""
    nnn = _CAP_ODDS
    limn = (nnn - 1.0) * orig * (orig - 1.0)
    limd1 = -1.0 - (nnn - 1.0) * orig
    limd2 = (nnn - 1.0) * orig - nnn

    intended = jnp.clip(intended, epsilon, 1.0 - epsilon)
    diff = intended - orig
    hi = limn / limd1
    lo = -limn / limd2

    over = diff > hi
    under = diff < lo
    out = jnp.where(over, orig + hi, jnp.where(under, orig + lo, intended))
    hit = (over & (out < 0.5)) | (under & (out > 0.5))

    flip = breakathalf & ((out - 0.5) * (orig - 0.5) < 0)
    out = jnp.where(flip, 0.5 * (0.5 + orig), out)
    return out, hit


def cappedgd(gradient: Callable[[jnp.ndarray], jnp.ndarray],
             orig: jnp.ndarray, epsilon: jnp.ndarray,
             scalefactor, breakathalf=False,
             iters: int = 51) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized cappedgd (cnF2freq.cpp:4040-4177).

    gradient: maps value arrays [N] -> gradient arrays [N] (the closure
    captures whatever statistics it needs).  Returns (new_value, hit)."""
    orig = jnp.asarray(orig)
    dtype = orig.dtype
    epsilon = jnp.broadcast_to(jnp.asarray(epsilon, dtype=dtype), orig.shape)
    breakathalf = jnp.broadcast_to(jnp.asarray(breakathalf, dtype=bool),
                                   orig.shape)
    sf = jnp.asarray(scalefactor, dtype=dtype)

    def actualgradient(val):
        val = jnp.clip(val, epsilon, 1.0 - epsilon)
        g = gradient(val)
        return 1.0 / g

    nohit = jnp.zeros(orig.shape, dtype=bool)
    lolim, _ = caplogitchange(epsilon, orig, epsilon, breakathalf)
    hilim, _ = caplogitchange(1.0 - epsilon, orig, epsilon, breakathalf)
    lo0 = lolim - epsilon * 0.125
    hi0 = hilim + epsilon * 0.125
    origc, _ = caplogitchange(orig, orig, epsilon, breakathalf)

    g0 = actualgradient(origc)
    dead = ~jnp.isfinite(g0) | (sf == 0)
    lowside = g0 < 0
    lo = jnp.where(dead, origc, jnp.where(lowside, lo0, origc))
    hi = jnp.where(dead, origc, jnp.where(lowside, origc, hi0))

    gl_x = jnp.asarray(_GL_X, dtype=dtype)
    gl_w = jnp.asarray(_GL_W, dtype=dtype)

    def integrate(a, b):
        """Gauss-Legendre of actualgradient over [a, b] (a <= b); the
        gradient closure always sees [N]-shaped lanes."""
        mid = 0.5 * (a + b)
        half = 0.5 * (b - a)
        acc = jnp.zeros_like(mid)
        for i in range(_GL_X.shape[0]):
            pt = jnp.clip(mid + half * gl_x[i], epsilon, 1.0 - epsilon)
            acc = acc + gl_w[i] / gradient(pt)
        return acc * half

    def body(_, carry):
        lo, hi, done = carry
        out_of_bounds = (lo > hilim) | (hi < lolim)
        done = done | out_of_bounds
        mid = 0.5 * (lo + hi)
        gv = actualgradient(mid)
        wrong_side = (gv < 0) ^ lowside
        bad = wrong_side | ~jnp.isfinite(gv)
        start = jnp.minimum(origc, mid)
        end = jnp.maximum(origc, mid)
        narrow = (end - start) < 1e-10
        done = done | (narrow & ~bad)
        prel = integrate(start, end)
        prel = jnp.where(end != mid, -prel, prel)
        prel = jnp.where(bad | ~jnp.isfinite(prel), (sf + 0.1) * 1.1, prel)
        done = done | (jnp.abs(prel - sf) < sf * 1e-3)
        go_up = (prel < sf) ^ lowside
        lo2 = jnp.where(go_up, mid, lo)
        hi2 = jnp.where(go_up, hi, mid)
        lo = jnp.where(done, lo, lo2)
        hi = jnp.where(done, hi, hi2)
        return lo, hi, done

    # concrete zero scalefactor: skip compiling the loop entirely; under
    # jit (traced scalefactor) the loop runs but every lane starts done
    # via the (sf == 0) term of ``dead``, so the result is identical
    concrete_zero = isinstance(scalefactor, (int, float, np.floating)) \
        and float(scalefactor) == 0.0
    if not concrete_zero:
        # bounded while with all-done early exit: done lanes are frozen
        # inside body (lo/hi pass through), so skipping the remaining
        # iterations once every lane has converged is exact — in steady
        # state most lanes hit the |prel - sf| tolerance well before the
        # reference's fixed 51 steps (cnF2freq.cpp:4131), and the 16
        # gradient evaluations per step dominate this program's cost
        def cond(carry):
            i, _, _, done = carry
            return (i < iters) & ~jnp.all(done)

        def step(carry):
            i, lo, hi, done = carry
            lo, hi, done = body(i, (lo, hi, done))
            return (i + 1, lo, hi, done)

        _, lo, hi, _ = jax.lax.while_loop(
            cond, step, (jnp.asarray(0, dtype=jnp.int32), lo, hi, dead))
    return caplogitchange(0.5 * (lo + hi), orig, epsilon, breakathalf)
