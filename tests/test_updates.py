"""Capped gradient machinery vs scalar reference implementations."""

import math

import numpy as np
import pytest

from cnf2freq_tpu.updates import caplogitchange, cappedgd, relskew_ratio
from cnf2freq_tpu.updates.capped import _GL_X, _GL_W


def scalar_caplogit(intended, orig, eps, breakathalf=False):
    """Direct transliteration of caplogitchange semantics for testing."""
    nnn = 3.0
    limn = (nnn - 1) * orig * (-1 + orig)
    limd1 = -1 - (nnn - 1) * orig
    limd2 = (nnn - 1) * orig - nnn
    intended = min(intended, 1 - eps)
    intended = max(intended, eps)
    diff = intended - orig
    hit = False
    if diff > limn / limd1:
        intended = orig + limn / limd1
        hit = intended < 0.5
    if diff < -limn / limd2:
        intended = orig - limn / limd2
        hit = intended > 0.5
    if breakathalf and (intended - 0.5) * (orig - 0.5) < 0:
        intended = 0.5 * (0.5 + orig)
    return intended, hit


def scalar_cappedgd(grad, orig, eps, scalefactor, breakathalf=False):
    """Scalar bisection mirror of cnF2freq.cpp:4106-4176."""
    def actual(v):
        v = min(max(v, eps), 1 - eps)
        return 1.0 / grad(v)

    def integrate(a, b):
        mid, half = 0.5 * (a + b), 0.5 * (b - a)
        return sum(w * actual(mid + half * x)
                   for x, w in zip(_GL_X, _GL_W)) * half

    lolim, _ = scalar_caplogit(eps, orig, eps, breakathalf)
    lo = lolim - eps * 0.125
    hilim, _ = scalar_caplogit(1 - eps, orig, eps, breakathalf)
    hi = hilim + eps * 0.125
    orig, _ = scalar_caplogit(orig, orig, eps, breakathalf)
    gv = actual(orig)
    if not math.isfinite(gv) or not scalefactor:
        lo = hi = orig
    lowside = gv < 0
    if lowside:
        hi = orig
    else:
        lo = orig
    for _ in range(51):
        if not scalefactor:
            break
        if lo > hilim or hi < lolim:
            break
        mid = (lo + hi) / 2
        gv = actual(mid)
        if (gv < 0) != lowside or not math.isfinite(gv):
            prel = (scalefactor + 0.1) * 1.1
        else:
            start, end = min(orig, mid), max(orig, mid)
            if end - start < 1e-10:
                break
            prel = integrate(start, end)
            if end != mid:
                prel = -prel
            if not math.isfinite(prel):
                prel = (scalefactor + 0.1) * 1.1
        if abs(prel - scalefactor) < scalefactor * 1e-3:
            break
        if (prel < scalefactor) != lowside:
            lo = mid
        else:
            hi = mid
    if not scalefactor:
        lo = hi = orig
    return scalar_caplogit((lo + hi) / 2, orig, eps, breakathalf)


def test_caplogitchange_matches_scalar():
    rng = np.random.default_rng(0)
    intended = rng.uniform(0, 1, 200)
    orig = rng.uniform(0.01, 0.99, 200)
    out, hit = caplogitchange(intended, orig, 1e-6, False)
    for i in range(200):
        e, h = scalar_caplogit(intended[i], orig[i], 1e-6)
        assert np.isclose(out[i], e, rtol=1e-12), i
        assert bool(hit[i]) == h, i


@pytest.mark.parametrize("scalefactor", [0.013, 0.2, 0.0])
def test_cappedgd_matches_scalar(scalefactor):
    rng = np.random.default_rng(1)
    N = 64
    a = rng.uniform(-5, 5, N)      # gradient: a - b*logit-ish pull
    b = rng.uniform(0.5, 5, N)
    orig = rng.uniform(0.02, 0.98, N)
    eps = 1e-6

    def vec_grad(x):
        n = x.shape[0] // N if x.shape[0] != N else 1
        aa = np.tile(a, n) if n > 1 else a
        bb = np.tile(b, n) if n > 1 else b
        return aa + bb * np.log(1.0 / x - 1.0)

    def jgrad(x):
        import jax.numpy as jnp
        k = x.shape[0] // N
        aa = jnp.tile(jnp.asarray(a), k)
        bb = jnp.tile(jnp.asarray(b), k)
        return aa + bb * jnp.log(1.0 / x - 1.0)

    out, hits = cappedgd(jgrad, orig, eps, scalefactor)
    for i in range(N):
        def g(v, i=i):
            return a[i] + b[i] * math.log(1.0 / v - 1.0)
        e, h = scalar_cappedgd(g, orig[i], eps, scalefactor)
        assert np.isclose(out[i], e, rtol=1e-9, atol=1e-9), \
            (i, float(out[i]), e)


def test_relskew_uniform_is_half():
    """With relhaplo == 0.5 everywhere and hw == 0.5, ratio must be 0.5."""
    hw = np.full((3, 10), 0.5)
    rh = np.full((3, 10), 0.5)
    r = np.asarray(relskew_ratio(hw, rh))
    np.testing.assert_allclose(r, 0.5, atol=1e-12)


def test_relskew_matches_scalar():
    """Scalar mirror of relskewhmm fw/bw/ratio."""
    rng = np.random.default_rng(3)
    M = 8
    hw = rng.uniform(0.05, 0.95, (1, M))
    rh = rng.uniform(0.05, 0.95, (1, M))
    got = np.asarray(relskew_ratio(hw, rh))[0]

    # scalar reference (cnF2freq.cpp:4338-4443)
    fw = np.zeros((M, 2))
    s = np.array([0.5, 0.5])
    for m in range(M):
        s = s * np.array([1 - hw[0, m], hw[0, m]])
        fw[m] = s
        if s.sum() < 1e-10:
            s = s * 1e20
        n, nb = rh[0, m], 1 - rh[0, m]
        s = np.array([s[0] * n + s[1] * nb, s[1] * n + s[0] * nb])
    ratio = np.zeros(M)
    ratio[M - 1] = fw[M - 1][1] / fw[M - 1].sum()
    s = np.array([0.5, 0.5])
    for m in range(M - 2, -1, -1):
        s = s * np.array([1 - hw[0, m + 1], hw[0, m + 1]])
        n, nb = rh[0, m], 1 - rh[0, m]
        s = np.array([s[0] * n + s[1] * nb, s[1] * n + s[0] * nb])
        if s.sum() < 1e-10:
            s = s * 1e20
        rf = s * fw[m]
        ratio[m] = rf[1] / rf.sum()
    np.testing.assert_allclose(got, ratio, rtol=1e-12)
