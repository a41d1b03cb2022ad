"""C++ flip-solver core vs the pure-Python reference implementation."""

import numpy as np
import pytest

from cnf2freq_tpu.native import load_flipsolve
from cnf2freq_tpu.updates.phaseflip import solve_marker

pytestmark = pytest.mark.skipif(load_flipsolve() is None,
                                reason="no C++ toolchain")


def random_instance(rng, n_vars, n_fams, max_fam_vars=4):
    fams = []
    for _ in range(n_fams):
        k = rng.integers(1, max_fam_vars + 1)
        vars_ = list(rng.choice(n_vars, size=k, replace=False))
        S = rng.normal(size=1 << k)
        # sprinkle infeasible patterns
        S[rng.random(1 << k) < 0.2] = -np.inf
        S[0] = abs(rng.normal())   # keep the no-flip pattern feasible
        fams.append(([int(v) for v in vars_], S))
    return fams


def brute_force(fams):
    vset = sorted({v for vars_, _ in fams for v in vars_})
    vidx = {v: i for i, v in enumerate(vset)}
    best, best_a = -np.inf, 0
    for a in range(1 << len(vset)):
        sc = 0.0
        for vars_, S in fams:
            p = 0
            for i, v in enumerate(vars_):
                if (a >> vidx[v]) & 1:
                    p |= 1 << i
            sc += S[p]
        if sc > best:
            best, best_a = sc, a
    return best


def total(fams, assign):
    sc = 0.0
    for vars_, S in fams:
        p = 0
        for i, v in enumerate(vars_):
            if assign.get(v, False):
                p |= 1 << i
        sc += S[p]
    return sc


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_bruteforce_small(seed):
    rng = np.random.default_rng(seed)
    fams = random_instance(rng, n_vars=8, n_fams=6)
    a_native = solve_marker(fams, use_native=True)
    a_python = solve_marker(fams, use_native=False)
    want = brute_force(fams)
    assert total(fams, a_native) == pytest.approx(want, abs=1e-12)
    assert total(fams, a_python) == pytest.approx(want, abs=1e-12)


def test_native_icm_large_component():
    """Above the exhaustive window both engines must reach a local
    optimum at least as good as the all-zeros assignment."""
    rng = np.random.default_rng(42)
    fams = random_instance(rng, n_vars=40, n_fams=60, max_fam_vars=3)
    a = solve_marker(fams, exhaustive_limit=10, use_native=True)
    base = total(fams, {})
    assert total(fams, a) >= base - 1e-12


def test_native_wide_exhaustive():
    """The native path solves 2^16-assignment components exactly."""
    rng = np.random.default_rng(7)
    fams = random_instance(rng, n_vars=16, n_fams=30, max_fam_vars=3)
    # force one connected component
    fams.append((list(range(16))[:4], rng.normal(size=16)))
    chain = [([i, i + 1], rng.normal(size=4)) for i in range(15)]
    fams.extend(chain)
    a = solve_marker(fams, use_native=True)
    a_py = solve_marker(fams, exhaustive_limit=16, use_native=False)
    assert total(fams, a) == pytest.approx(total(fams, a_py), abs=1e-9)
