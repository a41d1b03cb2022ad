"""Pallas fused forward-backward vs the XLA scan path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

from cnf2freq_tpu.config import RuntimeParams
from cnf2freq_tpu.hmm import emission_all, gather_family
from cnf2freq_tpu.hmm.forward_backward import forward_backward


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_pallas_matches_xla(demo_pedigree, dtype):
    import jax.numpy as jnp
    ped = demo_pedigree
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=dtype)
    e = emission_all(fb, ped.config, dtype=jnp.dtype(dtype)).astype(dtype)
    dists = np.diff(ped.markerposes).astype(dtype)
    params = RuntimeParams()

    ref = forward_backward(e, dists, ped.config, params, use_pallas=False)
    got = forward_backward(e, dists, ped.config, params, use_pallas=True,
                           pallas_interpret=True)
    tol = dict(rtol=2e-2, atol=2e-4) if dtype == np.float32 else \
        dict(rtol=1e-12, atol=1e-14)
    for name in ("fw_pre", "fw_post", "bw"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)), **tol)
    ftol = dict(rtol=1e-3, atol=1e-3) if dtype == np.float32 else dict(rtol=1e-12)
    for name in ("fw_pre_f", "fw_post_f", "bw_f"):
        g = np.asarray(getattr(got, name))
        r = np.asarray(getattr(ref, name))
        np.testing.assert_allclose(g, r, **ftol)
