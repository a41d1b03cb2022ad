"""The fused Pallas stats kernel agrees exactly with the XLA probes path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.hmm.emission import build_blocks
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.hmm.forward_backward import (combined_loglik,
                                               forward_backward)
from cnf2freq_tpu.hmm import probes as pr
from cnf2freq_tpu.ops.stats_pallas import stats_pallas
from cnf2freq_tpu.utils import simulate_f2


def _setup(B=6, M=9, dtype=np.float64, seed=3):
    ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=2, seed=seed)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=dtype)
    # de-degenerate: random phase weights and some error probability
    rng = np.random.default_rng(seed)
    fb.hw = rng.uniform(0.05, 0.95, fb.hw.shape)
    fb.ms = np.where(fb.md > 0, rng.uniform(0.0, 0.3, fb.ms.shape), fb.ms)
    dists = np.diff(ped.markerposes).astype(dtype)
    cfg = ModelConfig()
    params = RuntimeParams()
    fbj = fb.map(jnp.asarray)
    e = None
    blocks = build_blocks(fbj, cfg, dtype=jnp.float64)
    from cnf2freq_tpu.hmm.emission import assemble_e_all
    e = assemble_e_all(blocks, cfg)
    fbres = forward_backward(e, jnp.asarray(dists), cfg, params)
    total = combined_loglik(fbres, fbj.shiftignore)
    return fbj, blocks, fbres, total, cfg


def test_stats_kernel_matches_xla_probes():
    fbj, blocks, fbres, total, cfg = _setup()
    W = pr.posterior_weight(fbres, total, fbj.shiftignore)
    hs = pr.haplo_stats(W, blocks, fbj, cfg)
    ist = pr.infprob_stats(W, blocks, fbj, cfg)

    b12, accum, pair = stats_pallas(
        fbj, fbres.fw_pre, fbres.bw, fbres.fw_pre_f, fbres.bw_f, total,
        cfg, interpret=True)

    np.testing.assert_allclose(np.asarray(b12), np.asarray(hs.b12),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(accum), np.asarray(ist.accum),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pair), np.asarray(ist.pair),
                               rtol=1e-9, atol=1e-12)


def test_engine_stats_pallas_path_matches():
    """chromosome_scan with use_stats_pallas=True agrees with the XLA
    stats stage (CPU interpret mode)."""
    from cnf2freq_tpu.config import RuntimeParams
    from cnf2freq_tpu.engine import chromosome_scan

    fbj, _, _, _, cfg = _setup(B=4, M=7, seed=5)
    params = RuntimeParams()
    from cnf2freq_tpu.utils import simulate_f2
    ped = simulate_f2(n_f2=4, n_markers=7, n_founder_pairs=2, seed=5)
    dists = jnp.asarray(np.diff(ped.markerposes).astype(np.float64))

    ref = chromosome_scan(fbj, dists, cfg, params, use_stats_pallas=False)
    out = chromosome_scan(fbj, dists, cfg, params, use_stats_pallas=True)
    np.testing.assert_allclose(np.asarray(out.haplo_b12),
                               np.asarray(ref.haplo_b12),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.inf_accum),
                               np.asarray(ref.inf_accum),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.pair), np.asarray(ref.pair),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(out.haplo_mask),
                                  np.asarray(ref.haplo_mask))


def test_stats_kernel_nonaligned_batch():
    # N = B*M far from a tile multiple exercises the padding path
    fbj, blocks, fbres, total, cfg = _setup(B=3, M=5, seed=11)
    W = pr.posterior_weight(fbres, total, fbj.shiftignore)
    hs = pr.haplo_stats(W, blocks, fbj, cfg)
    b12, _, _ = stats_pallas(
        fbj, fbres.fw_pre, fbres.bw, fbres.fw_pre_f, fbres.bw_f, total,
        cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(b12), np.asarray(hs.b12),
                               rtol=1e-9, atol=1e-12)
