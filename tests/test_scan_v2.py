"""The feature-leading v2 scan path agrees with engine.chromosome_scan.

Pins the [M, X, R] layout pipeline (ops/scan_v2.py) — emission tiles,
feature-leading fb scan, zero-copy stats kernel, WHT turn weights —
against the standard [B, M, NS, S] path to f32/f64 accumulation order.
"""
import jax.numpy as jnp
import numpy as np

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.hmm import probes as pr
from cnf2freq_tpu.hmm.emission import assemble_e_all, build_blocks
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.hmm.forward_backward import (combined_loglik,
                                               forward_backward)
from cnf2freq_tpu.ops import scan_v2 as v2
from cnf2freq_tpu.utils import simulate_f2


def _setup(B=6, M=9, dtype=np.float64, seed=3, with_vacant=False):
    ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=2, seed=seed)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    focals = list(ped.dous)
    if with_vacant:
        # F1 focals: founder parents, vacant grandparent slots
        f1s = [i.n for i in ped.inds[1:]
               if i.pars[0] and ped.by_id(i.pars[0]).founder][:2]
        focals = focals + f1s
    fb = gather_family(ped, focals, 0, ped.num_markers - 1, dtype=dtype)
    rng = np.random.default_rng(seed)
    fb.hw = rng.uniform(0.05, 0.95, fb.hw.shape)
    fb.ms = np.where(fb.md > 0, rng.uniform(0.0, 0.3, fb.ms.shape), fb.ms)
    dists = jnp.asarray(np.diff(ped.markerposes).astype(dtype))
    cfg = ModelConfig()
    params = RuntimeParams()
    return fb.map(jnp.asarray), dists, cfg, params


def _v2_pipeline(fbj, dists, cfg, params, dtype):
    M = fbj.md.shape[2]
    st = v2.prep_slots(fbj, dtype)
    e = v2.emission_tiles(st, M, cfg, dtype=dtype, interpret=True)
    R = st.nb * 8 * 128
    e_flat = e.reshape(M, 512, R)
    fb2 = v2.fb_scan_v2(e_flat, dists, cfg, params)
    total = v2.combined_loglik_v2(fb2, st.sh)
    return st, e, fb2, total


def test_emission_tiles_match_assemble_e():
    # with_vacant: F1 focals with empty grandparent slots pin the
    # no-flag2ignore-mask form of the kernel against assemble_e_all
    fbj, dists, cfg, params = _setup(with_vacant=True)
    dtype = jnp.float64
    B, _, M, _ = fbj.md.shape
    st, e, _, _ = _v2_pipeline(fbj, dists, cfg, params, dtype)
    R = st.nb * 8 * 128
    e_v2 = np.asarray(e.reshape(M, 512, R)[:, :, :B])      # [M, X, B]
    e_v2 = np.transpose(e_v2, (2, 0, 1)).reshape(
        B, M, cfg.numshifts, cfg.numtypes)

    blocks = build_blocks(fbj, cfg, dtype=dtype)
    e_std = np.asarray(assemble_e_all(blocks, cfg))         # [B, M, NS, S]
    np.testing.assert_allclose(e_v2, e_std, rtol=1e-9, atol=1e-12)


def test_fb_scan_v2_matches_forward_backward():
    fbj, dists, cfg, params = _setup(B=5, M=8, seed=7)
    dtype = jnp.float64
    B, _, M, _ = fbj.md.shape
    st, _, fb2, total = _v2_pipeline(fbj, dists, cfg, params, dtype)
    R = st.nb * 8 * 128

    blocks = build_blocks(fbj, cfg, dtype=dtype)
    e_std = assemble_e_all(blocks, cfg)
    ref = forward_backward(e_std, dists, cfg, params)
    ref_total = combined_loglik(ref, fbj.shiftignore)

    def to_std(x):  # [M, X, R] -> [B, M, NS, S]
        x = np.asarray(x.reshape(M, 512, R)[:, :, :B])
        return np.transpose(x, (2, 0, 1)).reshape(
            B, M, cfg.numshifts, cfg.numtypes)

    def to_std_f(x):  # [M, NS, R] -> [B, M, NS]
        x = np.asarray(x[:, :, :B])
        return np.transpose(x, (2, 0, 1))

    np.testing.assert_allclose(to_std(fb2.fw_pre), np.asarray(ref.fw_pre),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(to_std(fb2.fw_post), np.asarray(ref.fw_post),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(to_std(fb2.bw), np.asarray(ref.bw),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(to_std_f(fb2.fw_pre_f),
                               np.asarray(ref.fw_pre_f), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(to_std_f(fb2.bw_f), np.asarray(ref.bw_f),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(total)[:B], np.asarray(ref_total),
                               rtol=1e-9, atol=1e-12)


def test_stats_and_turns_v2_match_probes():
    fbj, dists, cfg, params = _setup(B=6, M=9, seed=3)
    dtype = jnp.float64
    B, _, M, _ = fbj.md.shape
    st, _, fb2, total = _v2_pipeline(fbj, dists, cfg, params, dtype)

    b12, accum, pair = v2.stats_from_v2(st, fb2, total, M, B, cfg, dtype,
                                        interpret=True)
    turn_w = v2.turn_weights_v2(fb2, st.sh, fbj.descendants.astype(dtype),
                                cfg, B)

    blocks = build_blocks(fbj, cfg, dtype=dtype)
    e_std = assemble_e_all(blocks, cfg)
    ref = forward_backward(e_std, dists, cfg, params)
    ref_total = combined_loglik(ref, fbj.shiftignore)
    W = pr.posterior_weight(ref, ref_total, fbj.shiftignore)
    hs = pr.haplo_stats(W, blocks, fbj, cfg)
    ist = pr.infprob_stats(W, blocks, fbj, cfg)
    ref_turn = pr.turn_weights_fast(ref, fbj, cfg)

    np.testing.assert_allclose(np.asarray(b12), np.asarray(hs.b12),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(accum), np.asarray(ist.accum),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pair), np.asarray(ist.pair),
                               rtol=1e-9, atol=1e-12)
    tw, rtw = np.asarray(turn_w), np.asarray(ref_turn)
    finite = np.isfinite(rtw) & (rtw > -1e14)
    np.testing.assert_allclose(tw[finite], rtw[finite], rtol=1e-7,
                               atol=1e-9)
    assert np.array_equal(finite, np.isfinite(tw) & (tw > -1e14))


def test_fb_sweeps_pallas_matches():
    """The fused v2 fb kernel == fb_scan_v2 (XLA scan)."""
    fbj, dists, cfg, params = _setup(B=5, M=8, seed=7)
    dtype = jnp.float64
    M = fbj.md.shape[2]
    st = v2.prep_slots(fbj, dtype)
    R = st.nb * 8 * 128
    e = v2.emission_tiles(st, M, cfg, dtype=dtype,
                          interpret=True).reshape(M, 512, R)
    ref = v2.fb_scan_v2(e, dists, cfg, params)
    got = v2.fb_sweeps_v2_pallas(e, dists, cfg, params, interpret=True)
    for name in ref._fields:
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-9, atol=1e-12, err_msg=name)


def test_fb_sweeps_pallas_single_marker():
    """M=1 edge: the backward sweep is pure initial state, the forward
    transition uses the padded identity eigenvalues."""
    import dataclasses

    fbj, dists, cfg, params = _setup(B=4, M=7, seed=5)
    dtype = jnp.float64
    fb1 = dataclasses.replace(fbj, md=fbj.md[:, :, :1],
                              ms=fbj.ms[:, :, :1], hw=fbj.hw[:, :, :1])
    st = v2.prep_slots(fb1, dtype)
    R = st.nb * 8 * 128
    e = v2.emission_tiles(st, 1, cfg, dtype=dtype,
                          interpret=True).reshape(1, 512, R)
    d1 = dists[:0]
    ref = v2.fb_scan_v2(e, d1, cfg, params)
    got = v2.fb_sweeps_v2_pallas(e, d1, cfg, params, interpret=True)
    for name in ref._fields:
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-12, atol=1e-15, err_msg=name)


def test_turn_weights_pallas_matches():
    """The fused turn-weight kernel == turn_weights_v2 (XLA form)."""
    fbj, dists, cfg, params = _setup(B=6, M=9, seed=3)
    dtype = jnp.float64
    B = fbj.md.shape[0]
    st, _, fb2, _ = _v2_pipeline(fbj, dists, cfg, params, dtype)
    desc = fbj.descendants.astype(dtype)
    ref = np.asarray(v2.turn_weights_v2(fb2, st.sh, desc, cfg, B))
    got = np.asarray(v2.turn_weights_v2_pallas(fb2, st.sh, desc, cfg, B,
                                               interpret=True))
    finite = ref > -1e14
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_array_equal(finite, got > -1e14)


def test_engine_scan_v2_path_matches():
    """chromosome_scan(use_scan_v2=True) agrees with the standard path."""
    from cnf2freq_tpu.engine import chromosome_scan

    fbj, dists, cfg, params = _setup(B=4, M=7, seed=5)
    ref = chromosome_scan(fbj, dists, cfg, params, use_scan_v2=False,
                          use_stats_pallas=False)
    out = chromosome_scan(fbj, dists, cfg, params, use_scan_v2=True)
    for name in ("total", "haplo_b12", "inf_accum", "pair", "fw_pre",
                 "bw", "fw_pre_f", "bw_f"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-9, atol=1e-12, err_msg=name)
    np.testing.assert_array_equal(np.asarray(out.haplo_mask),
                                  np.asarray(ref.haplo_mask))
    tw, rtw = np.asarray(out.turn_weight), np.asarray(ref.turn_weight)
    finite = np.isfinite(rtw) & (rtw > -1e14)
    np.testing.assert_allclose(tw[finite], rtw[finite], rtol=1e-7,
                               atol=1e-9)


def test_nonaligned_batch_padding():
    # B far from a tile multiple: padded rows must not perturb real ones
    fbj, dists, cfg, params = _setup(B=3, M=5, seed=11)
    dtype = jnp.float64
    B, _, M, _ = fbj.md.shape
    st, _, fb2, total = _v2_pipeline(fbj, dists, cfg, params, dtype)
    b12, _, _ = v2.stats_from_v2(st, fb2, total, M, B, cfg, dtype,
                                 interpret=True)

    blocks = build_blocks(fbj, cfg, dtype=dtype)
    ref = forward_backward(assemble_e_all(blocks, cfg), dists, cfg, params)
    ref_total = combined_loglik(ref, fbj.shiftignore)
    W = pr.posterior_weight(ref, ref_total, fbj.shiftignore)
    hs = pr.haplo_stats(W, blocks, fbj, cfg)
    np.testing.assert_allclose(np.asarray(b12), np.asarray(hs.b12),
                               rtol=1e-9, atol=1e-12)
