"""Sharded collective accumulator merge vs the unsharded result.

The TPU replacement for the reference's per-marker OpenMP locks and MPI
reduce (cnF2freq.cpp:5265-5270, 6245-6255) is segment-sum + XLA-inserted
collectives (parallel/collective.py); sharding over the virtual 8-device
mesh must be bit-compatible with the single-device merge."""

import jax
import numpy as np
import pytest

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.engine import chromosome_scan
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.parallel import make_mesh, pad_batch, replicate, \
    shard_batch
from cnf2freq_tpu.parallel.collective import (merge_slot_stats,
                                              sharded_scan_and_merge)
from cnf2freq_tpu.utils import simulate_f2


def cohort(n=12, M=10):
    ped = simulate_f2(n_f2=n, n_markers=M, seed=4, missing_rate=0.2)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1)
    dists = np.diff(ped.markerposes)
    return ped, fb, dists


def test_sharded_merge_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    ped, fb, dists = cohort()
    cfg, params = ped.config, RuntimeParams()
    NI = len(ped.inds) - 1

    # unsharded reference
    import jax.numpy as jnp
    res = chromosome_scan(fb.map(jnp.asarray), jnp.asarray(dists), cfg,
                          params)
    masked = jnp.where(res.haplo_mask[..., None], res.haplo_b12, 0.0)
    want_hb = np.asarray(merge_slot_stats(masked, jnp.asarray(fb.slot_ind),
                                          NI))
    want_inf = np.asarray(merge_slot_stats(res.inf_accum,
                                           jnp.asarray(fb.slot_ind), NI))
    want_total = np.asarray(res.total)

    mesh = make_mesh(8)
    fbp = pad_batch(fb, 8)
    fbs = shard_batch(fbp, mesh)
    total, hb, inf = sharded_scan_and_merge(fbs, dists, cfg, params, mesh,
                                            NI)
    np.testing.assert_allclose(np.asarray(total)[:len(want_total)],
                               want_total, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hb), want_hb, rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(inf), want_inf, rtol=1e-9,
                               atol=1e-12)


def test_merge_accumulates_shared_parents():
    """Two F2 children of the same parents: the parents' slots appear in
    both analysis units and their statistics must sum across units —
    the lock-free replacement for the reference's per-marker locks."""
    import jax.numpy as jnp
    ped, fb, dists = cohort(n=2)
    cfg, params = ped.config, RuntimeParams()
    NI = len(ped.inds) - 1
    res = chromosome_scan(fb.map(jnp.asarray), jnp.asarray(dists), cfg,
                          params)
    masked = jnp.where(res.haplo_mask[..., None], res.haplo_b12, 0.0)
    merged = np.asarray(merge_slot_stats(masked,
                                         jnp.asarray(fb.slot_ind), NI))
    masked = np.asarray(masked)
    slot_ind = np.asarray(fb.slot_ind)
    # hand-accumulate
    want = np.zeros_like(merged)
    for b in range(masked.shape[0]):
        for s in range(slot_ind.shape[1]):
            sid = slot_ind[b, s]
            if sid > 0:
                want[sid - 1] += masked[b, :, s]
    np.testing.assert_allclose(merged, want, rtol=1e-12)
    # at least one shared slot (the common parents) must receive
    # contributions from both units
    shared = [sid for sid in slot_ind[0] if sid > 0 and
              sid in slot_ind[1]]
    assert shared


def test_sharded_scan_merged_matches_single_device():
    """The shard_map production step (per-shard scan + psum merge) equals
    the single-device merged scan on a 4-way data mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnf2freq_tpu.config import ModelConfig, RuntimeParams
    from cnf2freq_tpu.engine import make_jitted_scan_merged
    from cnf2freq_tpu.hmm.family import gather_family
    from cnf2freq_tpu.hmm.transition import rate_matrix
    from cnf2freq_tpu.parallel import make_mesh
    from cnf2freq_tpu.parallel.collective import make_sharded_scan_merged
    from cnf2freq_tpu.utils import simulate_f2

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs the virtual CPU mesh")

    ped = simulate_f2(n_f2=8, n_markers=7, seed=5)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    cfg, params = ModelConfig(), RuntimeParams()
    ids = [ind.n for ind in ped.inds[1:]]
    NI = len(ids)
    lut = np.full(max(ids) + 1, NI, dtype=np.int32)
    for i, n in enumerate(ids):
        lut[n] = i
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1)
    fbj = fb.map(jnp.asarray)
    dj = jnp.asarray(np.diff(ped.markerposes))
    rj = jnp.asarray(rate_matrix(cfg, params, ped.num_markers - 1))
    lutj = jnp.asarray(lut)

    ref_res, ref_hb, ref_hc, ref_inf = make_jitted_scan_merged(
        cfg, params, NI)(fbj, dj, lutj, rj)

    mesh = make_mesh(4)
    fn = make_sharded_scan_merged(cfg, params, mesh, NI)
    with mesh:
        (total, pair, turn, hb, hc, inf, _coh, _recomb_sum,
         _recomb_count) = fn(fbj, dj, lutj, rj)

    np.testing.assert_allclose(np.asarray(total), np.asarray(ref_res.total),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pair), np.asarray(ref_res.pair),
                               rtol=1e-9, atol=1e-12)
    tw, rtw = np.asarray(turn), np.asarray(ref_res.turn_weight)
    finite = rtw > -1e14
    np.testing.assert_allclose(tw[finite], rtw[finite], rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(ref_hb),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(ref_hc),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(inf), np.asarray(ref_inf),
                               rtol=1e-9, atol=1e-12)


def test_driver_iterate_under_mesh_matches_single_device():
    """The production Driver with a mesh (scans under shard_map + psum
    merges) reproduces the single-device iterate bit-for-bit-ish on a
    small cohort (VERDICT round-1 item 2)."""
    import jax

    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.parallel import make_mesh
    from cnf2freq_tpu.utils import simulate_f2

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs the virtual CPU mesh")

    def run(mesh):
        ped = simulate_f2(n_f2=8, n_markers=9, seed=3, missing_rate=0.3)
        drv = Driver(ped, mesh=mesh)
        drv.preprocess()
        info = drv.iterate(early=False)
        hw = np.stack([ped.by_id(n).haploweight for n in ped.dous])
        ms = np.stack([ped.by_id(n).markersure for n in ped.dous])
        pair = np.stack([drv.pair_tables[n] for n in ped.dous])
        return info, hw, ms, pair

    info_m, hw_m, ms_m, pair_m = run(make_mesh(4))
    info_s, hw_s, ms_s, pair_s = run(None)
    np.testing.assert_allclose(hw_m, hw_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(ms_m, ms_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(pair_m, pair_s, rtol=1e-9, atol=1e-11)
    assert info_m["hitnnn"] == info_s["hitnnn"]
    assert info_m["inverted"] == info_s["inverted"]


def test_sharded_checkpoint_roundtrip(tmp_path):
    """save_sharded (4-shard layout) + load_sharded restores the full
    state; shard files concatenate into a plain-deserialize-compatible
    dump."""
    from cnf2freq_tpu.driver import Driver
    from cnf2freq_tpu.io.sharded_checkpoint import (load_sharded,
                                                    save_sharded)
    from cnf2freq_tpu.utils import simulate_f2

    ped = simulate_f2(n_f2=10, n_markers=8, seed=7)
    drv = Driver(ped)
    drv.preprocess()
    drv.iterate(early=False)
    want_hw = {n: ped.by_id(n).haploweight.copy() for n in ped.dous}
    want_md = {n: ped.by_id(n).markerdata.copy() for n in ped.dous}
    save_sharded(ped, str(tmp_path), meta={"iteration": 1},
                 process_count=4)
    import os
    assert len([f for f in os.listdir(tmp_path)
                if f.startswith("shard-")]) == 4

    ped2 = simulate_f2(n_f2=10, n_markers=8, seed=7)
    Driver(ped2).preprocess()
    man = load_sharded(ped2, str(tmp_path))
    assert man["iteration"] == 1
    for n in ped.dous:
        got = ped2.by_id(n)
        md_eq = (got.markerdata == want_md[n]).all(axis=1)
        md_sw = (got.markerdata == want_md[n][:, ::-1]).all(axis=1)
        assert (md_eq | md_sw).all()
        hw = np.where(md_sw & ~md_eq, 1 - got.haploweight,
                      got.haploweight)
        het = want_md[n][:, 0] != want_md[n][:, 1]
        np.testing.assert_allclose(hw[het], want_hw[n][het], atol=2e-6)


def test_remap_distances_under_mesh_matches_single_device():
    """Genetic-map re-estimation under a mesh: the sharded program
    returns the psum'd cohort recombination expectations, and the
    re-estimated ped.actrec equals the single-device run's."""
    from cnf2freq_tpu.driver import Driver

    peds = [simulate_f2(n_f2=16, n_markers=12, n_founder_pairs=2,
                        seed=17) for _ in range(2)]
    drvs = [Driver(peds[0], dtype=np.float64),
            Driver(peds[1], dtype=np.float64, mesh=make_mesh(8))]
    for d in drvs:
        d.remap_distances = True
        d.adaptive_relhaplo = False
        d.preprocess()
        d.iterate(early=True)
        d.iterate(early=False)
    assert peds[0].actrec is not None and peds[1].actrec is not None
    np.testing.assert_allclose(peds[1].actrec, peds[0].actrec,
                               rtol=1e-9, atol=1e-12)
    for a, b in zip(peds[0].inds[1:], peds[1].inds[1:]):
        np.testing.assert_allclose(a.haploweight, b.haploweight,
                                   rtol=1e-8, atol=1e-10)
