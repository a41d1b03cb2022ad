"""Driver-level regression tests: fast end-to-end behaviour checks on
small simulated crosses and the demo dataset."""

import numpy as np
import pytest

from cnf2freq_tpu.config import UNKNOWN
from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.utils import simulate_f2


@pytest.fixture()
def small_cross():
    return simulate_f2(n_f2=8, n_markers=12, missing_rate=0.2,
                       error_rate=0.02, seed=9)


def test_preprocess_fills_aux(small_cross):
    ped = small_cross
    drv = Driver(ped)
    drv.preprocess()
    aux = ped.getind("F2_0_aux_realf")
    # homozygous founders => correction inference phases the F1s
    filled = (aux.markerdata != UNKNOWN).all(axis=1)
    assert filled.mean() > 0.3
    A = ped.getind("A0")
    assert A.founder


def test_iterate_moves_state(small_cross):
    ped = small_cross
    drv = Driver(ped)
    drv.preprocess()
    hw_before = ped.by_id(ped.dous[0]).haploweight.copy()
    info = drv.iterate(early=False)
    assert np.isfinite(info["scalefactor"])
    assert info["hitnnn"] >= 0
    # pair tables exist for every analysed individual and are normalised
    for n in ped.dous:
        tab = drv.pair_tables[n]
        assert tab.shape == (ped.num_markers, 2, 2)
        assert np.isfinite(tab).all()
        assert (tab >= 0).all()
    # either gradient updates moved weights or an inversion flipped a
    # tail somewhere in the pedigree
    moved = any(
        not np.allclose(hw_before if n == ped.dous[0] else 0.5,
                        ped.by_id(n).haploweight)
        for n in ped.dous) or info["inverted"]
    assert moved


def test_single_hidden_marker_recovery():
    """With clean dense data, one hidden marker column must be recovered
    nearly perfectly — the canonical-mask regression test."""
    ped = simulate_f2(n_f2=16, n_markers=14, missing_rate=0.0,
                      error_rate=0.0, seed=5)
    HIDE = 7
    for n in ped.dous:
        ind = ped.by_id(n)
        ind.markerdata[HIDE] = (UNKNOWN, UNKNOWN)
        ind.markersure[HIDE] = (0.0, 0.0)
        ind.priormarkerdata[HIDE] = (UNKNOWN, UNKNOWN)
        ind.priormarkersure[HIDE] = (0.0, 0.0)
    drv = Driver(ped)
    drv.preprocess()
    drv.iterate(early=False)
    hits = 0
    ptrue = []
    for n in ped.dous:
        cls_true = (ped.truths[n][HIDE] == 2).sum()
        p = drv.pair_tables[n][HIDE]
        p = p / p.sum()
        cp = np.array([p[0, 0], p[0, 1] + p[1, 0], p[1, 1]])
        hits += cp.argmax() == cls_true
        ptrue.append(cp[cls_true])
    assert hits >= len(ped.dous) - 2, hits
    assert np.mean(ptrue) > 0.8


def test_demo_pipeline():
    """Demo runs two iterations and produces a sane genotype table.

    Loads its own pedigree copy — driver iterations mutate state and must
    not leak into the session-scoped fixture other tests rely on."""
    import io

    from cnf2freq_tpu.io import load_plantimpute
    from cnf2freq_tpu.io.outputs import (deserialize, write_genotype_table,
                                         write_haplotype_dump)

    ped = load_plantimpute("/root/reference/demoplantimpute.map",
                           "/root/reference/demoplantimpute.ped",
                           "/root/reference/demoplantimpute.gen")
    drv = Driver(ped)
    drv.preprocess()
    for i in range(2):
        drv.iterate(early=(i == 0))
    buf = io.StringIO()
    write_genotype_table(ped, drv.pair_tables, buf)
    text = buf.getvalue()
    assert text.startswith("C:1\n")
    # default block set matches the reference artifact: C and D but not
    # F (parent H has no genotype line) — demooutput's exact block list
    heads = [r for r in text.splitlines() if r and "\t" not in r]
    assert heads == ["C:1", "D:1"]
    rows = [r for r in text.splitlines() if "\t" in r]
    assert len(rows) == 2 * 18
    buf_all = io.StringIO()
    write_genotype_table(ped, drv.pair_tables, buf_all, include_all=True)
    heads_all = [r for r in buf_all.getvalue().splitlines()
                 if r and "\t" not in r]
    assert heads_all == ["C:1", "D:1", "F:1"]
    vals = np.array([[float(v) for v in r.split("\t")] for r in rows])
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=2e-5)
    assert (vals[:, 3] == 0).all()
    # C marker 0 is unobserved but pinned by structure (A=22 x B=22):
    # nearly all mass on the 22 class after two iterations
    assert vals[0, 2] > 0.9
    assert vals[0, 3] == 0.0

    # dump -> deserialize round trip restores state
    buf = io.StringIO()
    write_haplotype_dump(ped, buf, reset_negshift=False)
    C = ped.getind("C")
    saved = C.haploweight.copy()
    C.haploweight[:] = 0.5
    buf.seek(0)
    deserialize(ped, buf)
    np.testing.assert_allclose(C.haploweight, saved, atol=1e-6)


def test_multi_chromosome():
    ped = simulate_f2(n_f2=6, n_markers=8, n_chromosomes=2, seed=12)
    assert ped.chromstarts == [0, 8, 16]
    drv = Driver(ped)
    drv.preprocess()
    info = drv.iterate(early=False)
    tab = drv.pair_tables[ped.dous[0]]
    assert tab.shape == (16, 2, 2)
    assert np.isfinite(tab).all()


def test_map_reestimation_recovers_rates():
    ped = simulate_f2(n_f2=30, n_markers=20, missing_rate=0.1,
                      error_rate=0.01, seed=4)
    drv = Driver(ped)
    drv.preprocess()
    drv.remap_distances = True
    drv.iterate(early=False)
    est = ped.actrec[0, 1:]
    # true simulated rate is -0.02 per cM
    assert np.abs(est.mean() + 0.02) < 0.008


def test_rate_matrix_feeds_scan():
    """Re-estimated map rates (ped.actrec) reach the scan: the default
    rate matrix reproduces the no-matrix scan exactly, a different
    actrec changes the likelihoods."""
    import jax.numpy as jnp

    from cnf2freq_tpu.config import ModelConfig, RuntimeParams
    from cnf2freq_tpu.engine import chromosome_scan
    from cnf2freq_tpu.hmm.family import gather_family
    from cnf2freq_tpu.hmm.transition import rate_matrix

    ped = simulate_f2(n_f2=5, n_markers=7, seed=9)
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    ped.count_descendants()
    fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1).map(
        jnp.asarray)
    dists = jnp.asarray(np.diff(ped.markerposes))
    cfg, params = ModelConfig(), RuntimeParams()
    M = ped.num_markers

    base = chromosome_scan(fb, dists, cfg, params, use_scan_v2=False)
    rm_def = rate_matrix(cfg, params, M - 1)
    same = chromosome_scan(fb, dists, cfg, params, use_scan_v2=False,
                           ratemat=jnp.asarray(rm_def))
    np.testing.assert_allclose(np.asarray(same.total),
                               np.asarray(base.total), rtol=1e-12)

    actrec = np.full((2, M), -0.5)       # much hotter map than genrec
    rm_hot = rate_matrix(cfg, params, M - 1, actrec, 0)
    hot = chromosome_scan(fb, dists, cfg, params, use_scan_v2=False,
                          ratemat=jnp.asarray(rm_hot))
    assert np.abs(np.asarray(hot.total) -
                  np.asarray(base.total)).max() > 1e-6


def test_demo_golden_artifact_parity():
    """Genotype-class calls match the reference's checked-in golden output
    (demooutput) on every real marker for both imputed individuals.

    demooutput is the PlantImpute workflow's only regression artifact
    (SURVEY.md §4); marker 17 is the mandatory trailing dummy
    (demo.sh:22-23) whose values are meaningless padding and excluded."""
    import io

    from cnf2freq_tpu.io import load_plantimpute
    from cnf2freq_tpu.io.outputs import write_genotype_table

    def parse_blocks(text):
        blocks = {}
        cur = None
        for line in text.splitlines():
            if not line.strip():
                continue
            if "\t" not in line:
                cur = line.strip()
                blocks[cur] = []
            else:
                blocks[cur].append([float(v) for v in line.split("\t")])
        return {k: np.array(v) for k, v in blocks.items()}

    with open("/root/reference/demooutput") as f:
        want = parse_blocks(f.read())

    ped = load_plantimpute("/root/reference/demoplantimpute.map",
                           "/root/reference/demoplantimpute.ped",
                           "/root/reference/demoplantimpute.gen")
    drv = Driver(ped)
    drv.preprocess()
    for i in range(6):
        drv.iterate(early=(i == 0))
    buf = io.StringIO()
    write_genotype_table(ped, drv.pair_tables, buf)
    got = parse_blocks(buf.getvalue())

    for name in ("C:1", "D:1"):
        w = want[name]
        g = got[name][:, :w.shape[1]]
        assert w.shape[0] == 18 and g.shape[0] >= 17
        np.testing.assert_array_equal(
            np.argmax(g[:17], axis=1), np.argmax(w[:17], axis=1),
            err_msg=f"genotype-class call mismatch vs demooutput, {name}")
        # calls the reference makes with certainty (>0.95) get majority
        # mass from us on every marker and near-certainty on average
        # (masked-marker posteriors differ in sharpness — the two
        # optimisers converge along different paths — but agree in call
        # everywhere)
        sure = w[:17].max(axis=1) > 0.95
        conf = g[:17][sure].max(axis=1)
        assert (conf > 0.5).all()
        assert conf.mean() > 0.9


def test_line_origin_tables_driver():
    """Driver.line_origin_tables: normalized per-marker class posteriors
    for every analysis individual (the gstr reporter surface)."""
    ped = simulate_f2(n_f2=4, n_markers=6, seed=3)
    drv = Driver(ped)
    drv.preprocess()
    tabs = drv.line_origin_tables()
    for n in ped.dous:
        t = tabs[n]
        assert t.shape == (6, 3)
        assert (t >= -1e-9).all()
        s = t.sum(axis=1)
        assert np.allclose(s[s > 0], 1.0, atol=1e-6)


def test_marker_bucket_neutral():
    """Marker-bucket padding must not change any result: a full
    iteration with padding to 16 equals one with padding disabled."""
    peds = [simulate_f2(n_f2=6, n_markers=9, missing_rate=0.2,
                        error_rate=0.02, seed=13) for _ in range(2)]
    drvs = [Driver(peds[0]), Driver(peds[1])]
    drvs[0].marker_bucket = 16
    drvs[1].marker_bucket = None
    for d in drvs:
        d.preprocess()
        d.iterate(early=False)
    for a, b in zip(peds[0].inds[1:], peds[1].inds[1:]):
        np.testing.assert_allclose(a.haploweight, b.haploweight,
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=a.name)
        np.testing.assert_array_equal(a.markerdata, b.markerdata)
    for n in peds[0].dous:
        np.testing.assert_allclose(drvs[0].pair_tables[n],
                                   drvs[1].pair_tables[n],
                                   rtol=1e-8, atol=1e-11)


def test_batch_streaming_neutral():
    """Chunked cohort streaming (batch_size) must match the single-scan
    path exactly, including the ragged final chunk's batch padding."""
    peds = [simulate_f2(n_f2=7, n_markers=6, missing_rate=0.2,
                        error_rate=0.02, seed=17) for _ in range(2)]
    drvs = [Driver(peds[0]), Driver(peds[1])]
    drvs[0].batch_size = 3          # chunks of 3 + 3 + 1
    for d in drvs:
        d.preprocess()
        d.iterate(early=False)
    for a, b in zip(peds[0].inds[1:], peds[1].inds[1:]):
        np.testing.assert_allclose(a.haploweight, b.haploweight,
                                   rtol=1e-9, atol=1e-12, err_msg=a.name)
        np.testing.assert_array_equal(a.markerdata, b.markerdata)
    for n in peds[0].dous:
        np.testing.assert_allclose(drvs[0].pair_tables[n],
                                   drvs[1].pair_tables[n],
                                   rtol=1e-8, atol=1e-11)


def test_driver_scan_v2_interpret():
    """The full production configuration — v2 scan pipeline with the
    Pallas kernels (interpret mode on CPU), device merge, flip scorer —
    drives one iteration end to end."""
    import os

    os.environ["CNF2FREQ_SCAN_V2"] = "1"
    try:
        ped = simulate_f2(n_f2=3, n_markers=5, missing_rate=0.2, seed=2)
        drv = Driver(ped)
        drv.marker_bucket = 8
        drv.preprocess()
        info = drv.iterate(early=False)
        assert np.isfinite(info["scalefactor"])
        for n in ped.dous:
            tab = drv.pair_tables[n]
            assert tab.shape == (5, 2, 2)
            assert np.isfinite(tab).all() and (tab >= 0).all()
    finally:
        del os.environ["CNF2FREQ_SCAN_V2"]


def test_driver_extended_state_space_gates():
    """SELFING / RELSKEWSTATES run the full iteration loop through
    engine_ext; the standard-space-only extras stay gated with clear
    errors."""
    import dataclasses

    import pytest

    ped = simulate_f2(n_f2=3, n_markers=4, seed=1)
    ped.config = dataclasses.replace(ped.config, selfing=True)
    drv = Driver(ped)
    assert drv.ext and drv.adaptive_relhaplo
    with pytest.raises(NotImplementedError):
        Driver(ped, parity=True)
    # remap x ext was gated through round 3; round 4 closed it
    # (recombination_expectations_ext) — it must now run.
    drv.remap_distances = True
    drv.preprocess()
    drv.iterate(early=True)
    assert ped.actrec is not None and np.isfinite(ped.actrec).all()


def test_update_row_chunking_equivalence():
    """The row-chunked capped-GD update programs (the HBM-OOM fix for
    cohort x whole-genome calls) produce exactly the unchunked results:
    run the same cohort with the chunk cap forced tiny and compare every
    updated parameter and the hitnnn count."""
    results = []
    for rows_cap in (None, 3):
        ped = simulate_f2(n_f2=6, n_markers=12, missing_rate=0.2,
                          error_rate=0.02, seed=17)
        drv = Driver(ped)
        drv.adaptive_relhaplo = False
        if rows_cap is not None:
            drv._update_rows = lambda M, lanes: rows_cap
        drv.preprocess()
        drv.iterate(early=True)
        info = drv.iterate()
        hw = np.stack([i.haploweight for i in ped.inds[1:]])
        ms = np.stack([i.markersure for i in ped.inds[1:]])
        md = np.stack([i.markerdata for i in ped.inds[1:]])
        results.append((info["hitnnn"], hw, ms, md))
    assert results[0][0] == results[1][0]
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=0, atol=0)
    np.testing.assert_allclose(results[0][2], results[1][2],
                               rtol=0, atol=0)
    assert np.array_equal(results[0][3], results[1][3])
