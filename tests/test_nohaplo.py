"""No-haplotyping family (engine_nohaplo.py) pinned against the golden
scalar spec run at the F2_NOHAPLO config (settings.h:60-73).

The golden engine implements the !HAPLOTYPING branches of trackpossible
directly (genwidth==0 stop, first-feasible interpretation break, flat
0.5 weights); these tests pin the tensorized deep-walk chain and the
driver integration against it."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from cnf2freq_tpu.config import (F2_NOHAPLO, GENOSPROBE, ModelConfig,
                                 RuntimeParams)
from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.engine_nohaplo import (chromosome_scan_nohaplo,
                                         nohaplo_emission,
                                         nohaplo_feasibility)
from cnf2freq_tpu.golden.doit import GoldenDoit, ScanAccumulators
from cnf2freq_tpu.golden.engine import GoldenEngine
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.utils import simulate_f2


def nohaplo_ped(seed=0, n_f2=10, n_markers=8, missing=0.3):
    ped = simulate_f2(n_f2=n_f2, n_markers=n_markers, n_founder_pairs=2,
                      missing_rate=missing, error_rate=0.05, seed=seed)
    ped.config = F2_NOHAPLO
    # the reference's !HAPLOTYPING fixtrees never sets founder flags
    # (cnF2freq.cpp:3116-3176)
    for ind in ped.inds[1:]:
        ind.founder = False
    return ped


def test_nohaplo_config_shape():
    cfg = F2_NOHAPLO
    assert cfg.numtypes == 4
    assert cfg.numshifts == 1
    assert cfg.numslots == 7
    assert cfg.parent_slot(0) == 1 and cfg.parent_slot(1) == 4
    assert cfg.deep_walk


def test_nohaplo_emission_golden():
    ped = nohaplo_ped(seed=2)
    cfg = ped.config
    eng = GoldenEngine(ped)
    eng.correction_inference = True
    fb = gather_family(ped, list(ped.dous), 0, ped.num_markers - 1,
                       dtype=np.float64)
    e = np.asarray(nohaplo_emission(fb.map(jnp.asarray), cfg, ci=True,
                                    dtype=jnp.float64))
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        for m in range(ped.num_markers):
            want = eng.emission(ind, m, 0, -1)
            np.testing.assert_allclose(e[b, m, 0], want, atol=1e-12,
                                       err_msg=f"ind {n} marker {m}")


def test_nohaplo_emission_golden_no_ci():
    ped = nohaplo_ped(seed=7, n_f2=6, n_markers=6)
    cfg = ped.config
    eng = GoldenEngine(ped)
    eng.correction_inference = False
    fb = gather_family(ped, list(ped.dous), 0, ped.num_markers - 1,
                       dtype=np.float64)
    e = np.asarray(nohaplo_emission(fb.map(jnp.asarray), cfg, ci=False,
                                    dtype=jnp.float64))
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        for m in range(ped.num_markers):
            np.testing.assert_allclose(e[b, m, 0],
                                       eng.emission(ind, m, 0, -1),
                                       atol=1e-12)


def test_nohaplo_feasibility_golden():
    """okvals: flag2 in {0, 1} pins the focal interpretation
    (fixparents, cnF2freq.cpp:1409-1428)."""
    ped = nohaplo_ped(seed=4, n_f2=8, n_markers=6)
    cfg = ped.config
    eng = GoldenEngine(ped)
    eng.correction_inference = True
    fb = gather_family(ped, list(ped.dous), 0, ped.num_markers - 1,
                       dtype=np.float64)
    ok = np.asarray(nohaplo_feasibility(fb.map(jnp.asarray), cfg,
                                        ci=True, dtype=jnp.float64))
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        for m in range(ped.num_markers):
            for r in range(2):
                want = any(
                    eng.calltrackpossible(ind, m, g, r, 0) > 0
                    for g in range(cfg.numstates))
                assert bool(ok[b, m, r]) == want, (n, m, r)


def test_nohaplo_scan_golden():
    """Full scan vs the golden doit: per-shift factors and the
    state-posterior probes, plus the GENOSPROBE-share genotype pair."""
    ped = nohaplo_ped(seed=5, n_f2=6, n_markers=6)
    cfg = ped.config
    params = RuntimeParams()
    gd = GoldenDoit(ped, params)
    gd.eng.correction_inference = cfg.correction_inference
    acc = gd.scan(collect_probes=True)

    fb = gather_family(ped, list(ped.dous), 0, ped.num_markers - 1,
                       dtype=np.float64)
    dists = jnp.asarray(np.diff(ped.markerposes))
    res = chromosome_scan_nohaplo(fb.map(jnp.asarray), dists, cfg,
                                  params)
    total = np.asarray(res.total)
    pair = np.asarray(res.pair)

    from cnf2freq_tpu.hmm.probes import posterior_weight
    e = np.asarray(nohaplo_emission(fb.map(jnp.asarray), cfg, ci=True,
                                    dtype=jnp.float64))
    W = np.asarray(posterior_weight(_fbres(res), jnp.asarray(total),
                                    jnp.asarray(fb.shiftignore))) * e

    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        np.testing.assert_allclose(total[b], acc.factors[n][0],
                                   atol=1e-9)
        for m in range(ped.num_markers):
            for g in range(cfg.numstates):
                want = acc.probes.get((n, m, g, -1, 0), 0.0)
                np.testing.assert_allclose(W[b, m, 0, g], want,
                                           atol=1e-9,
                                           err_msg=f"{n} {m} {g}")
            # pair from golden sidevals: share of allele mv per side
            want_pair = np.zeros((2, 2))
            for g in range(cfg.numstates):
                val = acc.probes.get((n, m, g, -1, 0), 0.0)
                sv = np.array(
                    [[acc.sidevals.get((n, m, g, side, mv), 0.0)
                      for mv in (1, 2)] for side in range(2)])
                tot = sv.sum(axis=1)
                if val == 0 or (tot == 0).any():
                    continue
                sh = sv / tot[:, None]
                want_pair += val * np.outer(sh[0], sh[1])
            np.testing.assert_allclose(pair[b, m], want_pair, atol=1e-9,
                                       err_msg=f"{n} {m}")


def _fbres(res):
    from cnf2freq_tpu.hmm.forward_backward import FBResult
    return FBResult(fw_pre=res.fw_pre, fw_post=res.fw_pre, bw=res.bw,
                    fw_pre_f=res.fw_pre_f, fw_post_f=res.fw_pre_f,
                    bw_f=res.bw_f)


def test_nohaplo_driver_runs():
    """Driver.iterate on the no-haplotyping family: a pure posterior
    computation — no updates, no flips (reference guard
    cnF2freq.cpp:5554) — producing normalized genotype tables."""
    ped = nohaplo_ped(seed=6, n_f2=12, n_markers=10)
    drv = Driver(ped, dtype=np.float64)
    drv.preprocess()
    md_before = np.stack([ped.by_id(n).markerdata for n in ped.dous])
    hw_before = np.stack([ped.by_id(n).haploweight for n in ped.dous])
    for i in range(2):
        info = drv.iterate(early=(i == 0))
        assert info["hitnnn"] == 0
        assert not info["inverted"]
    md_after = np.stack([ped.by_id(n).markerdata for n in ped.dous])
    hw_after = np.stack([ped.by_id(n).haploweight for n in ped.dous])
    np.testing.assert_array_equal(md_before, md_after)
    np.testing.assert_array_equal(hw_before, hw_after)
    for n in ped.dous:
        tab = drv.pair_tables[n]
        s = tab.sum(axis=(1, 2))
        np.testing.assert_allclose(s, 1.0, atol=1e-8)


def test_nohaplo_homozygous_posteriors():
    """With fully informative founders (1,1)x(2,2), homozygous observed
    F2 genotypes concentrate the pair posterior on the right cell.

    (Het sites are NOT asserted: the reference's !HAPLOTYPING sideval
    chain short-circuits to the first feasible interpretation
    (cnF2freq.cpp:1166), which collapses side 0 onto the stored first
    allele — a quirk of the reference construction the engine is pinned
    to, test_nohaplo_scan_golden.)"""
    ped = nohaplo_ped(seed=9, n_f2=8, n_markers=8, missing=0.0)
    drv = Driver(ped, dtype=np.float64)
    drv.preprocess()
    drv.iterate(early=True)
    hits = total = 0
    for n in ped.dous:
        ind = ped.by_id(n)
        tab = drv.pair_tables[n]
        for m in range(ped.num_markers):
            a, b = ind.markerdata[m]
            if a == 0 or a != b:
                continue
            total += 1
            best = np.unravel_index(np.argmax(tab[m]), (2, 2))
            hits += (best[0] + 1, best[1] + 1) == (a, b) and \
                tab[m][best] > 0.9
    assert total > 0
    assert hits / total > 0.9, (hits, total)


def test_cli_nohaplo_demo(tmp_path):
    """--model nohaplo drives the no-haplotyping engine end-to-end
    through the CLI on the demo dataset."""
    from cnf2freq_tpu.cli import main

    out = tmp_path / "out.txt"
    rc = main(["--mapfile", "/root/reference/demoplantimpute.map",
               "--pedfile", "/root/reference/demoplantimpute.ped",
               "--genfile", "/root/reference/demoplantimpute.gen",
               "--model", "nohaplo", "--count", "1",
               "--output", str(out)])
    assert rc == 0
    assert out.read_text().strip()


def test_nohaplo_line_origin_matches_golden():
    """engine_nohaplo.nohaplo_line_origin == the golden zeropropagate
    gstr walk (trackpossible<false, true> under !HAPLOTYPING:
    genwidth==0 recursion stop, cnF2freq.cpp:1120, counting hook
    cnF2freq.cpp:1264-1266) weighted by per-state probe posteriors."""
    from cnf2freq_tpu.config import MINFACTOR, UNKNOWN, ZP_PROPAGATE
    from cnf2freq_tpu.engine import make_jitted_line_origin

    ped = nohaplo_ped(seed=5, n_f2=8, n_markers=8)
    cfg = ped.config
    eng = GoldenEngine(ped)
    eng.correction_inference = cfg.correction_inference
    M = ped.num_markers
    fb = gather_family(ped, list(ped.dous), 0, M - 1, dtype=np.float64)
    dists = np.diff(ped.markerposes)
    fn = make_jitted_line_origin(cfg, RuntimeParams())
    from cnf2freq_tpu.hmm.transition import rate_matrix
    rm = rate_matrix(cfg, RuntimeParams(), M - 1)
    P = np.asarray(fn(fb.map(jnp.asarray), jnp.asarray(dists),
                      jnp.asarray(rm)))

    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        fbs = {0: eng.fwbw(ind, 0, M - 1, 0)}
        # total over the single shift mode
        for q in range(M):
            acc = np.zeros(3)
            vals = []
            for g in range(cfg.numtypes):
                v = eng.probe(ind, fbs[0], 0, q, g, -1, 0)
                vals.append(v)
            vmax = max(vals)
            for g in range(cfg.numtypes):
                if vals[g] <= MINFACTOR:
                    continue
                val = math.exp(vals[g] - vmax)
                gstr = [0]
                eng.trackpossible(ind, 0, ZP_PROPAGATE, UNKNOWN, 0.0,
                                  q, g * 2, -1, 0,
                                  1 << (cfg.numgen - 1), 0.0, gstr)
                acc[min(gstr[0], 2)] += val
            if acc.sum() > 0:
                acc /= acc.sum()
            np.testing.assert_allclose(P[b, q], acc, atol=1e-9,
                                       err_msg=f"ind {n} marker {q}")


def test_nohaplo_line_origin_driver_route(tmp_path):
    """--lineorigin with --model nohaplo through the CLI: one table row
    per (analysis individual, marker), rows normalised."""
    import os

    from cnf2freq_tpu.cli import main

    rc = main(["--mapfile", "/root/reference/demoplantimpute.map",
               "--pedfile", "/root/reference/demoplantimpute.ped",
               "--genfile", "/root/reference/demoplantimpute.gen",
               "--model", "nohaplo", "--count", "1",
               "--dump", str(tmp_path / "d"),
               "--output", str(tmp_path / "o"),
               "--lineorigin", str(tmp_path / "lo")])
    assert rc == 0
    rows = [r for r in open(tmp_path / "lo") if "\t" in r]
    assert rows
    vals = np.array([[float(v) for v in r.split("\t")] for r in rows])
    sums = vals.sum(axis=1)
    ok = sums > 0
    assert ok.any()
    np.testing.assert_allclose(sums[ok], 1.0, atol=1e-4)
