"""Update-statistic contractions vs the golden reference loops."""

import math

import numpy as np
import pytest

from cnf2freq_tpu.config import HAPLOS, MINFACTOR, RuntimeParams
from cnf2freq_tpu.golden import GoldenEngine
from cnf2freq_tpu.hmm import emission_all, gather_family
from cnf2freq_tpu.hmm.emission import build_blocks, assemble_e_all
from cnf2freq_tpu.hmm.forward_backward import (combined_loglik,
                                               forward_backward)
from cnf2freq_tpu.hmm.probes import (haplo_stats, posterior_weight,
                                     turn_scores)

QS = [0, 3, 9, 16]


@pytest.fixture(scope="module")
def setup(demo_pedigree):
    ped = demo_pedigree
    ped.count_descendants()
    for ind in ped.inds[1:]:
        ped.fixtrees(ind.n)
    eng = GoldenEngine(ped)
    fbatch = gather_family(ped, ped.dous, 0, ped.num_markers - 1,
                           mask_mode="reference")
    blocks = build_blocks(fbatch, ped.config)
    e = assemble_e_all(blocks, ped.config)
    dists = np.diff(ped.markerposes)
    fbres = forward_backward(e, dists, ped.config, RuntimeParams())
    total = combined_loglik(fbres, fbatch.shiftignore)
    return ped, eng, fbatch, blocks, fbres, total


def golden_haplo(eng, ped, ind, q, total, fbs, shiftignore, flag2ignore):
    """Reference probe loop: accumulate updatehaplo hooks at one marker."""
    cfg = ped.config
    eng.hooks.haplos.clear()
    for s, fb in fbs.items():
        for g in range(cfg.numtypes):
            for f2 in range(cfg.numpaths):
                if f2 & flag2ignore:
                    continue
                v = eng.probe(ind, fb, 0, q, g, f2, s)
                if v <= MINFACTOR:
                    continue
                val = math.exp(v - total)
                ok = eng.calltrackpossible(ind, q, g, f2, s)
                if ok:
                    eng.calltrackpossible(ind, q, g, f2, s, update=HAPLOS,
                                          updateval=val)
    return dict(eng.hooks.haplos)


def test_haplo_stats_match_golden(setup):
    ped, eng, fbatch, blocks, fbres, total = setup
    W = posterior_weight(fbres, total, fbatch.shiftignore)
    hs = haplo_stats(W, blocks, fbatch, ped.config)
    b12 = np.asarray(hs.b12)
    mask = np.asarray(hs.mask)
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        shiftignore, flag2ignore = ped.fixtrees(n)
        fbs = {s: eng.fwbw(ind, 0, 17, s) for s in range(8)
               if not (s & shiftignore)}
        slots = ped.family_slots(n)
        for q in QS:
            gold = golden_haplo(eng, ped, ind, q, float(total[b]), fbs,
                                shiftignore, flag2ignore)
            # the reference accumulates per *individual*: an individual in
            # several slots (shared grandparents) sums its slot stats
            per_ind = {}
            per_mask = {}
            for slot, sid in enumerate(slots):
                if not sid:
                    continue
                if mask[b, q, slot]:
                    acc = per_ind.setdefault(sid, np.zeros(2))
                    acc += b12[b, q, slot]
                    per_mask[sid] = True
            for sid in set(slots) - {0}:
                expect = gold.get(sid)
                if sid not in per_mask:
                    assert expect is None, (ind.name, q, sid)
                    continue
                np.testing.assert_allclose(
                    per_ind[sid], expect, rtol=1e-8, atol=1e-12,
                    err_msg=f"{ind.name} q={q} ind={sid}")


def test_turn_scores_match_golden(setup):
    ped, eng, fbatch, blocks, fbres, total = setup
    ts = turn_scores(fbres, fbatch, ped.config)
    raw = np.asarray(ts.raw)
    weight = np.asarray(ts.weight)
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        shiftignore, flag2ignore = ped.fixtrees(n)
        fbs = {s: eng.fwbw(ind, 0, 17, s) for s in range(8)}
        for q in QS:
            for t in [0, 1, 2, 8, 54, 64, 70, 127]:
                if t & (flag2ignore >> 1):
                    continue
                vals = {}
                for s in range(8):
                    if s & shiftignore:
                        continue
                    v = eng.turn_probe(ind, fbs, 0, q, t, s)
                    vals[s] = v
                    np.testing.assert_allclose(
                        raw[b, q, t, s], v, rtol=1e-8,
                        err_msg=f"{ind.name} q={q} t={t} s={s}")
                mx = max(vals.values())
                lse = mx + math.log(sum(math.exp(v - mx)
                                        for v in vals.values()))
                base = {}
                for s in range(8):
                    if s & shiftignore:
                        continue
                    base[s] = eng.turn_probe(ind, fbs, 0, q, 0, s)
                mx0 = max(base.values())
                lse0 = mx0 + math.log(sum(math.exp(v - mx0)
                                          for v in base.values()))
                expect = (lse - lse0) * ind.descendants
                np.testing.assert_allclose(weight[b, q, t], expect,
                                           rtol=1e-7, atol=1e-9)


def golden_infprobs(eng, ped, ind, q, total, fbs, shiftignore, flag2ignore):
    """Reference loop: GENOSPROBE sidevals + GENOS accumulation + pair
    posterior (doit, cnF2freq.cpp:5517-5568)."""
    from cnf2freq_tpu.config import GENOS, UNKNOWN
    cfg = ped.config
    eng.hooks.infprobs.clear()
    pair = np.zeros((2, 2))
    for s, fb in fbs.items():
        for g in range(cfg.numtypes):
            for f2 in range(cfg.numpaths):
                if f2 & flag2ignore:
                    continue
                v = eng.probe(ind, fb, 0, q, g, f2, s)
                if v <= MINFACTOR:
                    continue
                val = math.exp(v - total)
                sv = np.zeros((2, 2))
                for side in range(2):
                    for mvi, mv in enumerate((1, 2)):
                        sv[side, mvi] = eng.trackpossible(
                            ind, 0, 0, mv, 0.0, q, g * 2 + side, f2 ^ side,
                            s, 4)
                for side in range(2):
                    tot = sv[side].sum()
                    if tot <= 0:
                        continue
                    for mvi, mv in enumerate((1, 2)):
                        upd = val * sv[side, mvi] / tot
                        if upd:
                            eng.trackpossible(ind, GENOS, 0, mv, 0.0, q,
                                              g * 2 + side, f2 ^ side, s, 4,
                                              updateval=upd)
                if sv[0].sum() > 0 and sv[1].sum() > 0:
                    pair += val * np.outer(sv[0] / sv[0].sum(),
                                           sv[1] / sv[1].sum())
    return dict(eng.hooks.infprobs), pair


def test_infprob_stats_match_golden(setup):
    from cnf2freq_tpu.hmm.probes import infprob_stats
    ped, eng, fbatch, blocks, fbres, total = setup
    W = posterior_weight(fbres, total, fbatch.shiftignore)
    st = infprob_stats(W, blocks, fbatch, ped.config)
    accum = np.asarray(st.accum)
    pair = np.asarray(st.pair)
    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        shiftignore, flag2ignore = ped.fixtrees(n)
        fbs = {s: eng.fwbw(ind, 0, 17, s) for s in range(8)
               if not (s & shiftignore)}
        slots = ped.family_slots(n)
        for q in [3, 9]:
            gold, gpair = golden_infprobs(eng, ped, ind, q, float(total[b]),
                                          fbs, shiftignore, flag2ignore)
            np.testing.assert_allclose(pair[b, q], gpair, rtol=1e-8,
                                       atol=1e-12,
                                       err_msg=f"{ind.name} q={q} pair")
            per_ind = {}
            for slot, sid in enumerate(slots):
                if not sid:
                    continue
                acc = per_ind.setdefault(sid, np.zeros((2, 2)))
                acc += accum[b, q, slot]
            for sid, got in per_ind.items():
                for aslot in range(2):
                    for mvi, mv in enumerate((1, 2)):
                        expect = gold.get((sid, aslot, mv), 0.0)
                        np.testing.assert_allclose(
                            got[aslot, mvi], expect, rtol=1e-8, atol=1e-12,
                            err_msg=f"{ind.name} q={q} ind={sid} "
                                    f"aslot={aslot} mv={mv}")


def test_recombination_expectations(setup):
    """Posterior switch probabilities: uniform-ish data gives the prior
    recombination fraction; the [B, M-1, typebits] tensor is a proper
    probability."""
    from cnf2freq_tpu.hmm.probes import recombination_expectations
    from cnf2freq_tpu.hmm.transition import (interval_recomb,
                                             transition_eigenvalues)
    ped, eng, fbatch, blocks, fbres, total = setup
    from cnf2freq_tpu.hmm.emission import assemble_e_all
    e = assemble_e_all(blocks, ped.config)
    dists = np.diff(ped.markerposes)
    lam = transition_eigenvalues(
        ped.config, interval_recomb(ped.config, RuntimeParams(), dists))
    p = np.asarray(recombination_expectations(fbres, e, ped.config, lam))
    assert p.shape == (3, 17, 6)
    assert (p >= -1e-12).all() and (p <= 1.0 + 1e-12).all()
    # where the data is uninformative the posterior equals the prior
    # recombination fraction of the interval
    import math
    prior = 0.5 * (1 - math.exp(-10.0 / 50.0))
    assert abs(p[:, 8, :].mean() - prior) < prior  # same order


def test_turn_weights_fast_matches_reference(setup):
    """The WHT-based fast path equals turn_scores' weights wherever they
    are finite (the MINFACTOR sentinel may differ in magnitude only)."""
    from cnf2freq_tpu.hmm.probes import turn_weights_fast
    ped, eng, fbatch, blocks, fbres, total = setup
    ts = turn_scores(fbres, fbatch, ped.config)
    fast = np.asarray(turn_weights_fast(fbres, fbatch, ped.config))
    ref = np.asarray(ts.weight)
    finite = (ref > -1e10) & (fast > -1e10)
    assert finite.mean() > 0.5
    np.testing.assert_allclose(fast[finite], ref[finite], rtol=1e-7,
                               atol=1e-9)
    # sentinel agreement: both paths flag the same infeasible turns
    np.testing.assert_array_equal(ref > -1e10, fast > -1e10)


def test_line_origin_matches_golden(setup):
    """line_origin_posterior == the golden zeropropagate gstr probe loop
    (trackpossible<false, true>, cnF2freq.cpp:5512, 1264-1266) weighted
    by per-(state, path, shift) posterior mass."""
    from cnf2freq_tpu.config import UNKNOWN, ZP_PROPAGATE
    from cnf2freq_tpu.hmm.probes import line_origin_posterior

    ped, eng, fbatch, blocks, fbres, total = setup
    cfg = ped.config
    W = posterior_weight(fbres, total, fbatch.shiftignore)
    P = np.asarray(line_origin_posterior(W, blocks, fbatch, cfg))

    for b, n in enumerate(ped.dous):
        ind = ped.by_id(n)
        shiftignore, flag2ignore = ped.fixtrees(n)
        fbs = {s: eng.fwbw(ind, 0, 17, s) for s in range(8)
               if not (s & shiftignore)}
        for q in QS:
            acc = np.zeros(3)
            for s, fb in fbs.items():
                for g in range(cfg.numtypes):
                    for f2 in range(cfg.numpaths):
                        if f2 & flag2ignore:
                            continue
                        v = eng.probe(ind, fb, 0, q, g, f2, s)
                        if v <= MINFACTOR:
                            continue
                        val = math.exp(v - float(total[b]))
                        gstr = [0]
                        eng.trackpossible(
                            ind, 0, ZP_PROPAGATE, UNKNOWN, 0.0, q, g * 2,
                            f2, s, 1 << (cfg.numgen - 1), 0.0, gstr)
                        acc[min(gstr[0], 2)] += val
            if acc.sum() > 0:
                acc /= acc.sum()
            np.testing.assert_allclose(
                P[b, q], acc, atol=1e-9,
                err_msg=f"ind {n} marker {q}")
