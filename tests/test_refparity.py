"""Reference-binary parity: the compiled reference (refbaseline/) and
Driver(parity=True) must produce the same state trajectory on the
PlantImpute demo.

Requires the locally compiled instrumented reference binary; build it
once with ``python refbaseline/build_ref.py`` plus the WCNF stand-in
(see utils/refparity.build_reference).  Skipped when absent."""

import numpy as np
import pytest

from cnf2freq_tpu.driver import Driver
from cnf2freq_tpu.golden.doit import GoldenDoit
from cnf2freq_tpu.io.alpha import load_plantimpute
from cnf2freq_tpu.utils import refparity as rp

MAP = "/root/reference/demoplantimpute.map"
PED = "/root/reference/demoplantimpute.ped"
GEN = "/root/reference/demoplantimpute.gen"
M = 18

pytestmark = pytest.mark.skipif(
    not rp.have_reference(),
    reason="instrumented reference binary not built (.refbuild)")


def _load():
    return load_plantimpute(MAP, PED, GEN)


def test_trajectory_parity(tmp_path):
    """All 10 demo blocks (initial + 9 doit calls) match the parity
    driver's trajectory to float noise — measured full-run deviation is
    max |d hw| <= 9e-15, |d markersure| <= 3e-10, genotypes/relhaplo
    exact (the BASELINE.json contract asks for 1e-6)."""
    count = 10
    ref_iters = rp.run_reference(MAP, PED, GEN, count, str(tmp_path), M)
    assert len(ref_iters) == count
    ped = _load()
    drv = Driver(ped, parity=True)
    drv.preprocess()
    dev = rp.compare(ref_iters[0], rp.state_from_pedigree(ped))
    assert dev["genotype_mismatches"] == 0
    assert dev["haploweight"] < 1e-12 and dev["markersure"] < 1e-12
    for t in range(1, count):
        drv.iterate(early=False)
        dev = rp.compare(ref_iters[t], rp.state_from_pedigree(ped))
        assert dev["genotype_mismatches"] == 0, (t, dev)
        assert dev["haploweight"] < 1e-9, (t, dev)
        assert dev["markersure"] < 1e-9, (t, dev)
        assert dev["relhaplo"] < 1e-9, (t, dev)


def test_parity_descendants_accumulate():
    """The reference's descendant counts accumulate once per
    correction-inference round (cnF2freq.cpp:3226-3255 sits inside the
    CORRECTIONINFERENCE loop); demo: B=15, E=H=2 (verified against the
    instrumented binary's UHW trace)."""
    ped = _load()
    Driver(ped, parity=True).preprocess()
    assert ped.getind("B").descendants == 15
    assert ped.getind("E").descendants == 2
    assert ped.getind("H").descendants == 2
    ped2 = _load()
    Driver(ped2, parity=False).preprocess()
    assert ped2.getind("B").descendants == 5


def test_scan_accumulators_match_golden_doit():
    """The tensorized merged scan (probe-dedup variants on) reproduces
    the golden full-iteration scan accumulators exactly; the golden spec
    itself is pinned 1:1 against the instrumented reference binary
    (REFTRACE ACC/INF traces)."""
    import jax.numpy as jnp

    from cnf2freq_tpu.hmm.family import gather_family
    from cnf2freq_tpu.hmm.transition import rate_matrix

    ped = _load()
    drv = Driver(ped, parity=True)
    drv.preprocess()
    acc = GoldenDoit(ped).scan()

    ids = [ind.n for ind in ped.inds[1:]]
    ind_index = {n: i for i, n in enumerate(ids)}
    NI = len(ids)
    lut = np.full(max(ids) + 1, NI, dtype=np.int32)
    for n, i in ind_index.items():
        lut[n] = i
    ped.count_children(dous_only=True)
    scan_fn, _ = drv._jitted_scan_merged(NI)
    lo, hi = ped.chromosome_range(0)
    dists = jnp.asarray(np.diff(ped.markerposes[lo:hi]))
    rm = jnp.asarray(rate_matrix(drv.cfg, drv.params, hi - lo - 1,
                                 ped.actrec, lo, dtype=np.float64))
    fb = gather_family(ped, list(ped.dous), lo, hi - 1, dtype=np.float64,
                       mask_mode=drv.mask_mode, parity=True)
    _, hb_p, hc_p, inf_p = scan_fn(fb.map(jnp.asarray), dists,
                                   jnp.asarray(lut), rm)
    hb, hc, inf = np.asarray(hb_p), np.asarray(hc_p), np.asarray(inf_p)

    ghb = np.zeros((NI, M))
    ghc = np.zeros((NI, M))
    ginf = np.zeros((NI, M, 2, 2))
    for k, v in acc.haplobase.items():
        ghb[ind_index[k]] = v
    for k, v in acc.haplocount.items():
        ghc[ind_index[k]] = v
    for k, tab in acc.infprobs.items():
        for m in range(M):
            for side in range(2):
                for mv, val in tab[m][side].items():
                    ginf[ind_index[k], m, side, mv - 1] = val

    np.testing.assert_allclose(hb, ghb, atol=1e-12)
    np.testing.assert_allclose(hc, ghc, atol=1e-12)
    np.testing.assert_allclose(inf, ginf, atol=1e-12)


def test_flip_parity(tmp_path):
    """Flip-engaged trajectory parity: seed a deliberately phase-inverted
    tail (via the deserialize path) on a fully genotyped-F1 cohort — the
    only family shape whose WCNF stage can act (with empty aux members
    the solver always escapes to a masked zero-cost pattern) — and check
    the parity driver reproduces the reference's inversion decision and
    the post-flip trajectory.

    hw is kept off exact 0/1 in the seed: the reference's recommended
    -ffast-math build constant-folds the isfinite guard in its relskew
    clause reweighting (cnF2freq.cpp:5935), so NaN skew terms from locked
    weights become LLONG_MIN clause weights and abort the binary."""
    import numpy as np

    from cnf2freq_tpu.io.outputs import deserialize
    from cnf2freq_tpu.utils.simulate import simulate_plantimpute_files

    work = str(tmp_path)
    mapf, pedf, genf, _ = simulate_plantimpute_files(
        work, n_f2=12, n_markers=24, seed=0, genotyped_f1=4)
    Ms = 25
    count = 4
    ref_iters = rp.run_reference(mapf, pedf, genf, 3, work, Ms)
    state = ref_iters[-1]
    seed = work + "/seed.txt"
    with open(seed, "w") as f:
        for name, st in state.items():
            hw = st.haploweight.copy()
            if name in ("F2_0", "F2_3"):
                hw[10:] = 1.0 - hw[10:]
            hw = np.clip(hw, 1e-3, 1 - 1e-3)
            f.write("%d %s\n" % (st.ind_id, name))
            for m in range(Ms):
                f.write("%.17g\t%d\t%d\t\t%.17g\t%.17g %.17g %.17g\n" %
                        (hw[m], st.markerdata[m, 0], st.markerdata[m, 1],
                         0.0, st.markersure[m, 0], st.markersure[m, 1],
                         st.relhaplo[m]))
    ref2 = rp.run_reference(mapf, pedf, genf, count, work + "/r2", Ms,
                            extra_args=["--deserialize", seed])
    ref_inv = sum(1 for line in open(work + "/r2/ref_stdout.log")
                  if line.startswith("Inv:"))
    assert ref_inv >= 1   # the scenario must actually exercise a flip

    ped = _load_synth(mapf, pedf, genf)
    drv = Driver(ped, parity=True)
    drv.preprocess()
    with open(seed) as f:
        deserialize(ped, f)
    inverted = []
    for t in range(1, count):
        info = drv.iterate(early=False)
        inverted.append(info["inverted"])
        dev = rp.compare(ref2[t], rp.state_from_pedigree(ped))
        assert dev["genotype_mismatches"] == 0, (t, dev)
        assert dev["haploweight"] < 1e-9, (t, dev)
        assert dev["markersure"] < 1e-9, (t, dev)
    assert inverted[0]   # the seeded inversion is detected and applied


def _load_synth(mapf, pedf, genf):
    return load_plantimpute(mapf, pedf, genf)


def test_parity_table_writer_closes_reporter_link(tmp_path):
    """Table-level golden: after 10 parity iterations on the demo, the
    EMITTED genotype table (writer path, io/outputs.py — the
    state->reporter->file link of the BASELINE contract) must equal the
    row-normalised genotype-class collapse of the driver's pair tables
    to the writer's own %.5f precision, and
    its majority calls must agree with /root/reference/demooutput on
    >= 35/36 rows at high confidence.

    The 1e-6 value-level comparison against demooutput itself is
    impossible by construction: that artifact was produced by a
    PRE-HEAD reporter that is commented out in the reference at HEAD
    (cnF2freq.cpp:5553, 5873), and the compiled HEAD reference
    converges to a visibly different state (utils/refparity.py
    docstring documents an example).  The parity target for values is
    the binary's own dump (test_trajectory_parity); this test pins the
    writer on top of it."""
    import io as _io

    from cnf2freq_tpu.io.outputs import write_genotype_table

    ped = _load()
    drv = Driver(ped, parity=True)
    drv.preprocess()
    for _ in range(9):
        drv.iterate(early=False)

    buf = _io.StringIO()
    write_genotype_table(ped, drv.pair_tables, buf)
    text = buf.getvalue()

    # parse the emitted table back
    tables = {}
    cur = None
    for line in text.splitlines():
        parts = line.split()
        if len(parts) == 1 and ":" in parts[0]:
            cur = parts[0]
            tables[cur] = []
        elif cur is not None and len(parts) == 4:
            tables[cur].append([float(x) for x in parts])
    assert set(tables) == {"C:1", "D:1"}

    # (1) writer == genotype-class collapse of the state's pair tables
    for name, key in (("C", "C:1"), ("D", "D:1")):
        n = ped.getind(name).n
        tab = drv.pair_tables[n]
        got = np.asarray(tables[key])
        expect = np.stack([tab[:, 0, 0],
                           tab[:, 0, 1] + tab[:, 1, 0],
                           tab[:, 1, 1],
                           np.zeros(len(tab))], axis=1)
        expect = expect / expect.sum(axis=1, keepdims=True)
        # the writer emits %.5f row-normalised class posteriors
        np.testing.assert_allclose(got, expect, atol=1e-5)

    # (2) majority-call agreement with the historical artifact
    ref_tables = {}
    cur = None
    with open("/root/reference/demooutput") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 1 and ":" in parts[0]:
                cur = parts[0]
                ref_tables[cur] = []
            elif cur is not None and parts:
                ref_tables[cur].append([float(x) for x in parts[:4]])
    agree = total = 0
    for key in ("C:1", "D:1"):
        a = np.asarray(tables[key])
        b = np.asarray(ref_tables[key])
        n = min(len(a), len(b))
        agree += int((a[:n].argmax(1) == b[:n].argmax(1)).sum())
        total += n
    assert total == 36
    assert agree >= 35, (agree, total)
