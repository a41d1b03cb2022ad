"""CLI checkpoint/resume: dumps atomically per iteration, restores on
startup, and a killed-and-resumed run continues without error."""
import os

import numpy as np

from cnf2freq_tpu.cli import main

DEMO = ["--mapfile", "/root/reference/demoplantimpute.map",
        "--pedfile", "/root/reference/demoplantimpute.ped",
        "--genfile", "/root/reference/demoplantimpute.gen"]


def test_checkpoint_roundtrip(tmp_path, capsys):
    ck = str(tmp_path / "state.ck")
    dump = str(tmp_path / "dump1")
    out1 = str(tmp_path / "out1")
    assert main(DEMO + ["--count", "2", "--checkpoint", ck,
                        "--dump", dump, "--output", out1]) == 0
    assert os.path.exists(ck)
    assert not os.path.exists(ck + ".tmp")
    first = open(ck).read()

    # the header carries the driver state + completed-iteration count
    assert first.startswith("# driverstate ")
    capsys.readouterr()     # drain the first run's output

    # "resume": a fresh process restores the checkpoint (including the
    # iteration counter: --count is the TOTAL budget, so this runs
    # iterations 2 and 3 only) and keeps going
    out2 = str(tmp_path / "out2")
    dump2 = str(tmp_path / "dump2")
    assert main(DEMO + ["--count", "4", "--checkpoint", ck,
                        "--dump", dump2, "--output", out2]) == 0
    err = capsys.readouterr().err
    assert "resumed from checkpoint" in err
    assert "(2 iterations done)" in err
    assert "iter 0:" not in err and "iter 2:" in err and "iter 3:" in err
    assert open(ck).read() != first     # state advanced

    vals = np.array([[float(v) for v in r.split("\t")]
                     for r in open(out2) if "\t" in r])
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=2e-5)


GIGI_MAP = """\
1 m1 0.0 0
1 m2 12.5 0
1 m3 30.0 0
"""

GIGI_PED = """\
fam1 A 0 0 1 x 1 1 1 2 2 2
fam1 B 0 0 2 x 1 2 1 1 2 1
fam1 C A B 1 x 1 1 0 0 2 2
"""


def test_cli_merlin_route(tmp_path):
    """--merlinmap/--merlinped route end to end through the driver."""
    rc = main(["--merlinmap", "/root/reference/halfsibdemo.map",
               "--merlinped", "/root/reference/halfsibdemo.ped",
               "--count", "2", "--dump", str(tmp_path / "d"),
               "--output", str(tmp_path / "o")])
    assert rc == 0
    assert os.path.getsize(tmp_path / "o") > 0


def test_cli_gigi_route(tmp_path):
    """--gigimapfile/--gigipedfile route, with line-origin output."""
    mp, pp = tmp_path / "g.map", tmp_path / "g.ped"
    mp.write_text(GIGI_MAP)
    pp.write_text(GIGI_PED)
    lo = tmp_path / "lo"
    rc = main(["--gigimapfile", str(mp), "--gigipedfile", str(pp),
               "--count", "2", "--dump", str(tmp_path / "d"),
               "--output", str(tmp_path / "o"), "--lineorigin", str(lo)])
    assert rc == 0
    rows = [r for r in open(lo) if "\t" in r]
    assert len(rows) == 3 * 3          # 3 analysis inds x 3 markers
    vals = np.array([[float(v) for v in r.split("\t")] for r in rows])
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-4)


def test_cli_markerblock_route(tmp_path):
    """--markerblock routes the demo through the blocked scan."""
    out = str(tmp_path / "o")
    rc = main(DEMO + ["--count", "2", "--markerblock", "8",
                      "--dump", str(tmp_path / "d"), "--output", out])
    assert rc == 0
    vals = np.array([[float(v) for v in r.split("\t")]
                     for r in open(out) if "\t" in r])
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=2e-5)
