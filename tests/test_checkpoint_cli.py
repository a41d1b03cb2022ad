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

    # "resume": a fresh process restores the checkpoint and keeps going
    out2 = str(tmp_path / "out2")
    dump2 = str(tmp_path / "dump2")
    assert main(DEMO + ["--count", "2", "--checkpoint", ck,
                        "--dump", dump2, "--output", out2]) == 0
    err = capsys.readouterr().err
    assert "resumed from checkpoint" in err
    assert open(ck).read() != first     # state advanced

    vals = np.array([[float(v) for v in r.split("\t")]
                     for r in open(out2) if "\t" in r])
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=2e-5)
