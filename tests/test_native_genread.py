"""The native .gen parser produces byte-identical results to the Python
reader, including the binomial read-count model and error reporting."""
import os

import numpy as np
import pytest

from cnf2freq_tpu.io.alpha import (load_plantimpute, read_alpha_data,
                                   read_alpha_map, read_alpha_ped)
from cnf2freq_tpu.native import load_genread
from cnf2freq_tpu.pedigree import Pedigree

REF = "/root/reference"
pytestmark = pytest.mark.skipif(load_genread() is None,
                                reason="no native toolchain")


def _load(genfile, use_native):
    ped = Pedigree()
    read_alpha_map(ped, os.path.join(REF, "demoplantimpute.map"))
    read_alpha_ped(ped, os.path.join(REF, "demoplantimpute.ped"))
    read_alpha_data(ped, genfile, use_native=use_native)
    return ped


def _compare(ped_a, ped_b):
    for ia in ped_a.inds[1:]:
        ib = ped_b.getind(ia.name, create=False)
        if ia.markerdata is None:
            assert ib.markerdata is None
            continue
        np.testing.assert_array_equal(ia.markerdata, ib.markerdata,
                                      err_msg=ia.name)
        np.testing.assert_allclose(ia.markersure, ib.markersure,
                                   rtol=1e-12, atol=1e-15,
                                   err_msg=ia.name)
        assert ia.empty == ib.empty


def test_demo_parity():
    gen = os.path.join(REF, "demoplantimpute.gen")
    _compare(_load(gen, False), _load(gen, True))


def test_readcount_and_haplo_parity(tmp_path):
    # read-count tokens exercise the binomial model; a 'haplo' second
    # parent exercises the doubled-haploid sexmarker path
    ped_txt = "\n".join(["A 0 0 0", "B 0 0 0", "H A haplo 2"]) + "\n"
    m = 18
    rng = np.random.default_rng(5)
    rows = []
    for name in ("A", "B", "H"):
        toks = []
        for x in range(m):
            kind = rng.integers(0, 4)
            if kind == 0:
                toks.append(str(rng.integers(0, 3)))
            elif kind == 1:
                toks.append("9")
            elif kind == 2:
                toks.append("0/0")
            else:
                toks.append(f"{rng.integers(0, 9)}/{rng.integers(0, 9)}")
        rows.append(name + " " + " ".join(toks))
    (tmp_path / "t.ped").write_text(ped_txt)
    (tmp_path / "t.gen").write_text("\n".join(rows) + "\n")

    def load(native):
        ped = Pedigree()
        read_alpha_map(ped, os.path.join(REF, "demoplantimpute.map"))
        ped.getind("haplo")
        read_alpha_ped(ped, str(tmp_path / "t.ped"))
        read_alpha_data(ped, str(tmp_path / "t.gen"), use_native=native)
        return ped

    _compare(load(False), load(True))


def test_error_parity(tmp_path):
    bad = tmp_path / "bad.gen"
    bad.write_text("C 0 1 2\n")     # truncated: 3 of 18 columns
    for native in (False, True):
        ped = Pedigree()
        read_alpha_map(ped, os.path.join(REF, "demoplantimpute.map"))
        read_alpha_ped(ped, os.path.join(REF, "demoplantimpute.ped"))
        with pytest.raises(ValueError, match="C"):
            read_alpha_data(ped, str(bad), use_native=native)

    garbage = tmp_path / "garbage.gen"
    garbage.write_text("C " + " ".join(["zz"] * 18) + "\n")
    for native in (False, True):
        ped = Pedigree()
        read_alpha_map(ped, os.path.join(REF, "demoplantimpute.map"))
        read_alpha_ped(ped, os.path.join(REF, "demoplantimpute.ped"))
        with pytest.raises(ValueError):
            read_alpha_data(ped, str(garbage), use_native=native)
