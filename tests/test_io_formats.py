"""Readers beyond PlantImpute: ccoeff halfsib demo files, MERLIN, masking."""

import io

import numpy as np
import pytest

from cnf2freq_tpu.config import UNKNOWN
from cnf2freq_tpu.io.ccoeff import read_marker_info, read_ped
from cnf2freq_tpu.io.masking import (clear_unprotected,
                                     read_protected_markers)
from cnf2freq_tpu.io.merlin import (read_merlin_map, read_merlin_ped,
                                    write_merlin_ped)
from cnf2freq_tpu.pedigree import Pedigree


def test_halfsib_demo_files():
    """The checked-in halfsibdemo fixture pair is MERLIN-style input."""
    ped = Pedigree()
    read_merlin_map(ped, "/root/reference/halfsibdemo.map")
    assert ped.num_chromosomes >= 1
    assert ped.num_markers > 0
    assert np.all(np.diff(ped.markerposes[:ped.chromstarts[1]]) >= 0)
    read_merlin_ped(ped, "/root/reference/halfsibdemo.ped")
    assert len(ped.dous) > 0
    o1 = ped.getind("o1")
    assert ped.by_id(o1.pars[0]).name == "sire"
    assert tuple(o1.markerdata[2]) == (1, 1)


def test_ccoeff_synthetic():
    """readmarkerinfo/readped semantics on a synthetic two-sex map."""
    ped = Pedigree()
    info = io.StringIO(
        "1 3\n"          # one chromosome, three markers total
        "3 1 2 3\n"      # chromosome 1 holds markers 1..3
        "1 0 5 5\n"      # male map: interval distances
        "2 0 15 5\n")    # female map
    read_marker_info(ped, info)
    assert ped.chromstarts == [0, 3]
    np.testing.assert_allclose(ped.markerposes, [0.0, 10.0, 15.0])
    pedsrc = io.StringIO(
        "2\n"
        "1 0 0 1 1\n2 0 0 2 1\n3 0 0 1 2\n4 0 0 2 2\n"
        "5 1 2 1 -1\n6 3 4 2 -1\n"
        "7 5 6 1 -1\n8 5 6 2 -1\n")
    read_ped(ped, pedsrc)
    assert len(ped.dous) == 2
    f2 = ped.by_id(ped.dous[0])
    assert f2.gen == 2


def test_merlin_roundtrip():
    ped = Pedigree()
    read_merlin_map(ped, io.StringIO(
        "1 m1 0.0 100\n1 m2 5.0 200\n2 m3 0.0 300\n"))
    assert ped.chromstarts == [0, 2, 3]
    read_merlin_ped(ped, io.StringIO(
        "1 dad 0 0 1 0  1 1 1 2 2 2\n"
        "1 mom 0 0 2 0  1 2 1 1 1 2\n"
        "1 kid dad mom 1 0  1 1 1 2 2 2\n"))
    kid = ped.getind("kid")
    assert ped.dous == [kid.n]
    assert tuple(kid.markerdata[1]) == (1, 2)
    buf = io.StringIO()
    write_merlin_ped(ped, buf)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 3
    assert lines[2].split("\t")[1] == str(kid.n)


def test_clear_unprotected():
    ped = Pedigree()
    ped.markerposes = np.array([0.0, 10.0, 20.0, 30.0])
    ped.chromstarts = [0, 4]
    a = ped.getind("a")
    b = ped.getind("b")
    ped.freeze()
    for ind in (a, b):
        ind.markerdata[:] = 1
        ind.markersure[:] = 0.01
    ped.dous = [a.n, b.n]
    prot = read_protected_markers(io.StringIO(
        "map marker positions\n20.0\n"))
    clear_unprotected(ped, {b.n}, prot)
    # markers before position 20 cleared for a, protected marker kept
    assert (a.markerdata[:2] == UNKNOWN).all()
    assert (a.markerdata[2] == 1).all()
    # b was protected entirely
    assert (b.markerdata == 1).all()
