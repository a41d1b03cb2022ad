"""ShapeIT haps ensemble + PLINK fam/bed readers."""

import io
import math

import numpy as np
import pytest

from cnf2freq_tpu.config import UNKNOWN
from cnf2freq_tpu.io.haps import (create_hap_file, read_haps_full,
                                  read_haps_only, read_sample)
from cnf2freq_tpu.io.plink import read_fam_bed, write_fam_bed
from cnf2freq_tpu.pedigree import Pedigree

SAMPLE = """ID_1 ID_2 missing father mother sex plink_pheno
0 0 0 D D B
1 kid1 0 dad mom 1 -9
1 dad 0 0 0 1 -9
1 mom 0 0 0 2 -9
"""

BIM = """1 snp1 0 1000000 A C
1 snp2 0 2000000 A C
1 snp3 0 3500000 G T
"""

# columns: kid1(2), dad(2), mom(2)
HAPS_MAX = """1 snp1 1000000 A C 0 1 0 0 1 1
1 snp2 2000000 A C 0 1 0 0 1 1
1 snp3 3500000 G T 1 0 0 1 0 1
"""

# sample with a phase switch for kid1 between snp2 and snp3
HAPS_S1 = """1 snp1 1000000 A C 0 1 0 0 1 1
1 snp2 2000000 A C 1 0 0 0 1 1
1 snp3 3500000 G T 1 0 0 1 0 1
"""


def build():
    ped = Pedigree()
    samples = read_sample(io.StringIO(SAMPLE))
    read_haps_full(ped, samples, io.StringIO(BIM),
                   [io.StringIO(HAPS_MAX), io.StringIO(HAPS_S1)])
    return ped, samples


def test_read_haps_full_structure():
    ped, samples = build()
    assert samples == [("kid1", "dad", "mom"), ("dad", "0", "0"),
                       ("mom", "0", "0")]
    assert ped.num_markers == 3
    np.testing.assert_allclose(ped.markerposes, [0.0, 1.0, 2.5])
    kid = ped.getind("kid1")
    assert kid.gen == 2
    assert ped.by_id(kid.pars[0]).name == "dad"
    # max-realisation genotypes, 1-based allele indices
    assert tuple(kid.markerdata[0]) == (1, 2)
    assert tuple(ped.getind("mom").markerdata[0]) == (2, 2)
    # founders get ensemble-weighted haploweights; the phase switch in the
    # second haps file leaves kid genotypes matched (kid gen==2 excluded
    # from haploweight updates)
    unit = 1.0 / (2 + 1e-2)
    dad = ped.getind("dad")
    assert dad.haploweight[0] == pytest.approx(unit * 1e-2 * 0.5)
    # kid's sampled haps switch phase around snp2: no coherence folded in
    assert kid.relhaplo[0] == pytest.approx(unit)
    # mom's sample agrees everywhere: full coherence accumulated
    mom = ped.getind("mom")
    assert mom.relhaplo[0] == pytest.approx(2 * unit)


def test_read_haps_only():
    ped = Pedigree()
    ped.markerposes = np.array([0.0, 1.0, 2.5])
    ped.chromstarts = [0, 3]
    a = ped.getind("a")
    b = ped.getind("b")
    c = ped.getind("c")
    ped.freeze()
    ped.dous = [a.n, b.n, c.n]
    for ind in (a, b, c):
        ind.empty = False
        ind.priormarkerdata = np.full((3, 2), UNKNOWN, dtype=np.int32)
        ind.priormarkersure = np.zeros((3, 2))
        ind.has_prior = True
    read_haps_only(ped, [io.StringIO(HAPS_MAX)])
    # alleles resolved from the haps allele columns (digit trick: the
    # reference maps the first character minus '0'; use numeric alleles)
    assert (a.markerdata[0] >= 0).all()


def test_plink_roundtrip(tmp_path):
    ped, _ = build()
    fam = str(tmp_path / "t.fam")
    bed = str(tmp_path / "t.bed")
    write_fam_bed(ped, fam, bed)
    # same data: only het-prior rows can flag changes; all match
    changed = read_fam_bed(ped, fam, bed)
    kid = ped.getind("kid1")
    # flip kid's genotype at marker0 to force a disagreement
    before = kid.priormarkersure[0].copy()
    kid.priormarkerdata[0] = (1, 1)
    changed = read_fam_bed(ped, fam, bed)
    assert changed >= 1
    assert (kid.priormarkersure[0] > before).all()


def test_create_hap_file():
    ped, samples = build()
    kid = ped.getind("kid1")
    kid.haploweight[2] = 0.9     # phase-corrected output flips this row
    out = io.StringIO()
    create_hap_file(ped, samples, io.StringIO(HAPS_MAX), out)
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 3
    last = lines[2].split()
    assert last[5:7] == ["0", "1"]   # kid's pair flipped from 1 0
