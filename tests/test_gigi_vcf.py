"""Gigi map/ped reader (cnF2freq.cpp:7450-7515) and VCF template-rewrite
output (cnF2freq.cpp:7863-7912)."""

import gzip
import io

import numpy as np
import pytest

from cnf2freq_tpu import Pedigree
from cnf2freq_tpu.io import load_gigi, output_vcf
from cnf2freq_tpu.io.gigi import read_gigi_map, read_gigi_ped

GIGI_MAP = """\
1 m1 0.0 0
1 m2 12.5 0
1 m3 30.0 0
"""

GIGI_PED = """\
fam1 A 0 0 1 x 1 1 1 2 2 2
fam1 B 0 0 2 x 1 2 1 1 2 1
fam1 C A B 1 x 1 1 1 2 2 2
"""


def load(tmp_path):
    mp = tmp_path / "g.map"
    pp = tmp_path / "g.ped"
    mp.write_text(GIGI_MAP)
    pp.write_text(GIGI_PED)
    return load_gigi(str(mp), str(pp))


def test_gigi_load(tmp_path):
    ped = load(tmp_path)
    assert ped.num_markers == 3
    assert ped.chromstarts == [0, 3]
    np.testing.assert_allclose(ped.markerposes, [0.0, 12.5, 30.0])
    assert ped.markernames == {"m1": 0, "m2": 1, "m3": 2}
    c = ped.getind("C", create=False)
    a = ped.getind("A", create=False)
    b = ped.getind("B", create=False)
    assert c.pars == (a.n, b.n)
    assert a.sex == 0 and b.sex == 1
    np.testing.assert_array_equal(c.markerdata, [[1, 1], [1, 2], [2, 2]])
    np.testing.assert_array_equal(c.priormarkerdata, c.markerdata)
    assert (c.markersure == 0).all()
    # everyone joins the worklist (cnF2freq.cpp:7476)
    assert len(ped.dous) == 3


VCF_TEMPLATE = """\
##fileformat=VCFv4.2
##source=test
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\tC
1\t100\tm1\t1\t2\t.\tPASS\t.\tGT:DP\t0|0:5\t0|0:9\t0|0:7
1\t200\tm2\t2\t1\t.\tPASS\t.\tGT:DP\t0|0:5\t0|0:9\t0|0:7
1\t300\tm3\t1\t2\t.\tPASS\t.\tGT:DP\t0|0:5\t0|0:9\t0|0:7
"""


def test_vcf_rewrite(tmp_path):
    ped = load(tmp_path)
    c = ped.getind("C", create=False)
    # make C's phase flipped at marker 1
    c.haploweight[:] = 0.1
    c.haploweight[1] = 0.9
    out = io.StringIO()
    output_vcf(ped, io.StringIO(VCF_TEMPLATE), out)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("##fileformat")
    recs = [l.split("\t") for l in lines if not l.startswith("#")]
    # m1 REF=1: A=(1,1) -> 0|0, B=(1,2) -> 0|1, C=(1,1) -> 0|0
    assert recs[0][9].startswith("0|0")
    assert recs[0][10].startswith("0|1")
    # DP passthrough intact
    assert recs[0][9].endswith(":5")
    # m2 REF=2: A=(1,2) -> 1|0; C=(1,2) flipped -> (2,1) -> 0|1
    assert recs[1][9].startswith("1|0")
    assert recs[1][11].startswith("0|1")


def test_vcf_gz_roundtrip(tmp_path):
    ped = load(tmp_path)
    tpl = tmp_path / "t.vcf.gz"
    with gzip.open(tpl, "wt") as f:
        f.write(VCF_TEMPLATE)
    outp = tmp_path / "o.vcf.gz"
    output_vcf(ped, str(tpl), str(outp))
    with gzip.open(outp, "rt") as f:
        text = f.read()
    assert "GT:DP" in text and text.count("\n") == len(
        VCF_TEMPLATE.splitlines())


def test_vcf_unknown_sample_and_marker(tmp_path):
    ped = load(tmp_path)
    bad = VCF_TEMPLATE.replace("\tC", "\tZZZ")
    with pytest.raises(KeyError, match="ZZZ"):
        output_vcf(ped, io.StringIO(bad), io.StringIO())
    bad2 = VCF_TEMPLATE.replace("\tm2\t", "\tnope\t")
    with pytest.raises(KeyError, match="nope"):
        output_vcf(ped, io.StringIO(bad2), io.StringIO())
