"""The vectorized _fixparents_round matches the original dict-based
loop (kept here as the executable spec) through the whole correction-
inference fixpoint."""
import math

import numpy as np

from cnf2freq_tpu.config import SEXMARKER, UNKNOWN
from cnf2freq_tpu.driver import Driver, _dosureval
from cnf2freq_tpu.utils import simulate_f2


class DictDriver(Driver):
    """Driver with the original loop-form _fixparents_round."""

    def _fixparents_round(self) -> int:
        ped = self.ped
        ids, ok = self._feasibility()
        M = ped.num_markers
        proposals = {}

        def prop_map(n):
            if n not in proposals:
                proposals[n] = [dict() for _ in range(M)]
            return proposals[n]

        any_corr = 0
        for bi, n in enumerate(ids):
            ind = ped.by_id(n)
            md, msu = ind.markerdata, ind.markersure
            for m in range(M):
                ok0, ok1 = ok[bi, m]
                if not ok0 and not ok1:
                    if md[m, 0] != UNKNOWN or md[m, 1] != UNKNOWN:
                        md[m] = (UNKNOWN, UNKNOWN)
                        msu[m] = (0.0, 0.0)
                    continue
                if ok0 and ok1:
                    continue
                for r in range(2):
                    if not ok[bi, m, r]:
                        continue
                    for k in range(2):
                        if not ind.pars[k]:
                            continue
                        u = (k ^ r) & 1
                        val = int(md[m, u])
                        if val == UNKNOWN:
                            continue
                        probit = msu[m, 0] + msu[m, 1]
                        probit = probit / (1.0 - probit) \
                            if probit < 1.0 else 1e300
                        pmap = prop_map(ind.pars[k])[m]
                        old = pmap.get(val, [0, 1.0])
                        pmap[val] = [old[0] + 1, old[1] * probit]

        for n, permarker in proposals.items():
            ind = ped.by_id(n)
            md, msu = ind.markerdata, ind.markersure
            for m, pmap in enumerate(permarker):
                pmap.pop(UNKNOWN, None)
                known = int(md[m, 0] != UNKNOWN) + int(md[m, 1] != UNKNOWN)
                if known == 2 or not pmap:
                    continue
                if md[m, 0] != UNKNOWN:
                    pmap.setdefault(int(md[m, 0]),
                                    [ind.children, msu[m, 0]])
                if md[m, 1] != UNKNOWN:
                    pmap.setdefault(int(md[m, 1]),
                                    [ind.children, msu[m, 1]])
                vals = sorted(pmap.items())
                if len(vals) == 2:
                    cnt = vals[0][1][0] + vals[1][1][0]
                    md[m] = (vals[0][0], vals[1][0])
                    msu[m] = (_dosureval(cnt, vals[0][1]),
                              _dosureval(cnt, vals[1][1]))
                    any_corr += 1
                elif len(vals) == 1 and known == 0:
                    md[m] = (vals[0][0], UNKNOWN)
                    msu[m] = (_dosureval(vals[0][1][0], vals[0][1]), 0.0)
                    any_corr += 1
        for ind in ped.inds[1:]:
            md = ind.markerdata
            swap = md[:, 0] == SEXMARKER
            if swap.any():
                md[swap] = md[swap][:, ::-1]
        return any_corr


def test_fixparents_vectorized_matches_dict_spec():
    for seed in (0, 3, 7):
        peds = [simulate_f2(n_f2=10, n_markers=9, missing_rate=0.3,
                            error_rate=0.05, seed=seed) for _ in range(2)]
        drvs = [Driver(peds[0]), DictDriver(peds[1])]
        for d in drvs:
            d._correction_inference_loop()
        for a, b in zip(peds[0].inds[1:], peds[1].inds[1:]):
            np.testing.assert_array_equal(a.markerdata, b.markerdata,
                                          err_msg=f"seed {seed} {a.name}")
            np.testing.assert_allclose(a.markersure, b.markersure,
                                       rtol=1e-12, atol=1e-15,
                                       err_msg=f"seed {seed} {a.name}")


def test_fixparents_round_counts_match():
    peds = [simulate_f2(n_f2=8, n_markers=7, missing_rate=0.4,
                        error_rate=0.1, seed=21) for _ in range(2)]
    drvs = [Driver(peds[0]), DictDriver(peds[1])]
    for d in drvs:
        d.ped.count_children(dous_only=False)
        d.ped.count_descendants()
    counts = [d._fixparents_round() for d in drvs]
    assert counts[0] == counts[1]
