"""Batched accumulator scatter matches the loop-form reference semantics.

The loop forms below are the original Driver implementations of
movehaplos/moveinfprobs/coherence scatter and calcskewterms
(cnF2freq.cpp:3577-3616, 4469-4531) — kept here as the executable spec.
"""
import numpy as np

from cnf2freq_tpu.updates.scatter import (_MOVEHAPLO_TINY, apply_skewterms,
                                          scatter_coherence, scatter_haplos,
                                          scatter_infprobs)


def _unique_members(slot_row):
    members = {}
    for slot, sid in enumerate(slot_row):
        if sid:
            members.setdefault(sid, []).append(slot)
    return members


def _rand_family(rng, B, NI, M, dup_prob=0.3):
    """slot_ind rows with optional duplicate members and vacancies."""
    slot_ind = np.zeros((B, 7), dtype=np.int64)
    for b in range(B):
        ids = rng.choice(np.arange(1, NI + 1), size=7, replace=False)
        slot_ind[b] = ids
        if rng.random() < dup_prob:      # duplicate a member into slot 5
            slot_ind[b, 5] = slot_ind[b, 1]
        if rng.random() < dup_prob:      # vacant slot
            slot_ind[b, 6] = 0
    ind_index = {n: n - 1 for n in range(1, NI + 1)}
    return slot_ind, ind_index


def test_scatter_haplos_matches_loop():
    rng = np.random.default_rng(0)
    B, NI, M, lo, Mtot = 11, 30, 6, 2, 10
    slot_ind, ind_index = _rand_family(rng, B, NI, M)
    b12 = rng.uniform(0, 1, (B, M, 7, 2))
    b12[rng.random((B, M, 7)) < 0.2] = 0.0     # some zero-mass slots
    mask = rng.random((B, M, 7)) < 0.7
    hw = rng.uniform(0, 1, (B, 7, M))
    hw[rng.random((B, 7, M)) < 0.2] = 0.0      # some locked weights
    desc = rng.integers(1, 5, B).astype(np.float64)

    ref_base = np.zeros((NI, Mtot))
    ref_count = np.zeros((NI, Mtot))
    for b in range(B):
        for sid, slots in _unique_members(slot_ind[b]).items():
            i = ind_index[sid]
            tot = np.zeros((M, 2))
            used = np.zeros(M, dtype=bool)
            for s in slots:
                tot += np.where(mask[b, :, s, None], b12[b, :, s], 0.0)
                used |= mask[b, :, s] & (b12[b, :, s].sum(axis=-1) > 0)
            unlocked = np.abs(hw[b, slots[0]] - 0.5) < 0.5 - 1e-12
            take = used & unlocked
            b1 = tot[:, 0] + _MOVEHAPLO_TINY
            b2 = tot[:, 1] + _MOVEHAPLO_TINY
            sl = slice(lo, lo + M)
            ref_base[i, sl] += np.where(take, b1 / (b1 + b2) * desc[b], 0.0)
            ref_count[i, sl] += np.where(take, desc[b], 0.0)

    got_base = np.zeros((NI, Mtot))
    got_count = np.zeros((NI, Mtot))
    scatter_haplos(slot_ind, hw, desc, lo, b12, mask, got_base, got_count,
                   ind_index)
    np.testing.assert_allclose(got_base, ref_base, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(got_count, ref_count, rtol=1e-12, atol=0)


def test_scatter_infprobs_matches_loop():
    rng = np.random.default_rng(1)
    B, NI, M, lo, Mtot = 9, 25, 5, 1, 8
    slot_ind, ind_index = _rand_family(rng, B, NI, M)
    accum = rng.uniform(0, 1, (B, M, 7, 2, 2))
    accum[rng.random((B, M)) < 0.2] = 0.0      # zero focal mass rows
    desc = rng.integers(1, 5, B).astype(np.float64)

    ref = np.zeros((NI, Mtot, 2, 2))
    for b in range(B):
        fsum = accum[b, :, 0, 0, :].sum(axis=-1)
        inv = np.where(fsum > 0, 1.0 / np.where(fsum > 0, fsum, 1.0), 0.0)
        for sid, slots in _unique_members(slot_ind[b]).items():
            i = ind_index[sid]
            tot = accum[b, :, slots].sum(axis=0) if len(slots) > 1 \
                else accum[b, :, slots[0]]
            norm = 2.0 / (2 ** len(slots)) * desc[b]
            ref[i, lo:lo + M] += tot * inv[:, None, None] * norm

    got = np.zeros((NI, Mtot, 2, 2))
    scatter_infprobs(slot_ind, desc, lo, accum, got, ind_index)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-15)


def test_scatter_coherence_matches_loop():
    rng = np.random.default_rng(2)
    B, NI, M, lo, Mtot = 7, 20, 4, 3, 9
    slot_ind, ind_index = _rand_family(rng, B, NI, M)
    coh = rng.uniform(0, 1, (B, M, 7))
    desc = rng.integers(1, 5, B).astype(np.float64)

    ref_num = np.zeros((NI, Mtot))
    ref_den = np.zeros((NI, Mtot))
    sl = slice(lo, lo + M)
    for b in range(B):
        for sid, slots in _unique_members(slot_ind[b]).items():
            i = ind_index[sid]
            for s in slots:
                ref_num[i, sl] += desc[b] * coh[b, :, s]
                ref_den[i, sl] += desc[b]

    got_num = np.zeros((NI, Mtot))
    got_den = np.zeros((NI, Mtot))
    scatter_coherence(slot_ind, desc, lo, coh, got_num, got_den, ind_index)
    np.testing.assert_allclose(got_num, ref_num, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(got_den, ref_den, rtol=1e-12, atol=0)


def test_apply_skewterms_matches_loop():
    rng = np.random.default_rng(3)
    B, Mc, T = 8, 7, 128
    hw = rng.uniform(1e-3, 1 - 1e-3, (B, Mc))
    rh = rng.uniform(1e-3, 1 - 1e-3, (B, Mc))
    hb = rng.uniform(0, 3, (B, Mc))
    hc = rng.uniform(0, 3, (B, Mc))
    hc[rng.random((B, Mc)) < 0.3] = 0.0
    desc = rng.integers(1, 5, B).astype(np.float64)
    tsel = (np.arange(T) & 64) > 0
    weights = rng.normal(size=(B, Mc, T))

    Mi = Mc - 1

    def slog(x):
        return np.log(np.maximum(x, 1e-323))

    ref = weights.copy()
    for b in range(B):
        skew = np.zeros(Mi)
        for ix in range(2):
            w_ = hw[b, 1 - ix:Mi + 1 - ix]
            wo = hw[b, ix:Mi + ix]
            lrh, l1rh = slog(rh[b, :Mi]), slog(1 - rh[b, :Mi])
            lw, l1w = slog(w_), slog(1 - w_)
            lo_, l1o = slog(wo), slog(1 - wo)
            val = wo
            now = (w_ * val * (lrh + lw + lo_) +
                   (1 - w_) * (1 - val) * (lrh + l1w + l1o) +
                   w_ * (1 - val) * (l1rh + lw + l1o) +
                   (1 - w_) * val * (l1rh + l1w + lo_))
            then = ((1 - w_) * val * (lrh + l1w + lo_) +
                    w_ * (1 - val) * (lrh + lw + l1o) +
                    (1 - w_) * (1 - val) * (l1rh + l1w + l1o) +
                    w_ * val * (l1rh + lw + lo_))
            skew -= then - now
            hcx = hc[b, ix:Mi + ix]
            hbx = hb[b, ix:Mi + ix]
            gonext = np.where(hcx > 0, hbx / np.maximum(hcx, 1e-300), 0.0)
            skew += np.where((hcx > 0) & ((gonext - w_) * (w_ - 0.5) < 0),
                             25000.0, 0.0)
        w = skew * 0.5
        w = np.where(np.isfinite(w), w, np.sign(w) * 25000.0)
        w = np.clip(w, -25000.0, 25000.0)
        ref[b, :Mi, :][:, tsel] -= (w * desc[b])[:, None]

    got = apply_skewterms(hw, rh, hb, hc, desc, weights.copy(), tsel)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_device_merge_matches_host_scatter():
    """merge_haplos/merge_infprobs (device segment-sum) == host scatter."""
    import jax.numpy as jnp

    from cnf2freq_tpu.parallel.collective import (merge_haplos,
                                                  merge_infprobs)

    rng = np.random.default_rng(5)
    B, NI, M = 10, 28, 6
    slot_ind, ind_index = _rand_family(rng, B, NI, M)
    b12 = rng.uniform(0, 1, (B, M, 7, 2))
    b12[rng.random((B, M, 7)) < 0.2] = 0.0
    mask = rng.random((B, M, 7)) < 0.7
    hw = rng.uniform(0, 1, (B, 7, M))
    hw[rng.random((B, 7, M)) < 0.2] = 1.0
    desc = rng.integers(1, 5, B).astype(np.float64)
    accum = rng.uniform(0, 1, (B, M, 7, 2, 2))
    accum[rng.random((B, M)) < 0.2] = 0.0

    ref_base = np.zeros((NI, M))
    ref_count = np.zeros((NI, M))
    scatter_haplos(slot_ind, hw, desc, 0, b12, mask, ref_base, ref_count,
                   ind_index)
    ref_inf = np.zeros((NI, M, 2, 2))
    scatter_infprobs(slot_ind, desc, 0, accum, ref_inf, ind_index)

    lut = np.full(int(slot_ind.max()) + 1, NI, dtype=np.int32)
    for n, i in ind_index.items():
        lut[n] = i
    hb, hc = merge_haplos(jnp.asarray(b12), jnp.asarray(mask),
                          jnp.asarray(hw), jnp.asarray(slot_ind),
                          jnp.asarray(desc), jnp.asarray(lut), NI)
    inf = merge_infprobs(jnp.asarray(accum), jnp.asarray(slot_ind),
                         jnp.asarray(desc), jnp.asarray(lut), NI)
    np.testing.assert_allclose(np.asarray(hb), ref_base, rtol=1e-12,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(hc), ref_count, rtol=1e-12,
                               atol=0)
    np.testing.assert_allclose(np.asarray(inf), ref_inf, rtol=1e-12,
                               atol=1e-15)


def test_device_merge_sharded_psum():
    """The merge composes with shard_map + psum over a data mesh: each
    shard segment-sums its local families, psum completes the merge —
    the multi-chip replacement for the reference's per-marker locks and
    MPI reduce (cnF2freq.cpp:5265-5270, 6245-6255)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from cnf2freq_tpu.parallel.collective import merge_haplos

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")

    rng = np.random.default_rng(6)
    B, NI, M = 8, 28, 5
    slot_ind, ind_index = _rand_family(rng, B, NI, M)
    b12 = rng.uniform(0, 1, (B, M, 7, 2))
    mask = rng.random((B, M, 7)) < 0.8
    hw = rng.uniform(0, 1, (B, 7, M))
    desc = rng.integers(1, 5, B).astype(np.float64)
    lut = np.full(int(slot_ind.max()) + 1, NI, dtype=np.int32)
    for n, i in ind_index.items():
        lut[n] = i

    ref_hb, ref_hc = merge_haplos(jnp.asarray(b12), jnp.asarray(mask),
                                  jnp.asarray(hw), jnp.asarray(slot_ind),
                                  jnp.asarray(desc), jnp.asarray(lut), NI)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    @jax.jit
    @partial_shard_map(mesh)
    def sharded(b12, mask, hw, slot_ind, desc, lut):
        return merge_haplos(b12, mask, hw, slot_ind, desc, lut, NI,
                            axis_name="data")

    hb, hc = sharded(jnp.asarray(b12), jnp.asarray(mask), jnp.asarray(hw),
                     jnp.asarray(slot_ind), jnp.asarray(desc),
                     jnp.asarray(lut))
    np.testing.assert_allclose(np.asarray(hb), np.asarray(ref_hb),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(hc), np.asarray(ref_hc),
                               rtol=1e-12, atol=0)


def partial_shard_map(mesh):
    """shard_map decorator: batch args on the data axis, replicated lut,
    fully-replicated outputs."""
    import jax
    from jax.sharding import PartitionSpec as P

    def deco(fn):
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data"),
                      P("data"), P()),
            out_specs=(P(), P()), check_vma=False)

    return deco


def test_pattern_scores_batched_matches_single():
    from cnf2freq_tpu.updates.phaseflip import (FamilyClauses,
                                                pattern_scores,
                                                pattern_scores_batched)
    rng = np.random.default_rng(4)
    T, M, Bg = 128, 5, 6
    exists = (True, False, True, True, False, False, True)
    members = (11, 0, 12, 13, 0, 14, 15)
    f2i = 0b0010010
    allowed_mask = (np.arange(T) & (f2i >> 1)) == 0
    weights = rng.normal(size=(Bg, M, T))

    S_b, varbits = pattern_scores_batched(exists, allowed_mask, weights)
    allowed = np.arange(T)[allowed_mask]
    for b in range(Bg):
        fc = FamilyClauses(focal=15, members=members, exists=exists,
                           turn_allowed=allowed, weights=weights[b])
        S, _, varlist = pattern_scores(fc)
        np.testing.assert_allclose(S_b[b], S, rtol=1e-12, atol=1e-12)
        assert varlist == [members[bit] for bit in varbits]
