"""Cross-shard accumulator merging.

The reference merges per-thread statistics into shared parent accumulators
under per-marker OpenMP locks (cnF2freq.cpp:5265-5270, 5893-5902) and, in
its vestigial MPI path, with elementwise vector reduce
(cnF2freq.cpp:6245-6255).  Sharded over a device mesh the same merge is a
segment-sum from family slots onto target individuals followed by a psum
over the data axis — deterministic, lock-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hmm.family import FamilyBatch


def merge_slot_stats(values: jnp.ndarray, slot_ind: jnp.ndarray,
                     num_individuals: int, axis_name: str = None
                     ) -> jnp.ndarray:
    """Fold [B, M, slot, ...] per-family statistics onto per-individual
    accumulators [num_individuals, M, ...].

    slot_ind: [B, slot] global individual ids (0 = vacant).  Inside
    shard_map pass axis_name to psum the partial sums across the data
    axis; under plain jit/NamedSharding XLA handles the reduction of the
    segment-sum automatically."""
    B, M, S = values.shape[:3]
    tail = values.shape[3:]
    # [B, M, S, ...] -> [B, S, M, ...] so rows align with slot_ind[B, S]
    flat = jnp.moveaxis(values, 2, 1).reshape(B * S, M, *tail)
    ids = slot_ind.reshape(B * S)
    out = jax.ops.segment_sum(flat, ids, num_segments=num_individuals + 1)
    out = out[1:]  # drop the vacant-slot bucket
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def sharded_scan_and_merge(fb: FamilyBatch, dists, cfg, params, mesh: Mesh,
                           num_individuals: int):
    """One sharded chromosome scan plus on-device accumulator merge: the
    multi-chip equivalent of the scatter stage of Driver.iterate."""
    from ..engine import chromosome_scan

    @jax.jit
    def step(batch, d):
        res = chromosome_scan(batch, d, cfg, params)
        masked = jnp.where(res.haplo_mask[..., None], res.haplo_b12, 0.0)
        hb12 = merge_slot_stats(masked, batch.slot_ind, num_individuals)
        inf = merge_slot_stats(res.inf_accum, batch.slot_ind,
                               num_individuals)
        return res.total, hb12, inf

    with mesh:
        return step(fb, jax.device_put(jnp.asarray(dists),
                                       NamedSharding(mesh, P())))
