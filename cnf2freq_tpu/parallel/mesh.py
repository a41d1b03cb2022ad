"""Device-mesh scaling.

The reference's multi-core story is OpenMP-over-individuals with
threadprivate scratch (cnF2freq.cpp:5294, 403-408) and a vestigial,
non-compiling Boost.MPI path (cnF2freq.cpp:58-60).  Here scaling is one
mechanism at every size: a ``jax.sharding.Mesh`` with the analysis units
(individuals) on a ``data`` axis and a ``state`` axis available for
state-space model parallelism; tensors are placed with NamedSharding and
XLA inserts the ICI/DCN collectives.

Accumulator merges across shards (the reference's per-marker OpenMP locks
and MPI reduce, cnF2freq.cpp:5265-5270, 6245-6255) disappear: the
per-focal statistics come back sharded over ``data`` and the host (or a
psum in the multi-host path) folds them per target individual.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hmm.family import FamilyBatch


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              state: int = 1) -> Mesh:
    devs = np.asarray(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = devs.size
    if data is None:
        data = n // state
    assert data * state == n, (data, state, n)
    return Mesh(devs.reshape(data, state), ("data", "state"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Analysis units ride the data axis; everything else is replicated."""
    return NamedSharding(mesh, P("data"))


def pad_batch(fb: FamilyBatch, multiple: int) -> FamilyBatch:
    """Pad the B axis so it divides the data-axis size; padded units are
    vacant families (exists=False) whose statistics are all zero."""
    B = fb.num_units
    pad = (-B) % multiple
    if pad == 0:
        return fb

    def padb(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    out = fb.map(padb)
    # keep padded rows inert: no shifts allowed except 0, no paths
    out.shiftignore[B:] = 0
    out.flag2ignore[B:] = 0
    return out


def shard_batch(fb: FamilyBatch, mesh: Mesh) -> FamilyBatch:
    sh = batch_sharding(mesh)
    return fb.map(lambda x: jax.device_put(jnp.asarray(x), sh))


def replicate(x, mesh: Mesh):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
