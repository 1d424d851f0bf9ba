"""Device-mesh helpers for the data-parallel x table-sharded layout.

New scope relative to the reference (no distributed runtime of any kind,
SURVEY.md §2.4): the TPU-native parallelism plan is

* one mesh axis ``"data"`` spanning all chips (a v5e-16 is 16 chips):
  the batch is sharded over it (pure DP for the interaction towers) and
  the embedding tables are *row*-sharded over the same axis (model
  parallelism for the memory-dominant state).  Dense tower params are
  replicated and their grads ``psum`` over ICI.
* lookups cross the axis with collectives inside ``shard_map``
  (rec_now_tpu/embedding/sharded.py).

This keeps all collectives on ICI with a single axis — the layout the
scaling book calls "1D data parallel + sharded embeddings", which is the
right one while dense params fit per-chip.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a 1-D mesh over (the first ``num_devices``) local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 1,
                  axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh; rest replicated."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (dense tower params)."""
    return NamedSharding(mesh, P())
