"""Multi-host (pod-slice) launch helpers.

New scope relative to the reference (clustering lived in Numerous).  On
a TPU pod slice every host runs the same program; JAX's distributed
runtime discovers the slice topology from the TPU environment and
``jax.devices()`` becomes the *global* device list.  Everything in this
framework already operates on global arrays with shardings, so
multi-host training is:

    initialize_multihost()                    # once, before any jax op
    mesh = make_mesh()                        # all global devices
    trainer = Trainer(model, fc, cfg, mesh=mesh)
    ...
    # per-host input: each host feeds its local slice of the batch
    state, metrics = trainer.train_step(state, *trainer.put_local(batch))

The only multi-host-specific concern is data feeding: ``jax.device_put``
of a host-local shard must be assembled into the global array with
``jax.make_array_from_process_local_data``; :func:`put_local_batch`
wraps that.  Checkpointing via training/checkpoint.py is already
multi-host-safe (Orbax coordinates across processes).

This module cannot be exercised in the single-host dev container; its
collective layout is validated by the same shard_map kernels the
virtual 8-device tests cover (process count is transparent to XLA
collectives).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rec_now_tpu.parallel.mesh import DATA_AXIS


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime (no-op if single process).

    On Cloud TPU the arguments auto-discover from the environment; pass
    them explicitly for other fabrics.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process environment (dev container) — fine.
        pass


def put_local_batch(mesh: Mesh, x: np.ndarray,
                    axis_name: str = DATA_AXIS):
    """Assemble per-host data into a global batch-sharded array.

    Args:
        mesh: global device mesh.
        x: this host's local slice of the batch (numpy), leading axis =
            local batch.
        axis_name: mesh axis the global batch is sharded over.

    Returns:
        Global jax.Array of shape (local_batch * num_processes, ...).
    """
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
