"""Multi-host (pod-slice) launch helpers.

New scope relative to the reference (clustering lived in Numerous).  On
a TPU pod slice every host runs the same program; JAX's distributed
runtime discovers the slice topology from the TPU environment and
``jax.devices()`` becomes the *global* device list.  Everything in this
framework already operates on global arrays with shardings, so
multi-host training is (this recipe is executed verbatim by
tests/parallel/test_multihost.py::TestDocstringRecipe):

    initialize_multihost()                    # once, before any jax op
    mesh = make_mesh()                        # all global devices
    trainer = Trainer(model, fc, cfg, mesh=mesh)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    # per-host input: each host feeds its local slice of the batch
    state, metrics = trainer.train_step(state, *trainer.put_local(batch))

The only multi-host-specific concern is data feeding: ``jax.device_put``
of a host-local shard must be assembled into the global array with
``jax.make_array_from_process_local_data``; :func:`put_local_batch`
wraps that, ``Trainer.put_local`` applies it to every batch field, and
``python -m rec_now_tpu.train --multihost`` is the CLI entry (each
process reads/synthesizes its local rows and feeds ``put_local``).
Checkpointing via training/checkpoint.py is already multi-host-safe
(Orbax coordinates across processes).

Real multi-process execution IS exercised in CI:
tests/parallel/test_two_process.py spawns two genuine processes that
form a ``jax.distributed`` CPU cluster (4 forced host devices each ->
8 global devices, gloo cross-process collectives) and runs the full
recipe — init, ``put_local`` steps, the packed scan-window loop
(``put_packed_window_local``), Orbax save/restore — asserting the loss
sequence matches an identical single-process run on the same global
data.  The mocked-topology test in tests/parallel/test_multihost.py
remains as the fast-path contract check; ``put_local`` is additionally
bit-identical to ``put`` at process_count==1 (tested).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rec_now_tpu.parallel.mesh import DATA_AXIS


def _distributed_is_initialized() -> bool:
    """Whether ``jax.distributed.initialize`` has already run.

    Checked WITHOUT touching any backend API: ``jax.process_count()``
    (or any jax op) initializes the local backend as a side effect,
    after which ``jax.distributed.initialize`` raises — the exact
    failure mode this helper must avoid on a real pod.
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is None:  # jax >= 0.4.x keeps it in _src
        from jax._src import distributed as _dist
        state = _dist.global_state
    return getattr(state, "client", None) is not None or \
        getattr(state, "coordinator_address", None) is not None


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize JAX's distributed runtime (idempotent).

    MUST run before any other jax call (anything that touches a
    backend — ``jax.devices()``, ``jax.process_count()``, even a
    ``jnp`` constant — locks in the single-process local backend and
    makes distributed init ineffective).  On Cloud TPU the arguments
    auto-discover from the environment; pass them explicitly for other
    fabrics.
    """
    if _distributed_is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process environment (dev container) — fine.
        pass


def put_local_batch(mesh: Mesh, x: np.ndarray,
                    axis_name: str = DATA_AXIS,
                    batch_axis: int = 0):
    """Assemble per-host data into a global batch-sharded array.

    Args:
        mesh: global device mesh.
        x: this host's local slice of the batch (numpy); axis
            ``batch_axis`` is the locally-sliced one.
        axis_name: mesh axis the global batch is sharded over.
        batch_axis: which axis of ``x`` is the batch axis (0 for plain
            batches; 1 for packed scan windows laid out (S, B, ...)).

    Returns:
        Global jax.Array whose ``batch_axis`` is local * num_processes.
    """
    spec = P(*([None] * batch_axis), axis_name,
             *([None] * (x.ndim - batch_axis - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))
