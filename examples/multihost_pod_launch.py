"""Pod-slice launch: the production scan-window loop on N hosts.

Run THIS SAME script on every host of a TPU pod slice (e.g. one process
per v5e-16 host via your cluster launcher); JAX discovers the slice
topology from the TPU environment.  Everything below is the
single-host flow plus exactly two changes:

  1. ``initialize_multihost()`` BEFORE any other jax call;
  2. each process feeds only its LOCAL rows — the packed scan-window
     putter (``Trainer.put_packed_auto``) assembles per-process windows
     into the global batch-sharded arrays via
     ``jax.make_array_from_process_local_data``.

The compressed wire, the on-device lax.scan inner loop, the device-
resident corpus-GAUC eval, and Orbax checkpointing all run unchanged
(checkpointing coordinates across processes internally).

Single-process execution of this file is a smoke test (the dev
container runs it in tests/parallel/test_examples.py); the multi-
process leg itself is proven by tests/parallel/test_two_process.py,
which runs this recipe on a REAL 2-process jax.distributed cluster
and asserts loss-sequence equality with a single-process run.

Equivalent CLI:
    python -m rec_now_tpu.train --multihost --model dcnv2 \
        --scan-window 8 --batch-size 8192 --eval-mode device
"""
from rec_now_tpu.parallel.multihost import initialize_multihost

initialize_multihost()                  # MUST precede any backend touch

import jax                                               # noqa: E402
import numpy as np                                       # noqa: E402

from rec_now_tpu.models import DCNv2Model, FeatureConfig  # noqa: E402
from rec_now_tpu.parallel import make_mesh               # noqa: E402
from rec_now_tpu.training import (SyntheticCriteo, Trainer,  # noqa: E402
                                  TrainerConfig)
from rec_now_tpu.training.prefetch import WindowPrefetcher  # noqa: E402


def main(global_batch: int = 8192, steps: int = 40, window: int = 8):
    nproc = jax.process_count()
    local_batch = global_batch // nproc
    mesh = make_mesh()                  # ALL devices of the slice
    fc = FeatureConfig(rows_per_field=100_000, embedding_dim=16)
    trainer = Trainer(
        DCNv2Model(), fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5,
                      wire_dense_mode="u8"),
        mesh=mesh)

    # each process reads/synthesizes DISTINCT local rows (here: a
    # per-process seed shift; in production, per-host file shards)
    data = SyntheticCriteo(rows_per_field=100_000,
                           seed=jax.process_index() * 7919)
    state = trainer.init(jax.random.PRNGKey(0),
                         next(data.batches(local_batch, 1)))

    # the production inner loop: parse+pack+transfer on a worker
    # thread, each window one on-device lax.scan
    with WindowPrefetcher(data.batches(local_batch, steps),
                          trainer.put_packed_auto, window) as wins:
        for dev_win, n_steps in wins:
            state, mseq = trainer.train_many_packed(state, dev_win)

    if jax.process_index() == 0:
        print("final loss", float(mseq["loss"][-1]),
              "steps", int(state.step))

    # device-resident eval: bucketed AUC + corpus GAUC, O(G) fetch
    res = trainer.evaluate_device(
        state, data.batches(local_batch, 8, seed=999), window=window)
    if jax.process_index() == 0:
        print({k: round(float(v), 5) if isinstance(v, float) else v
               for k, v in res.items()})
    return state, res


if __name__ == "__main__":
    main()
