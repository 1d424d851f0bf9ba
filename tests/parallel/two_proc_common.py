"""Shared fixture config for the 2-process pod-slice test.

Imported by BOTH the worker processes (real jax.distributed cluster)
and the in-process single-process reference run, so the model, trainer
config and the global data stream are definitionally identical.
"""
from __future__ import annotations

import numpy as np

GLOBAL_B = 32          # 4 rows per device on the 8-device global mesh
N_STEPS = 3            # per-step put_local path
N_PACKED = 4           # packed scan-window path
WINDOW = 2
SEED = 11


def make_trainer_parts():
    """(model, feature_config, trainer_config) — small but exercises the
    sharded table (routed exchange at n=8), shard_map pairwise loss and
    the dense tower psum."""
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.training import TrainerConfig
    fc = FeatureConfig(rows_per_field=512, embedding_dim=8)
    model = DCNv2Model(deep_dims=(16,), dcn_sub_dim=4)
    cfg = TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                        sparse_route_mode="routed")
    return model, fc, cfg


def make_global_batches(extra: int = 0):
    """The deterministic GLOBAL batch stream both runs consume."""
    from rec_now_tpu.training import SyntheticCriteo
    data = SyntheticCriteo(rows_per_field=512, num_users=40, seed=SEED)
    rng = np.random.RandomState(SEED + 1)
    return [data.sample(GLOBAL_B, rng)
            for _ in range(N_STEPS + N_PACKED + extra)]


def slice_batch(batch, pid: int, nproc: int):
    """A process's local row slice of a global batch."""
    b = batch.labels.shape[0] // nproc
    return type(batch)(*[np.asarray(f)[pid * b:(pid + 1) * b]
                         for f in batch])
