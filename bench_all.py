"""Benchmark all five BASELINE.json configs; writes BENCH_ALL.json.

Configs:
  1. FM + pointwise BCE (Criteo-small)
  2. DCN-v2 (dcn_mix) + SENET, pointwise
  3. xDeepFM CIN + inner-PNN, in-batch pairwise (GAUC loss)
  4. MMoE + PLE + STAR multi-task, joint pointwise+listwise
  5. CAN co-action + DCN-v2, pairwise joint (sharded tables)

Each entry reports steady-state examples/s/chip of the full train step.
``python bench.py`` remains the single-line flagship bench; this script
is the wide sweep.
"""
from __future__ import annotations

import json
import os
import time

BATCH = int(os.environ.get("BENCH_BATCH", 8192))
STEPS = int(os.environ.get("BENCH_STEPS", 50))
WINDOW = int(os.environ.get("BENCH_WINDOW", 5))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))


def bench_one(name, model, cfg, rows_per_field=100_000):
    import jax
    import numpy as np
    from rec_now_tpu.models import FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import SyntheticCriteo, Trainer

    num_devices = len(jax.devices())
    mesh = make_mesh(num_devices)
    fc = FeatureConfig(rows_per_field=rows_per_field, embedding_dim=16)
    trainer = Trainer(model, fc, cfg, mesh=mesh)
    data = SyntheticCriteo(rows_per_field=rows_per_field,
                           num_users=50_000)
    # pipelined windows (transfer/compute overlap), fetch-forced timing
    # -- block_until_ready on donated buffers is unreliable over the
    # axon tunnel (BASELINE.md)
    host_batches = list(data.batches(BATCH, STEPS, seed=1))
    state = trainer.init(jax.random.PRNGKey(0),
                         data.sample(BATCH, np.random.RandomState(0)))
    state, mseq = trainer.train_pipelined(
        state, data.batches(BATCH, WINDOW, seed=2), window=WINDOW)
    float(mseq["loss"][-1])
    # several timed runs: headline = MIN (the tunnel's rate swings 3x
    # between runs — see bench.py); median + spread reported alongside
    # so round-over-round deltas are distinguishable from noise
    dts = []
    for _ in range(max(1, REPEATS)):
        t0 = time.perf_counter()
        state, mseq = trainer.train_pipelined(state, host_batches,
                                              window=WINDOW)
        float(mseq["loss"][-1])
        dts.append((time.perf_counter() - t0) / STEPS)
    dts.sort()
    dt = dts[0]
    return {
        "config": name,
        "examples_per_sec_per_chip": round(BATCH / dt / num_devices, 1),
        "step_ms": round(dt * 1e3, 3),
        "step_ms_median": round(dts[len(dts) // 2] * 1e3, 3),
        "step_ms_spread": round((dts[-1] - dts[0]) * 1e3, 3),
        "runs": len(dts),
        "steps_per_run": STEPS,
        "loss": round(float(mseq["loss"][-1]), 4),
    }


def main():
    from rec_now_tpu.models import (FMModel, DCNv2Model, XDeepFMModel,
                                    MultiTaskModel, CANDCNModel)
    from rec_now_tpu.training import TrainerConfig

    # BENCH_ONLY="3" or "3,5" benches a subset (skips the JSON rewrite)
    only = {int(x) for x in os.environ.get("BENCH_ONLY", "").split(",")
            if x.strip()}

    specs = [
        ("1: FM + pointwise BCE",
         lambda: (FMModel(), TrainerConfig(pointwise_weight=1.0))),
        ("2: DCN-v2 + SENET pointwise",
         lambda: (DCNv2Model(), TrainerConfig(pointwise_weight=1.0))),
        ("3: xDeepFM CIN+iPNN pairwise",
         lambda: (XDeepFMModel(),
                  TrainerConfig(pointwise_weight=1.0, pairwise_weight=1.0,
                                click_occurance_power=-0.5))),
        ("4: MMoE+PLE+STAR multitask + listwise",
         lambda: (MultiTaskModel(num_task=2),
                  TrainerConfig(pointwise_weight=1.0, listwise_weight=0.5,
                                num_tasks=2))),
        ("5: CAN + DCN-v2 pairwise (two sharded tables)",
         lambda: (CANDCNModel(),
                  TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                                can_param_field=8, can_dnn_dims=(16,)))),
    ]
    results = []
    for i, (name, make) in enumerate(specs, start=1):
        if only and i not in only:
            continue
        model, cfg = make()
        # production wire setting (u8 dense): AUC parity with f16
        # proven to 1e-5 (BASELINE.md r3)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, wire_dense_mode=os.environ.get(
                'BENCH_WIRE_DENSE', 'u8'))
        results.append(bench_one(name, model, cfg))

    import jax
    out = {"batch": BATCH, "devices": len(jax.devices()),
           "results": results}
    print(json.dumps(out, indent=2))
    if not only:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_ALL.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
