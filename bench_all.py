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

Timed runs are INTERLEAVED round-robin across the configs (VERDICT r3
#4): the axon tunnel's rate swings 2-4x on minute scales, so benching
each config in its own contiguous block let one bad weather window
invert the cross-config ordering (r3's committed artifact had trivial
FM slower than DCN-v2).  Round-robin spreads every config's samples
over the same weather; a spread gate then re-runs rounds (up to
EXTRA_ROUNDS) while any config's (max-min) exceeds SPREAD_FRAC of its
best, and the per-config best/median come from the pooled samples.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

BATCH = int(os.environ.get("BENCH_BATCH", 8192))
STEPS = int(os.environ.get("BENCH_STEPS", 50))
WINDOW = int(os.environ.get("BENCH_WINDOW", 5))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
EXTRA_ROUNDS = int(os.environ.get("BENCH_EXTRA_ROUNDS", 4))
SPREAD_FRAC = float(os.environ.get("BENCH_SPREAD_FRAC", 0.15))


class ConfigBench:
    """One config's trainer + data, prepared once, timed many times."""

    def __init__(self, name, model, cfg, rows_per_field=100_000):
        import jax
        import numpy as np
        from rec_now_tpu.models import FeatureConfig
        from rec_now_tpu.parallel import make_mesh
        from rec_now_tpu.training import SyntheticCriteo, Trainer

        self.name = name
        self.num_devices = len(jax.devices())
        mesh = make_mesh(self.num_devices)
        fc = FeatureConfig(rows_per_field=rows_per_field,
                           embedding_dim=16)
        self.trainer = Trainer(model, fc, cfg, mesh=mesh)
        data = SyntheticCriteo(rows_per_field=rows_per_field,
                               num_users=50_000)
        self.host_batches = list(data.batches(BATCH, STEPS, seed=1))
        self.state = self.trainer.init(
            jax.random.PRNGKey(0), data.sample(BATCH,
                                               np.random.RandomState(0)))
        self.warm_batches = list(data.batches(BATCH, WINDOW, seed=2))
        self.dts = []
        self.loss = float("nan")

    def warmup(self):
        self.state, mseq = self.trainer.train_pipelined(
            self.state, self.warm_batches, window=WINDOW)
        float(mseq["loss"][-1])

    def timed_run(self):
        # fetch-forced timing — block_until_ready on donated buffers is
        # unreliable over the axon tunnel (BASELINE.md)
        t0 = time.perf_counter()
        self.state, mseq = self.trainer.train_pipelined(
            self.state, self.host_batches, window=WINDOW)
        self.loss = float(mseq["loss"][-1])
        self.dts.append((time.perf_counter() - t0) / STEPS)

    def _best_k(self):
        """The REPEATS fastest samples — the reporting window.

        The gate must be able to CONVERGE: (max - min) over the pooled
        samples is monotonically nondecreasing, so one bad weather
        window would force every extra round no matter how clean they
        are.  Judging the best-REPEATS window instead means extra clean
        rounds displace the outlier and the gate closes.
        """
        return sorted(self.dts)[:max(1, REPEATS)]

    def spread_ok(self):
        k = self._best_k()
        return (k[-1] - k[0]) <= SPREAD_FRAC * k[0]

    def result(self):
        k = self._best_k()
        dt = k[0]
        return {
            "config": self.name,
            "examples_per_sec_per_chip":
                round(BATCH / dt / self.num_devices, 1),
            "step_ms": round(dt * 1e3, 3),
            "step_ms_median": round(k[len(k) // 2] * 1e3, 3),
            "step_ms_spread": round((k[-1] - k[0]) * 1e3, 3),
            "spread_metric": f"best-{len(k)} of {len(self.dts)} runs",
            "runs": len(self.dts),
            "steps_per_run": STEPS,
            "loss": round(self.loss, 4),
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
    benches = []
    for i, (name, make) in enumerate(specs, start=1):
        if only and i not in only:
            continue
        model, cfg = make()
        # production wire setting (u8 dense): AUC parity with f16
        # proven to 1e-5 (BASELINE.md r3)
        cfg = dataclasses.replace(
            cfg, wire_dense_mode=os.environ.get(
                'BENCH_WIRE_DENSE', 'u8'),
            wire_id_mode=os.environ.get('BENCH_WIRE_IDS', 'packed'))
        b = ConfigBench(name, model, cfg)
        b.warmup()
        print(f"warm: {name}", flush=True)
        benches.append(b)

    # interleaved rounds: every config samples every weather window
    for r in range(max(1, REPEATS)):
        for b in benches:
            b.timed_run()
        print(f"round {r + 1}: " + "  ".join(
            f"[{b.name.split(':')[0]}] {b.dts[-1] * 1e3:.1f}ms"
            for b in benches), flush=True)
    # spread gate: more full rounds while any config is noisy (keeps
    # the samples interleaved rather than re-running one config alone)
    extra = 0
    while (extra < EXTRA_ROUNDS
           and any(not b.spread_ok() for b in benches)):
        extra += 1
        for b in benches:
            b.timed_run()
        print(f"extra round {extra} (spread gate): " + "  ".join(
            f"[{b.name.split(':')[0]}] {b.dts[-1] * 1e3:.1f}ms"
            for b in benches), flush=True)

    import jax
    results = [b.result() for b in benches]
    out = {"batch": BATCH, "devices": len(jax.devices()),
           "interleaved": True, "extra_rounds": extra,
           "results": results}
    print(json.dumps(out, indent=2))
    if not only:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_ALL.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
