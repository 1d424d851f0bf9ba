"""Benchmark: flagship DCN-v2 + in-batch pairwise training throughput.

Measures steady-state examples/s/chip of the full training step (sharded
embedding lookup -> SENET + DCN-mix + deep tower -> joint pointwise +
pairwise loss -> dense Adam + sparse Adagrad update) on the available
device (TPU under the driver; CPU if forced), matching BASELINE.json's
metric "examples/s/chip (DCN-v2 + in-batch pairwise, Criteo)".

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "examples/s/chip",
     "vs_baseline": N}

``vs_baseline`` is the ratio against the TF2-CPU reference throughput
recorded in BASELINE_MEASURED.json (measured once with the reference
library's own layers/losses; target is >= 3.0 per BASELINE.json).  If no
measured baseline exists, vs_baseline is null.
"""
from __future__ import annotations

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", 8192))
STEPS_WARMUP = 3
STEPS_MEASURE = int(os.environ.get("BENCH_STEPS", 50))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))


def main():
    import jax
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

    num_devices = len(jax.devices())
    mesh = make_mesh(num_devices)
    fc = FeatureConfig(num_dense=13, num_sparse=26,
                       rows_per_field=100_000, embedding_dim=16)
    trainer = Trainer(
        DCNv2Model(deep_dims=(256, 128), dcn_sub_dim=16, dcn_layers=2,
                   dcn_experts=2),
        fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5,
                      # u8 dense wire (72 B/example): held-out AUC
                      # matches f16 to 1e-5 (BASELINE.md r3), so the
                      # bench measures the production wire setting
                      wire_dense_mode=os.environ.get(
                          "BENCH_WIRE_DENSE", "u8"),
                      # id wire stays bit-packed: the hot8 codec's
                      # 10.5 B/ex saving measured NET-NEGATIVE on this
                      # rig (decode-side per-element gathers ~1.9 ms >
                      # wire saving ~1.3 ms; BASELINE.md r5)
                      wire_id_mode=os.environ.get(
                          "BENCH_WIRE_IDS", "packed")),
        mesh=mesh)
    data = SyntheticCriteo(rows_per_field=100_000, num_users=50_000)

    # production inner loop: windows of WINDOW steps each run as ONE
    # on-device lax.scan while the next window's compressed batch
    # (training/wire.py: bit-packed ids + f16 dense, 2x fewer wire
    # bytes) transfers in flight — steady state = max(compute, wire),
    # not their sum.  Timing includes host packing + transfer + compute
    # and forces a scalar fetch at the end, which the remote runtime
    # cannot elide (block_until_ready on donated buffers is unreliable
    # over the TPU tunnel).
    window = int(os.environ.get("BENCH_WINDOW", 5))
    # round the measured steps up to a whole number of windows: a ragged
    # final window would recompile the scan inside the timed region
    steps_measure = -(-STEPS_MEASURE // window) * window
    host_batches = list(data.batches(BATCH, steps_measure, seed=1))
    state = trainer.init(jax.random.PRNGKey(0), data.sample(
        BATCH, __import__("numpy").random.RandomState(0)))

    # warm up with the same window length so there is exactly one compile
    state, metrics_seq = trainer.train_pipelined(
        state, data.batches(BATCH, window, seed=2), window=window)
    float(metrics_seq["loss"][-1])

    # several independent timed runs: the headline is the MIN per-step
    # time.  The host<->device link on this rig is a shared network
    # tunnel whose rate swings 3x between runs (probe_pipeline2:
    # 15->56 ms/step across minutes); min-of-repeats estimates the
    # framework's steady state net of tunnel weather, while median and
    # spread are reported alongside so the noise is visible, not hidden.
    dts = []
    for _ in range(max(1, REPEATS)):
        t0 = time.perf_counter()
        state, metrics_seq = trainer.train_pipelined(state, host_batches,
                                                     window=window)
        float(metrics_seq["loss"][-1])   # forces completion
        dts.append((time.perf_counter() - t0) / steps_measure)
    dts.sort()
    dt = dts[0]
    median = dts[len(dts) // 2]
    spread = dts[-1] - dts[0]
    metrics = {k: v[-1] for k, v in metrics_seq.items()}

    examples_per_sec = BATCH / dt
    per_chip = examples_per_sec / num_devices

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_eps = ref.get("tf2_cpu_examples_per_sec")
        if ref_eps:
            vs_baseline = per_chip / ref_eps

    print(json.dumps({
        "metric": "examples/s/chip (DCN-v2 + in-batch pairwise, Criteo)",
        "value": round(per_chip, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "step_ms_min": round(dt * 1e3, 2),
        "step_ms_median": round(median * 1e3, 2),
        "step_ms_spread": round(spread * 1e3, 2),
    }))
    print(f"# devices={num_devices} batch={BATCH} step={dt*1e3:.2f}ms "
          f"(median {median*1e3:.2f}ms, spread {spread*1e3:.2f}ms over "
          f"{len(dts)} runs x {steps_measure} steps) "
          f"loss={float(metrics['loss']):.4f} "
          f"pairwise={float(metrics.get('pairwise', float('nan'))):.4f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
