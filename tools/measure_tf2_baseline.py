"""Measure the TF2-CPU reference baseline for BASELINE_MEASURED.json.

Runs the *reference library's own code* (imported from /root/reference —
NOT copied) for the flagship composition: DCN-mix + SENET interaction
over embedding lookups with joint pointwise BCE + in-batch pairwise BPR
loss, trained with Adam under tf.function on CPU — the closest
stand-in for the reference's production setting (TF2 layers inside a CPU
PS trainer), measured as steady-state examples/s.

Usage:  python tools/measure_tf2_baseline.py  (writes
BASELINE_MEASURED.json at the repo root)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

BATCH = int(os.environ.get("BENCH_BATCH", 8192))
NUM_SPARSE = 26
NUM_DENSE = 13
ROWS_PER_FIELD = 100_000
DIM = 16
STEPS_WARMUP = 2
STEPS_MEASURE = int(os.environ.get("BENCH_STEPS", 10))


def main():
    import numpy as np
    import tensorflow as tf

    from rec_now.layers.dcn_mix_layer import DCNMixLayer
    from rec_now.layers.senet_layer import SENETLayer
    from rec_now.rec_block.pairwise_loss_from_batch import pairwise_loss

    rng = np.random.RandomState(0)
    table = tf.Variable(
        rng.uniform(-1e-3, 1e-3,
                    (NUM_SPARSE * ROWS_PER_FIELD, DIM)).astype(np.float32))
    offsets = (np.arange(NUM_SPARSE) * ROWS_PER_FIELD).astype(np.int32)

    senet = SENETLayer(reduction_ratio=0.5)
    dcn = DCNMixLayer(dim_sub_space=16, num_layer=2, num_expert=2)
    deep = tf.keras.Sequential([
        tf.keras.layers.Dense(256, activation="relu"),
        tf.keras.layers.Dense(128),
    ])
    head = tf.keras.layers.Dense(1)
    opt = tf.keras.optimizers.Adam(1e-3)

    def make_batch():
        dense = rng.randn(BATCH, NUM_DENSE).astype(np.float32)
        ids = (rng.zipf(1.3, size=(BATCH, NUM_SPARSE)) % ROWS_PER_FIELD
               ).astype(np.int32) + offsets[None, :]
        labels = (rng.rand(BATCH) > 0.7).astype(np.float32)
        # reference _generate_pair_mask compares the group diff against a
        # float literal, so groups must be float
        groups = (rng.zipf(1.3, size=BATCH) % 50_000).astype(np.float32)
        return (tf.constant(dense), tf.constant(ids), tf.constant(labels),
                tf.constant(groups))

    batches = [make_batch() for _ in range(3)]

    @tf.function
    def step(dense, ids, labels, groups):
        with tf.GradientTape() as tape:
            emb = tf.nn.embedding_lookup(table, ids)          # (B, F, D)
            fields = [emb[:, i] for i in range(NUM_SPARSE)]
            flat = senet(fields)                              # (B, F*D)
            x = tf.concat([flat, dense], axis=-1)
            cross = dcn(x)
            d = deep(x)
            logits = tf.squeeze(head(tf.concat([cross, d], -1)), -1)
            pw = tf.reduce_mean(
                tf.nn.sigmoid_cross_entropy_with_logits(
                    labels=labels, logits=logits))
            pl = pairwise_loss(logits, labels, groups,
                               click_occurance_power=-0.5)
            loss = pw + 0.5 * pl
        variables = (tape.watched_variables())
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    for i in range(STEPS_WARMUP):
        step(*batches[i % len(batches)])
    t0 = time.perf_counter()
    for i in range(STEPS_MEASURE):
        loss = step(*batches[i % len(batches)])
    dt = (time.perf_counter() - t0) / STEPS_MEASURE
    eps = BATCH / dt

    out = {
        "tf2_cpu_examples_per_sec": round(eps, 1),
        "batch": BATCH,
        "step_ms": round(dt * 1e3, 2),
        "composition": "reference DCNMixLayer+SENETLayer+pairwise_loss, "
                       "Adam, tf.function, CPU",
        "host": "bench container CPU (2 vCPU)",
        "final_loss": float(loss.numpy()),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
