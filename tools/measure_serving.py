"""Serving latency/throughput on the real chip (VERDICT r3 #8).

Measures the jitted scorer at request batch 1 / 256 / 8192, via the
raw f32 front end and the compressed request wire (WireScorer, f16 and
u8), flagship DCN-v2 composition (V=2.6M, D=16).

Timing is fetch-forced (float(sum(out))) — block_until_ready on the
axon tunnel returns early (BASELINE.md caveat).  Medians over REPS
calls after a warmup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_serving.py
"""
import json
import os
import time

import numpy as np


import jax
import jax.numpy as jnp

from rec_now_tpu.models import DCNv2Model, FeatureConfig
from rec_now_tpu.serving import WireScorer, build_scorer
from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

REPS = int(os.environ.get("SERVE_REPS", 15))
# largest first: over the slow-compile tunnel a timeout then still
# leaves the production-relevant row measured (rows print as they land)
BATCHES = tuple(int(x) for x in os.environ.get(
    "SERVE_BATCHES", "8192,256,1").split(","))


def median_ms(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(out))          # fetch-forced completion
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.percentile(ts, 90))


def main():
    fc = FeatureConfig(rows_per_field=100_000, embedding_dim=16)
    trainer = Trainer(DCNv2Model(), fc, TrainerConfig())
    data = SyntheticCriteo(rows_per_field=100_000, seed=0)
    state = trainer.init(jax.random.PRNGKey(0),
                         next(data.batches(max(BATCHES), 1)))
    raw = build_scorer(trainer)
    wires = {m: WireScorer(trainer, dense_mode=m) for m in ("f16", "u8")}

    rows = []
    for b in BATCHES:
        batch = data.sample(b, np.random.RandomState(b))
        dense_d = jnp.asarray(batch.dense)
        ids_d = jnp.asarray(batch.sparse_ids)
        # raw path, device-resident inputs (lower bound: no wire)
        def record(path, ms, p90):
            row = {"B": b, "path": path, "ms_median": round(ms, 3),
                   "ms_p90": round(p90, 3),
                   "ex_per_s": round(b / ms * 1e3)}
            rows.append(row)
            print(row, flush=True)

        float(jnp.sum(raw(state, dense_d, ids_d)))       # compile
        ms, p90 = median_ms(lambda: raw(state, dense_d, ids_d))
        record("raw(device-resident)", ms, p90)
        # raw path, host inputs each call (raw wire cost included)
        ms, p90 = median_ms(
            lambda: raw(state, jnp.asarray(batch.dense),
                        jnp.asarray(batch.sparse_ids)))
        record("raw(host-fed 156 B/ex)", ms, p90)
        for mode, ws in wires.items():
            float(jnp.sum(ws(state, batch.dense, batch.sparse_ids)))
            ms, p90 = median_ms(
                lambda: ws(state, batch.dense, batch.sparse_ids))
            per_ex = (13 * (2 if mode == "f16" else 1)
                      + ws.wire.words * 4)
            record(f"wire-{mode} ({per_ex} B/ex)", ms, p90)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
