"""Eval throughput: exact host sweep vs device-resident sweep.

VERDICT r2 #9 / r3 #3: quantify eval ex/s for a held-out sweep and
name the bottleneck.  Times ``Trainer.evaluate`` (host-side exact
AUC/GAUC: streams logits over the tunnel, numpy sort) against
``Trainer.evaluate_device`` (scanned packed windows, on-device bucketed
AUC + CORPUS GAUC via per-group score histograms, one O(G*K) fetch) on
the flagship config — the corpus gauc delta vs the exact host value is
the r3 #3 done-criterion number.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_eval.py
Env: EVAL_BATCHES (default 64), BATCH (8192), WINDOW (8)
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import SyntheticCriteo, Trainer, TrainerConfig

    B = int(os.environ.get("BATCH", 8192))
    n_eval = int(os.environ.get("EVAL_BATCHES", 64))
    window = int(os.environ.get("WINDOW", 8))

    mesh = make_mesh(len(jax.devices()))
    fc = FeatureConfig(num_dense=13, num_sparse=26,
                       rows_per_field=100_000, embedding_dim=16)
    trainer = Trainer(
        DCNv2Model(deep_dims=(256, 128), dcn_sub_dim=16, dcn_layers=2,
                   dcn_experts=2),
        fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5),
        mesh=mesh)
    data = SyntheticCriteo(rows_per_field=100_000, num_users=50_000)
    state = trainer.init(jax.random.PRNGKey(0),
                         data.sample(B, np.random.RandomState(0)))
    # a short training burst so eval scores a non-degenerate model
    state, m = trainer.train_pipelined(
        state, data.batches(B, 10, seed=2), window=5)
    float(m["loss"][-1])

    held_out = list(data.batches(B, n_eval, seed=77))

    # warm both paths (compiles) on a 2-window slice
    # corpus-slot space sized for the 50k-user synthetic stream: dict
    # mapping stays exact (no overflow) below slots - slots/8
    slots, kbuck = 65536, 256
    trainer.evaluate(state, held_out[:2])
    trainer.evaluate_device(state, held_out[:2 * window][:window],
                            window=window, num_group_slots=slots,
                            group_buckets=kbuck)

    t0 = time.perf_counter()
    exact = trainer.evaluate(state, held_out)
    t_exact = time.perf_counter() - t0

    t0 = time.perf_counter()
    fast = trainer.evaluate_device(state, held_out, window=window,
                                   num_group_slots=slots,
                                   group_buckets=kbuck)
    t_fast = time.perf_counter() - t0

    n = B * n_eval
    out = {
        "eval_batches": n_eval, "batch": B, "examples": n,
        "exact_s": round(t_exact, 3),
        "exact_ex_per_s": round(n / t_exact, 1),
        "device_s": round(t_fast, 3),
        "device_ex_per_s": round(n / t_fast, 1),
        "speedup": round(t_exact / t_fast, 2),
        "auc_exact": round(exact["auc"], 5),
        "auc_device": round(fast["auc"], 5),
        "auc_delta": round(abs(exact["auc"] - fast["auc"]), 6),
        "gauc_exact_corpus": round(exact["gauc"], 5),
        "gauc_device_corpus": round(fast["gauc"], 5),
        "gauc_delta": round(abs(exact["gauc"] - fast["gauc"]), 6),
        "gauc_groups_exact": exact["num_groups"],
        "gauc_groups_device": fast.get("gauc_groups"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
