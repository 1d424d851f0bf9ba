"""AUC/GAUC parity: TF2 reference composition vs rec_now_tpu.

Trains the same DCN-v2 + SENET + joint pointwise/pairwise composition on
the *same* synthetic Criteo stream (identical seeds, identical batches)
twice — once with the reference library's TF layers/losses on CPU, once
with rec_now_tpu — and evaluates both on the same held-out batches with
the same StreamingGAUC metric.  BASELINE.json's parity bar: AUC/GAUC
match within run-to-run variance.

Writes AUC_PARITY.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

STEPS = int(os.environ.get("PARITY_STEPS", 400))
BATCH = int(os.environ.get("PARITY_BATCH", 2048))
ROWS = 2000
DIM = 16
EVAL_BATCHES = 8


def get_data():
    from rec_now_tpu.training import SyntheticCriteo
    return SyntheticCriteo(rows_per_field=ROWS, num_users=2000, seed=0)


def run_tf(train_batches, eval_batches):
    import numpy as np
    import tensorflow as tf
    from rec_now.layers.dcn_mix_layer import DCNMixLayer
    from rec_now.layers.senet_layer import SENETLayer
    from rec_now.rec_block.pairwise_loss_from_batch import pairwise_loss
    from rec_now_tpu.training.metrics import StreamingGAUC

    num_sparse = 26
    rng = np.random.RandomState(0)
    table = tf.Variable(rng.uniform(-1e-3, 1e-3,
                                    (num_sparse * ROWS, DIM)
                                    ).astype(np.float32))
    offsets = (np.arange(num_sparse) * ROWS).astype(np.int32)
    senet = SENETLayer(reduction_ratio=0.5)
    dcn = DCNMixLayer(dim_sub_space=16, num_layer=2, num_expert=2)
    deep = tf.keras.Sequential([
        tf.keras.layers.Dense(256, activation="relu"),
        tf.keras.layers.Dense(128)])
    head = tf.keras.layers.Dense(1)
    # match the default rec_now_tpu optimizer split: Adam(1e-3) on the
    # dense towers, Adagrad(0.05, acc0=0.1) on the embedding table
    # (ours is ROW-wise adagrad — one accumulator per row, mean over
    # dim — vs TF's per-element; the parity bar absorbs that)
    sparse_opt_name = os.environ.get("PARITY_SPARSE_OPT", "adagrad")
    opt = tf.keras.optimizers.Adam(1e-3)
    if sparse_opt_name == "adagrad":
        table_opt = tf.keras.optimizers.Adagrad(
            learning_rate=0.05, initial_accumulator_value=0.1)
    else:
        table_opt = tf.keras.optimizers.Adam(1e-3)

    def forward(dense, ids):
        emb = tf.nn.embedding_lookup(table, ids)
        fields = [emb[:, i] for i in range(num_sparse)]
        x = tf.concat([senet(fields), dense], axis=-1)
        return tf.squeeze(head(tf.concat([dcn(x), deep(x)], -1)), -1)

    @tf.function
    def step(dense, ids, labels, groups):
        with tf.GradientTape() as tape:
            logits = forward(dense, ids)
            pw = tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
                labels=labels, logits=logits))
            pl = pairwise_loss(logits, labels, groups,
                               click_occurance_power=-0.5)
            loss = pw + 0.5 * pl
        variables = tape.watched_variables()
        grads = tape.gradient(loss, variables)
        table_gv = [(g, v) for g, v in zip(grads, variables)
                    if v is table]
        dense_gv = [(g, v) for g, v in zip(grads, variables)
                    if v is not table]
        opt.apply_gradients(dense_gv)
        table_opt.apply_gradients(table_gv)
        return loss

    for b in train_batches:
        ids = b.sparse_ids % ROWS + offsets[None, :]
        step(tf.constant(b.dense), tf.constant(ids),
             tf.constant(b.labels),
             tf.constant(b.group_ids.astype(np.float32)))

    acc = StreamingGAUC()
    for b in eval_batches:
        ids = b.sparse_ids % ROWS + offsets[None, :]
        logits = forward(tf.constant(b.dense), tf.constant(ids)).numpy()
        acc.update(b.group_ids, b.labels, logits)
    return acc.result()


def run_jax(train_batches, eval_batches):
    import jax
    from rec_now_tpu.models import DCNv2Model, FeatureConfig
    from rec_now_tpu.parallel import make_mesh
    from rec_now_tpu.training import Trainer, TrainerConfig

    fc = FeatureConfig(rows_per_field=ROWS, embedding_dim=DIM)
    trainer = Trainer(
        DCNv2Model(deep_dims=(256, 128), dcn_sub_dim=16),
        fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5, dense_lr=1e-3,
                      sparse_lr=0.05),
        mesh=make_mesh(1))
    state = trainer.init(jax.random.PRNGKey(0), train_batches[0])
    for b in train_batches:
        state, _ = trainer.train_step(state, *trainer.put(b))
    return trainer.evaluate(state, iter(eval_batches))


def main():
    data = get_data()
    train_batches = list(data.batches(BATCH, STEPS, seed=1))
    eval_batches = list(data.batches(BATCH, EVAL_BATCHES, seed=999))

    t0 = time.time()
    jax_res = run_jax(train_batches, eval_batches)
    t_jax = time.time() - t0
    t0 = time.time()
    tf_res = run_tf(train_batches, eval_batches)
    t_tf = time.time() - t0

    out = {
        "steps": STEPS, "batch": BATCH,
        "tf_reference": tf_res, "rec_now_tpu": jax_res,
        "auc_delta": jax_res["auc"] - tf_res["auc"],
        "gauc_delta": jax_res["gauc"] - tf_res["gauc"],
        "train_seconds": {"tf_cpu": round(t_tf, 1),
                          "rec_now_tpu": round(t_jax, 1)},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AUC_PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
