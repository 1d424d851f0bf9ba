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

# the reference subclasses keras.layers.Dense with units=0 (SURVEY.md §1),
# which keras 3 rejects — run its layers on legacy keras 2 (tf_keras).
# Must be set before tensorflow is first imported.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

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
    sparse_opt = os.environ.get("PARITY_SPARSE_OPT", "adagrad")
    trainer = Trainer(
        DCNv2Model(deep_dims=(256, 128), dcn_sub_dim=16),
        fc,
        TrainerConfig(pointwise_weight=1.0, pairwise_weight=0.5,
                      click_occurance_power=-0.5, dense_lr=1e-3,
                      sparse_optimizer=sparse_opt,
                      sparse_lr=0.05 if sparse_opt == "adagrad" else 1e-3),
        mesh=make_mesh(1))
    state = trainer.init(jax.random.PRNGKey(0), train_batches[0])
    for b in train_batches:
        state, _ = trainer.train_step(state, *trainer.put(b))
    return trainer.evaluate(state, iter(eval_batches))


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stamp():
    """Run configuration stamped into every part file at write time.

    The merge refuses to combine parts whose stamps disagree — a stale
    part from an older run (different PARITY_STEPS/BATCH or older code)
    must not silently pair with a fresh one in the headline parity
    evidence.
    """
    return {"steps": STEPS, "batch": BATCH, "rows": ROWS, "dim": DIM,
            "eval_batches": EVAL_BATCHES,
            "sparse_opt": os.environ.get("PARITY_SPARSE_OPT", "adagrad"),
            "git_rev": _git_rev()}


def _git_rev():
    import subprocess
    try:
        return subprocess.run(
            ["git", "-C", _repo_root(), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _check_stamps(parts, label):
    """Fail the merge when the two sides ran different configurations."""
    stamps = {side: p.get("stamp") for side, p in parts.items()}
    for side, st in stamps.items():
        if st is None:
            raise SystemExit(
                f"AUC parity part '{side}' ({label}) has no stamp — "
                "regenerate it with the current tool before merging")
    a, b = stamps["tf"], stamps["jax"]
    diff = {k for k in set(a) | set(b)
            if k != "git_rev" and a.get(k) != b.get(k)}
    if diff:
        raise SystemExit(
            f"AUC parity parts ({label}) were produced by different "
            f"configurations (mismatched: {sorted(diff)}; tf={a} "
            f"jax={b}) — regenerate both sides")
    return a


def _merge_and_write():
    """Merge per-side part files into AUC_PARITY.json when both exist."""
    parts = {}
    for side in ("tf", "jax"):
        p = os.path.join(_repo_root(), f"AUC_PARITY_{side}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            parts[side] = json.load(f)
    stamp = _check_stamps(parts, "default")
    tf_res, jax_res = parts["tf"]["result"], parts["jax"]["result"]
    out = {
        "steps": stamp["steps"], "batch": stamp["batch"],
        "tf_reference": tf_res, "rec_now_tpu": jax_res,
        "auc_delta": jax_res["auc"] - tf_res["auc"],
        "gauc_delta": jax_res["gauc"] - tf_res["gauc"],
        "train_seconds": {"tf_cpu": parts["tf"]["seconds"],
                          "rec_now_tpu": parts["jax"]["seconds"]},
        "config": "benchmarked defaults: Adam(1e-3) dense towers, "
                  "row-wise Adagrad(0.05, acc0=0.1) embedding table "
                  "(PARITY_SPARSE_OPT=adam measures the all-Adam "
                  "controlled variant on both sides)",
    }
    # fold in the all-Adam controlled variant when measured
    adam_parts = {}
    for s in ("tf", "jax"):
        p = os.path.join(_repo_root(), f"AUC_PARITY_{s}_adam.json")
        if os.path.exists(p):
            with open(p) as f:
                adam_parts[s] = json.load(f)
    if len(adam_parts) == 2:
        _check_stamps(adam_parts, "adam")
        adam = {s: p["result"] for s, p in adam_parts.items()}
        out["tf_reference_adam"] = adam["tf"]
        out["rec_now_tpu_adam"] = adam["jax"]
        out["auc_delta_adam"] = adam["jax"]["auc"] - adam["tf"]["auc"]
        out["gauc_delta_adam"] = adam["jax"]["gauc"] - adam["tf"]["gauc"]
    path = os.path.join(_repo_root(), "AUC_PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


def main():
    # PARITY_SIDE=tf|jax runs one side and stores a part file (the TPU
    # side alone takes ~8 min; split runs dodge outer command timeouts);
    # the merge fires automatically once both parts exist.
    side = os.environ.get("PARITY_SIDE", "both")
    data = get_data()
    train_batches = list(data.batches(BATCH, STEPS, seed=1))
    eval_batches = list(data.batches(BATCH, EVAL_BATCHES, seed=999))

    runners = {"jax": run_jax, "tf": run_tf}
    suffix = ("_adam" if os.environ.get("PARITY_SPARSE_OPT") == "adam"
              else "")
    for name in (("tf", "jax") if side == "both" else (side,)):
        t0 = time.time()
        res = runners[name](train_batches, eval_batches)
        part = {"result": res, "seconds": round(time.time() - t0, 1),
                "stamp": _stamp()}
        with open(os.path.join(_repo_root(),
                               f"AUC_PARITY_{name}{suffix}.json"),
                  "w") as f:
            json.dump(part, f, indent=2)
        print(name, json.dumps(part))
    _merge_and_write()


if __name__ == "__main__":
    main()
