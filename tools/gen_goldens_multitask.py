"""Generate TF-reference goldens for MMoE / PLE / SENET / attention_by_dnn.

Runs the reference library's own layer implementations (imported from
/root/reference, TF 2.x + legacy keras) with explicitly-assigned
weights on fixed seeded inputs and dumps a JSON blob consumed by
tests/layers/test_reference_parity_multitask.py — the same harness
style that produced the round-1 goldens in
tests/layers/test_reference_parity.py.

Usage:  python tools/gen_goldens_multitask.py > /tmp/goldens_mt.json
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402


def _assign(layer_weights, rng, scale=0.6):
    """Assign every TF variable a seeded value; return {name: value}."""
    out = {}
    for v in layer_weights:
        val = rng.uniform(-scale, scale, size=v.shape).astype(np.float32)
        v.assign(val)
        out[v.name] = val.tolist()
    return out


def main():
    import tensorflow as tf
    from rec_now.layers.mmoe_layer import MMOELayer
    from rec_now.layers.ple_layer import PLELayer
    from rec_now.layers.senet_layer import SENETLayer
    from rec_now.rec_block.attention import attention_by_dnn

    rng = np.random.RandomState(7)
    G = {}

    # ---- MMoE: B=3, D=6, N=2 experts, T=2 tasks, dims [4, 3] ----------
    x = rng.randn(3, 6).astype(np.float32)
    G["mt_x"] = x.tolist()
    mmoe = MMOELayer(num_task=2, num_experts=2, dnn_dims=[4, 3],
                     activation="relu")
    _ = mmoe(tf.constant(x))                       # build
    G["mmoe_weights"] = _assign(mmoe.weights, rng)
    G["mmoe_out"] = np.asarray(mmoe(tf.constant(x))).tolist()
    unmerged = mmoe(tf.constant(x), merge_output=False)
    G["mmoe_unmerged"] = [np.asarray(t).tolist() for t in unmerged]

    # ---- PLE: 2 layers, num_task=2, 1 shared task, ragged expert counts
    ple = PLELayer(num_task=2,
                   list_of_dnn_dims=[[4, 3], [3]],
                   list_of_num_experts_per_task=[[2, 1, 2], [1, 2, 1]],
                   num_shared_task=1, activation="relu")
    _ = ple(tf.constant(x))
    G["ple_weights"] = _assign(ple.weights, rng)
    outs = ple(tf.constant(x))
    G["ple_out"] = [np.asarray(t).tolist() for t in outs]

    # ---- SENET with UNEQUAL per-field dims (pos_idx broadcast) --------
    fields = [rng.randn(3, d).astype(np.float32) for d in (2, 5, 3)]
    G["senet_fields"] = [f.tolist() for f in fields]
    senet = SENETLayer(reduction_ratio=0.67, activation_inner="tanh",
                       activation_outer="tanh")
    _ = senet([tf.constant(f) for f in fields])
    G["senet_weights"] = _assign(senet.weights, rng)
    G["senet_out"] = np.asarray(
        senet([tf.constant(f) for f in fields])).tolist()
    G["senet_middle_dim"] = int(senet.middle_dim)

    # ---- attention_by_dnn (DIN): B=3, L=4, D=5, dnn [6, 1] ------------
    user = rng.randn(3, 4, 5).astype(np.float32)
    doc = rng.randn(3, 5).astype(np.float32)
    G["din_user"] = user.tolist()
    G["din_doc"] = doc.tolist()
    attn_mat, score_sum, model = attention_by_dnn(
        tf.constant(user), tf.constant(doc), dnn_dims=[6, 1],
        dnn_activation="relu")
    G["din_weights"] = _assign(model.weights, rng)
    attn_mat, score_sum, _ = attention_by_dnn(
        tf.constant(user), tf.constant(doc), dnn_dims=[6, 1],
        dnn_activation="relu", dnn_name="din2")
    # the reference builds a FRESH model inside each call — run the
    # forward manually with the assigned weights instead
    doc_tiled = tf.tile(tf.expand_dims(tf.constant(doc), 1), [1, 4, 1])
    dnn_in = tf.concat([tf.constant(user), doc_tiled], axis=-1)
    h = model(dnn_in)
    score = tf.sigmoid(h)
    G["din_attn_mat"] = np.asarray(
        tf.reduce_sum(tf.constant(user) * score, axis=1)).tolist()
    G["din_score_sum"] = np.asarray(
        tf.reduce_sum(tf.squeeze(score, 2), axis=1,
                      keepdims=True)).tolist()

    json.dump(G, sys.stdout)


if __name__ == "__main__":
    main()
