"""xDeepFM-style CIN + inner-PNN model — benchmark config #3
(BASELINE.json: "CIN + inner-PNN stack with in-batch pairwise loss
grouped by user ID").

Composition: per-field embeddings -> CIN (fused contraction) and
inner-PNN (Gram matmul) in parallel with a DNN tower -> concat -> logit.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.layers.cin_layer import CINLayer
from rec_now_tpu.layers.inner_pnn_layer import InnerPNNLayer
from rec_now_tpu.models.tower import DNNTower


class XDeepFMModel(nn.Module):
    """CIN + iPNN + deep tower CTR model."""
    cin_hidden_sizes: Sequence[int] = (64, 64)
    cin_sum_channel: bool = True
    deep_dims: Sequence[int] = (256, 128)

    @nn.compact
    def __call__(self, dense: jnp.ndarray,
                 sparse_emb: jnp.ndarray) -> jnp.ndarray:
        """Score a batch: dense (B, 13), sparse_emb (B, F, D) -> (B,)."""
        b, f, d = sparse_emb.shape
        cin = CINLayer(hidden_sizes=list(self.cin_hidden_sizes),
                       name="cin")(sparse_emb,
                                   sum_channel=self.cin_sum_channel)
        pnn = InnerPNNLayer(name="ipnn")(sparse_emb)       # (B, P)
        flat = sparse_emb.reshape(b, f * d)
        deep = DNNTower(dims=list(self.deep_dims), name="deep")(
            jnp.concatenate([flat, dense], axis=-1))
        head = jnp.concatenate([cin, pnn, deep, dense], axis=-1)
        logit = nn.Dense(1, kernel_init=nn.initializers.glorot_uniform(), name="head")(head)
        return jnp.squeeze(logit, axis=-1)
