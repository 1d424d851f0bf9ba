"""FM + pointwise BCE model — benchmark config #1 (BASELINE.json).

Composition: per-field embeddings -> FM second-order term + linear terms
(from dense features and a 1-dim embedding view) -> logit.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.layers.fm_layer import FMLayer


class FMModel(nn.Module):
    """Factorization-machine CTR model over pre-gathered embeddings."""

    @nn.compact
    def __call__(self, dense: jnp.ndarray,
                 sparse_emb: jnp.ndarray) -> jnp.ndarray:
        """Score a batch.

        Args:
            dense: (B, num_dense) dense features.
            sparse_emb: (B, F, D) per-field embeddings.

        Returns:
            (B,) logits.
        """
        second_order = FMLayer(name="fm")(sparse_emb)      # (B, 1)
        # first-order: learned weight per embedding element + dense linear
        first_sparse = nn.Dense(1, kernel_init=nn.initializers.glorot_uniform(), name="linear_sparse")(
            sparse_emb.reshape(sparse_emb.shape[0], -1))   # (B, 1)
        first_dense = nn.Dense(1, kernel_init=nn.initializers.glorot_uniform(), name="linear_dense")(dense)  # (B, 1)
        bias = self.param("bias", nn.initializers.zeros_init(), (1,))
        logit = second_order + first_sparse + first_dense + bias
        return jnp.squeeze(logit, axis=-1)                 # (B,)
