"""DCN-v2 (dcn_mix) + SENET model — benchmark config #2, and the
flagship benchmark composition (BASELINE.json metric: examples/s/chip on
"DCN-v2 + in-batch pairwise").

Composition: per-field embeddings -> SENET recalibration -> parallel
DCN-mix cross stack and DNN tower over [recalibrated embeddings, dense]
-> concat -> logit head.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.layers.senet_layer import SENETLayer
from rec_now_tpu.layers.dcn_mix_layer import DCNMixLayer
from rec_now_tpu.models.tower import DNNTower


class DCNv2Model(nn.Module):
    """SENET + DCN-mix + deep tower CTR model."""
    dcn_layers: int = 2
    dcn_experts: int = 2
    dcn_sub_dim: int = 16
    deep_dims: Sequence[int] = (256, 128)
    use_senet: bool = True
    senet_reduction: float = 0.5

    @nn.compact
    def __call__(self, dense: jnp.ndarray,
                 sparse_emb: jnp.ndarray) -> jnp.ndarray:
        """Score a batch.

        Args:
            dense: (B, num_dense).
            sparse_emb: (B, F, D).

        Returns:
            (B,) logits.
        """
        b, f, d = sparse_emb.shape
        if self.use_senet:
            flat = SENETLayer(reduction_ratio=self.senet_reduction,
                              name="senet")(sparse_emb)    # (B, F*D)
        else:
            flat = sparse_emb.reshape(b, f * d)
        x = jnp.concatenate([flat, dense], axis=-1)        # (B, F*D+13)

        cross = DCNMixLayer(dim_sub_space=self.dcn_sub_dim,
                            num_layer=self.dcn_layers,
                            num_expert=self.dcn_experts,
                            name="dcn_mix")(x)             # (B, F*D+13)
        deep = DNNTower(dims=list(self.deep_dims), name="deep")(x)
        head = jnp.concatenate([cross, deep], axis=-1)
        logit = nn.Dense(1, kernel_init=nn.initializers.glorot_uniform(), name="head")(head)
        return jnp.squeeze(logit, axis=-1)
