"""CAN co-action + DCN-v2 model — benchmark config #5 (BASELINE.json:
"Full pipeline on v5e-16: sharded 100M-row embedding tables, CAN
co-action + DCN-v2, pairwise joint training").

Composition: a designated target field's id looks up *co-action DNN
parameters* from a second (sharded) table; the CAN layer applies that
per-sample DNN to the user-history fields' embeddings; the pooled
co-action feature joins the SENET-recalibrated embeddings + dense
features feeding the DCN-mix cross stack and deep tower.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from rec_now_tpu.layers.can_layer import CANLayer
from rec_now_tpu.layers.senet_layer import SENETLayer
from rec_now_tpu.layers.dcn_mix_layer import DCNMixLayer
from rec_now_tpu.models.tower import DNNTower


class CANDCNModel(nn.Module):
    """DCN-v2 tower augmented with CAN co-action features."""
    history_fields: Sequence[int] = tuple(range(8))
    can_dnn_dims: Sequence[int] = (16,)
    dcn_layers: int = 2
    dcn_experts: int = 2
    dcn_sub_dim: int = 16
    deep_dims: Sequence[int] = (256, 128)
    senet_reduction: float = 0.5

    @classmethod
    def can_param_size(cls, embedding_dim: int,
                       can_dnn_dims: Sequence[int]) -> int:
        """Embedding dim of the co-action parameter table."""
        return CANLayer.get_dnn_param_size(embedding_dim,
                                           list(can_dnn_dims), True)

    @nn.compact
    def __call__(self, dense: jnp.ndarray, sparse_emb: jnp.ndarray,
                 can_params: jnp.ndarray) -> jnp.ndarray:
        """Score a batch.

        Args:
            dense: (B, num_dense).
            sparse_emb: (B, F, D).
            can_params: (B, size_dnn_param) per-sample co-action DNN
                parameters (looked up by the target item id).

        Returns:
            (B,) logits.
        """
        b, f, d = sparse_emb.shape
        history = sparse_emb[:, list(self.history_fields)]   # (B, L, D)
        can_out = CANLayer(dnn_dims=list(self.can_dnn_dims),
                           output_combiner="sum",
                           name="can")(history, can_params)  # (B, Dn)

        flat = SENETLayer(reduction_ratio=self.senet_reduction,
                          name="senet")(sparse_emb)          # (B, F*D)
        x = jnp.concatenate([flat, dense, can_out], axis=-1)

        cross = DCNMixLayer(dim_sub_space=self.dcn_sub_dim,
                            num_layer=self.dcn_layers,
                            num_expert=self.dcn_experts,
                            name="dcn_mix")(x)
        deep = DNNTower(dims=list(self.deep_dims), name="deep")(x)
        logit = nn.Dense(1, kernel_init=nn.initializers.glorot_uniform(), name="head")(
            jnp.concatenate([cross, deep], axis=-1))
        return jnp.squeeze(logit, axis=-1)
