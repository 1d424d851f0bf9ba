"""Inner Product-based Neural Network (IPNN) layer.

Reference: rec_now/layers/inner_pnn_layer.py:12-53, which gathers the
C(F,2) row/col pairs out of an (F, B, D) transpose — F*(F-1) gathered
(B, D) slabs.  TPU-native formulation: one batched Gram matmul
``(B, F, D) x (B, D, F) -> (B, F, F)`` on the MXU, then a static
upper-triangle gather — O(F^2 D) FLOPs in a single contraction instead of
P separate multiplies.

Symbols: B batch, F fields, D dim, P = C(F, 2).
"""
from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class InnerPNNLayer(nn.Module):
    """All pairwise inner products of field embeddings -> (B, P).

    Attributes:
        gram_dtype: compute dtype of the Gram contraction's operands.
            None (default) = bf16 on TPU, input dtype elsewhere; pass
            ``jnp.float32`` to force exact-f32 numerics on TPU too.
            Accumulation is always f32.
    """
    gram_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: Union[jnp.ndarray, List[jnp.ndarray]]
                 ) -> jnp.ndarray:
        """Compute pairwise inner products.

        Args:
            inputs: list of F field embeddings each (B, D), or (B, F, D).

        Returns:
            (B, P) inner products, ordered row-major over the strict
            upper triangle (same pair order as the reference's loop).
        """
        if isinstance(inputs, (list, tuple)):
            emb = jnp.stack(inputs, axis=1)               # (B, F, D)
        else:
            emb = inputs
        num_field = emb.shape[1]
        # single-pass bf16 MXU on TPU (f32 accumulate): the Gram BMM has
        # tiny (F, D) per-sample operands, so halving operand bytes and
        # doubling MXU rate both land; bf16 mantissa noise on O(0.1)
        # embedding products is far below the loss's statistical floor
        # (AUC parity re-verified end-to-end in tools/measure_auc_parity).
        if self.gram_dtype is not None:
            a = emb.astype(self.gram_dtype)
        else:
            a = (emb.astype(jnp.bfloat16)
                 if jax.default_backend() == "tpu" else emb)
        gram = jnp.einsum("bfd,bgd->bfg", a, a,
                          preferred_element_type=jnp.float32
                          ).astype(emb.dtype)             # (B, F, F)
        rows, cols = np.triu_indices(num_field, k=1)
        return gram[:, rows, cols]                        # (B, P)
