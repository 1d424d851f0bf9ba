"""SENET feature-recalibration layer (FiBiNET).

Reference: rec_now/layers/senet_layer.py:14-119.  Squeeze each field to
its mean, run a 2-layer bottleneck DNN (F -> mid -> F), and broadcast the
per-field weight back to every element of that field's embedding —
supporting *unequal* per-field embedding dims via a static position->field
index map (the reference's ``pos_idx``).  The broadcast is a static
gather, i.e. a free layout op under XLA.

Symbols: B batch, F fields, Df per-field dim, total_dim = sum(Df).
"""
from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rec_now_tpu.core.config import (Activation, Initializer,
                                     get_activation)


class SENETLayer(nn.Module):
    """Squeeze-excite per-field reweighting; fields may differ in dim."""
    reduction_ratio: float
    activation_inner: Activation = "tanh"
    activation_outer: Activation = "tanh"
    use_bias: bool = True
    kernel_init: Initializer = "glorot_uniform"
    bias_init: Initializer = "zeros"

    @nn.compact
    def __call__(self, inputs: Union[jnp.ndarray, List[jnp.ndarray]]
                 ) -> jnp.ndarray:
        """Recalibrate field embeddings.

        Args:
            inputs: list of F field embeddings, each (B, Df) — dims may
                differ per field.  A single (B, D) array is one field.

        Returns:
            (B, total_dim) concatenated reweighted embeddings.
        """
        # fast path: equal-dim fields as one (B, F, D) tensor — one
        # fused mean/scale instead of F per-field slices (the common
        # Criteo layout; the list path remains for unequal dims)
        stacked = None
        if not isinstance(inputs, (list, tuple)):
            if inputs.ndim == 3:
                stacked = inputs
            else:
                inputs = [inputs]
        if stacked is not None:
            num_field = stacked.shape[1]
            pos_idx = None
            squeezed = jnp.mean(stacked, axis=-1)         # (B, F)
        else:
            num_field = len(inputs)
            pos_idx = np.concatenate(
                [np.full(int(x.shape[-1]), i, np.int32)
                 for i, x in enumerate(inputs)])          # (total_dim,)
            squeezed = jnp.concatenate(
                [jnp.mean(x, axis=-1, keepdims=True) for x in inputs],
                axis=-1)                                  # (B, F)

        middle_dim = max(int(round(num_field * self.reduction_ratio)), 1)

        from rec_now_tpu.core.config import get_initializer
        kinit = get_initializer(self.kernel_init)
        h = nn.Dense(middle_dim, use_bias=self.use_bias,
                     kernel_init=kinit, name="senet/dense_0")(squeezed)
        h = get_activation(self.activation_inner)(h)
        h = nn.Dense(num_field, use_bias=self.use_bias,
                     kernel_init=kinit, name="senet/dense_1")(h)
        weights = get_activation(self.activation_outer)(h)  # (B, F)

        if stacked is not None:
            out = stacked * weights[:, :, None]           # (B, F, D)
            return out.reshape(out.shape[0], -1)          # (B, F*D)
        elementwise = weights[:, pos_idx]                 # (B, total_dim)
        concat = jnp.concatenate(inputs, axis=-1)         # (B, total_dim)
        return concat * elementwise
